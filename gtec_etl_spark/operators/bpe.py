"""Distributed BPE (byte-pair-encoding) tokenizer training — the
vocabulary-learning pass of an LLM data pipeline, expressed Spark-first.

Classic BPE (Sennrich et al. 2016) counts adjacent symbol pairs over a
word-frequency table and greedily merges the most frequent pair, K times.
The scale insight is the same one the reference implementations use: train
on DISTINCT words weighted by frequency, so per-iteration cost is
O(|vocab|), independent of corpus size — a 100 TB corpus has a few million
distinct words, not a few trillion.

Everything is exact integer/string arithmetic (pair counts, lexicographic
tie-breaks, string concat merges), so a DuckDB oracle reproduces training
bit-for-bit (plans/text_queries.py unrolls the K iterations as CTE stages,
the sim_pq_trained_codebook precedent).

No reference counterpart — LLM-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_tokens(word: Column) -> Column:
    """Initial BPE symbol sequence: the word's characters, via explicit
    substr (both engines index strings 1-based, so the oracle twin is
    literally the same expression)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, 1),
    )


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, toks) weighted vocabulary: one shuffle on the word,
    then map-side character splitting. This is the ONLY corpus-sized
    operation in training."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("toks", char_tokens(F.col("word")))
    )


def adjacent_pair_counts(vocab: DataFrame) -> DataFrame:
    """(l, r, c): frequency-weighted adjacent-pair counts over the token
    sequences — one explode + one groupBy on the pair."""
    # sequence(1, 0) DESCENDS in Spark (step auto-negates), so a
    # single-symbol word must be filtered before building (i, i+1) pairs.
    pairs = vocab.filter(F.size("toks") >= 2).select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.element_at("toks", i).alias("l"),
                    F.element_at("toks", i + 1).alias("r"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("freq").alias("c")
    )


def apply_merge(toks: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping merge of the (left, right)
    pair, as a pure map-side fold: state (out, carry) — carry holds the
    previous unconsumed token; (carry==left, x==right) emits the merged
    symbol and clears the carry, so 'aaa' under (a,a) becomes [aa, a],
    exactly the reference BPE semantics. No shuffle, no UDF."""
    merged = left + right
    out_t = "array<string>"

    def step(acc: Column, x: Column) -> Column:
        return (
            F.when(
                acc["carry"].isNull(),
                F.struct(acc["out"].alias("out"), x.alias("carry")),
            )
            .when(
                (acc["carry"] == F.lit(left)) & (x == F.lit(right)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["carry"])).alias("out"),
                    x.alias("carry"),
                )
            )
        )

    return F.aggregate(
        toks,
        F.struct(
            F.array().cast(out_t).alias("out"),
            F.lit(None).cast("string").alias("carry"),
        ),
        step,
        lambda acc: F.when(acc["carry"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["carry"]))
        ),
    )


def bpe_train(
    docs: DataFrame, k: int, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Train K BPE merges. Returns (merges, final_vocab):
    merges = [(iter, left, right, pair_count)], final_vocab carries the
    fully-merged token sequences (word, freq, toks) for apply/encode.

    Per iteration: one pair-count aggregation over the vocab (bounded),
    one 1-row argmax collected to the driver (max c, ties to the
    lexicographically smallest (l, r) — deterministic cross-engine on
    ASCII binary collation), then a map-side fold applies the merge. The
    vocab is persisted each round and the prior round released, so the
    plan depth stays O(1) instead of O(K) and nothing corpus-sized ever
    moves after the initial word count."""
    vocab = word_vocab(docs, text_col).persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for it in range(1, k + 1):
            top = (
                adjacent_pair_counts(vocab)
                .orderBy(F.col("c").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((it, l, r, c))
            nxt = vocab.withColumn("toks", apply_merge(F.col("toks"), l, r)).persist()
            nxt.count()  # materialize before releasing the parent cache
            vocab.unpersist()
            vocab = nxt
        return merges, vocab
    except Exception:
        vocab.unpersist()
        raise


def unigram_viterbi_segments(
    words: DataFrame, lp_map: dict[str, int], max_piece_len: int = 3
) -> DataFrame:
    """Hard-EM (Viterbi) E-step of a unigram-LM tokenizer (Kudo 2018,
    SentencePiece's model; the reference has no tokenizer — LLM-pipeline
    extension): segment each DISTINCT word into the vocabulary pieces
    maximizing the summed integer log-probabilities, and emit one
    (word, freq, piece) row per path piece.

    Runs as one Arrow mapInPandas pass over the distinct-word vocabulary
    (the same O(|vocab|)-not-O(corpus) property text_bpe_train argues;
    per-word DP is embarrassingly parallel). `lp_map` is the BOUNDED
    piece -> quantized-log-prob table (micro-nats, computed JVM-side with
    the qln discipline and collected — never a Python ln), so every
    score is integer arithmetic and the DuckDB oracle's unrolled-CTE DP
    reproduces it bit-for-bit.

    Determinism contract mirrored by the oracle: forward best[i] = max
    over piece lengths m of best[i-m] + lp(word[i-m:i]) (missing pieces
    excluded; single chars are always in the vocabulary so every prefix
    is reachable); backward reconstruction picks the SMALLEST m whose
    score equals best[i] at each step."""
    import pandas as pd

    def kernel(batches):
        NEG = -(10**15)  # int64-safe sentinel (never -(2**63))
        for pdf in batches:
            out_w: list[str] = []
            out_f: list[int] = []
            out_p: list[str] = []
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                best = [NEG] * (n + 1)
                best[0] = 0
                for i in range(1, n + 1):
                    b = NEG
                    for m in range(1, min(max_piece_len, i) + 1):
                        lp = lp_map.get(word[i - m : i])
                        if lp is None:
                            continue
                        s = best[i - m] + lp
                        if s > b:
                            b = s
                    best[i] = b
                pos = n
                pieces: list[str] = []
                while pos > 0:
                    for m in range(1, min(max_piece_len, pos) + 1):
                        piece = word[pos - m : pos]
                        lp = lp_map.get(piece)
                        if lp is not None and best[pos - m] + lp == best[pos]:
                            pieces.append(piece)
                            pos -= m
                            break
                    else:  # unreachable: single chars are always in vocab
                        raise ValueError(f"unsegmentable word {word!r}")
                for p in reversed(pieces):
                    out_w.append(word)
                    out_f.append(int(freq))
                    out_p.append(p)
            yield pd.DataFrame({"word": out_w, "freq": out_f, "piece": out_p})

    return words.mapInPandas(kernel, "word string, freq long, piece string")
