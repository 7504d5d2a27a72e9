"""Similarity-search query pack over the embeddings table (charter M6).

Three tiers: exact brute-force top-k (correctness baseline), IVF-style
centroid-probed search, and random-hyperplane LSH bucketing (both scale
paths, still oracle-checked thanks to deterministic integer hyperplanes and
rounded centroids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gtec_etl_spark import catalog
from gtec_etl_spark.operators import similarity as S
from gtec_etl_spark.plans.registry import query


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, len({a})),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT vec_id,
           round({_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
    FROM e CROSS JOIN q
    ORDER BY {_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity",),
)
def sim_topk_bruteforce(spark, sf_dir):
    """Exact ANN baseline: brute-force cosine top-10 for the vec_id=0 query
    vector. Broadcast query + per-partition top-k (TakeOrderedAndProject);
    at 100 TB this is one scan, no shuffle."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    rest = emb.filter(F.col("vec_id") != 0)
    return S.brute_force_topk(rest, qv, 10)


@query(
    "sim_ivf_probe",
    oracle=f"""
    WITH dims AS (
      SELECT label, unnest(generate_series(1, len(embedding))) AS d,
             embedding AS e
      FROM embeddings
    ),
    cent AS (
      SELECT label, list(cv ORDER BY d) AS centroid FROM (
        SELECT label, d, round(avg(CAST(e[d] AS DOUBLE)), 4) AS cv
        FROM dims GROUP BY label, d
      ) GROUP BY label
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    best AS (
      SELECT label FROM cent CROSS JOIN q
      ORDER BY {_dot_sql('centroid', 'qv')} /
               (sqrt({_dot_sql('centroid', 'centroid')}) * sqrt({_dot_sql('qv', 'qv')})) DESC,
               label
      LIMIT 1
    ),
    e AS (
      SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS norm
      FROM embeddings WHERE label = (SELECT label FROM best) AND vec_id <> 0
    )
    SELECT vec_id,
           round({_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})), 4) AS cosine
    FROM e CROSS JOIN q
    ORDER BY {_dot_sql('embedding', 'qv')} / (norm * sqrt({_dot_sql('qv', 'qv')})) DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity",),
)
def sim_ivf_probe(spark, sf_dir):
    """IVF-style ANN: per-label centroids (element-wise mean, rounded to 4
    decimals for engine-portable determinism), probe the nearest centroid,
    brute-force only inside that partition. The scale path — at 100 TB the
    centroid table is tiny and broadcast, and the scan prunes to one
    cluster's partitions."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    # Element-wise centroid: posexplode → groupBy (label, pos) avg → rebuild.
    dims = emb.select("label", F.posexplode("embedding").alias("d", "x"))
    cent = (
        dims.groupBy("label", "d")
        .agg(F.round(F.avg(F.col("x").cast("double")), 4).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "cv"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cv)").alias("centroid"))
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    qn = S.with_norm(qv.select(F.col("q").alias("qv")), "qv", "qnorm")
    cent_cos = S.dot(F.col("centroid"), F.col("qv")) / (
        F.sqrt(S.dot(F.col("centroid"), F.col("centroid"))) * F.col("qnorm")
    )
    best = (
        cent.crossJoin(F.broadcast(qn))
        .orderBy(cent_cos.desc(), F.col("label"))
        .limit(1)
        .select("label")
    )
    cluster = emb.join(F.broadcast(best), "label", "left_semi").filter(F.col("vec_id") != 0)
    return S.brute_force_topk(cluster, qv, 10)


def _bucket_sql(vec: str, n_planes: int, dim: int) -> str:
    terms = []
    for j in range(n_planes):
        weights = ", ".join(str(float(S.hyperplane_weight(j, d))) for d in range(dim))
        proj = (
            f"list_reduce(list_transform(generate_series(1, len({vec})),"
            f" i -> CAST({vec}[i] AS DOUBLE) * ([{weights}])[i]), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "sim_lsh_buckets",
    oracle=f"""
    SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM (SELECT vec_id, CAST({_bucket_sql('embedding', 8, 64)} AS BIGINT) AS bucket
          FROM embeddings)
    GROUP BY bucket ORDER BY bucket
    """,
    tags=("similarity",),
)
def sim_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing: 8 deterministic integer hyperplanes
    → 256 buckets. The ANN candidate structure — querying = hash the query
    vector, scan one bucket. Bucket histogram is the oracle-checked
    artifact; the projections are exact integer-weight folds."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    bucketed = emb.withColumn("bucket", S.hyperplane_bucket(F.col("embedding"), 8, 64))
    return (
        bucketed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
        .orderBy("bucket")
    )
