"""Registry entries that exercise the streaming and multimodal surfaces
through the driver's correctness gate.

- stream_tumbling_hourly runs a REAL Structured Streaming job
  (readStream → watermark → window → memory sink, Trigger.AvailableNow)
  and returns the materialized result; its oracle is plain SQL because a
  finite replayed stream must agree exactly with the batch computation.
- mm_* run the multimodal mapInPandas pipelines over the deterministic
  in-memory media table (no SQL oracle — the FAKEIMG codec is not
  expressible in SQL; driver records the rows-only check).
"""

from __future__ import annotations

from gtec_etl_spark.plans.registry import query


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events, round(sum("value"), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    tags=("streaming", "live"),
)
def stream_tumbling_hourly(spark, sf_dir):
    """Tumbling-window aggregation executed as an actual streaming query
    over the events file replayed through readStream; equals the batch
    result (ev_tumbling_hourly) on a finite input — the exactness property
    watermarked windows guarantee once all data is ingested."""
    from gtec_etl_spark.streaming import pipelines as P

    out = P.run_to_memory(P.tumbling_counts(P.read_events_stream(spark, sf_dir)))
    return out.orderBy("window_start", "event_type")


@query("mm_decode_features", oracle=None, tags=("multimodal",))
def mm_decode_features(spark, sf_dir):
    """Multimodal pipeline: deterministic media table → decode (FAKEIMG
    stub codec) → byte-histogram embedding; joined summary per media row.
    Plumbing (Arrow batches, schemas, 1:1 and 1:N shapes) is the real
    engine surface; the codec alone is stubbed."""
    from pyspark.sql import functions as F

    from gtec_etl_spark.operators import multimodal as M

    media = M.media_table(spark, n=16, width=32, height=24)
    decoded = M.decode_image(media)
    emb = M.byte_histogram_features(media, bins=8)
    return (
        decoded.join(emb, "media_id")
        .select(
            "media_id", "width", "height", "n_pixels",
            F.round("mean_intensity", 4).alias("mean_intensity"),
            F.round(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x), 4).alias(
                "embedding_mass"
            ),
        )
        .orderBy("media_id")
    )
