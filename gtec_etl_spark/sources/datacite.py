"""DataCite-style REST JSON source — S14 (ccmm/gtex/rnaseq_datasets.py:
160-202 in the reference).

The reference urlopens the works API, builds a title→DOI map, and fatals on
version anomalies or duplicate titles. Network I/O is a driver-side edge
concern (this container has no network); the engine surface is the
transform: response payload → (doi, title, version) DataFrame + the
duplicate-title constraint as a violations DataFrame. `fetch` is the
clearly-marked stub boundary."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fetch_works(url: str) -> str:  # pragma: no cover - network stub
    """Driver-side fetch of a works API page. STUB: no network in this
    container; callers pass pre-fetched payloads to parse_works."""
    raise NotImplementedError(
        "network access is unavailable here; pass a payload to parse_works"
    )


def parse_works(spark: SparkSession, payload: str) -> DataFrame:
    """Parse a works-API JSON payload ({data:[{attributes:{doi,titles,
    version}}]}) into a (doi, title, version) DataFrame."""
    doc = json.loads(payload)
    rows = []
    for rec in doc.get("data", []):
        attrs = rec.get("attributes", {})
        titles = attrs.get("titles", [])
        title = titles[0].get("title") if titles else None
        rows.append((attrs.get("doi"), title, attrs.get("version")))
    return spark.createDataFrame(rows, "doi string, title string, version string")


def duplicate_titles(works: DataFrame) -> DataFrame:
    """The reference's fatal-on-duplicate-title check
    (rnaseq_datasets.py:188-196) as a violations DataFrame."""
    return (
        works.groupBy("title")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list("doi")).alias("dois"))
        .filter(F.col("n") > 1)
    )


def title_to_doi(works: DataFrame) -> DataFrame:
    """The title→DOI lookup dimension (broadcast-join it downstream)."""
    return works.select("title", "doi")
