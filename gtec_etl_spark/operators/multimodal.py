"""Multimodal (image/audio/video) column operators — charter M6.

Model: media are opaque `binary` columns with a typed metadata struct,
processed by Arrow-batched pandas iterators (mapInPandas). The Spark-side
plumbing — schemas, batch iteration, partitioning, output shapes — is real
and tested; the actual codec step is STUBBED because image/audio libraries
are not in this container:

- `decode_image` understands a deterministic FAKEIMG container (tests use
  it) and falls back to PIL when importable; any other payload raises
  NotImplementedError — the clearly-marked stub boundary.
- `byte_histogram_features` is a REAL feature extractor (numpy over raw
  bytes) producing an embedding column that feeds the similarity operators.

Scale notes: mapInPandas streams Arrow batches (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch), so executor memory is
per-batch not per-partition; repartition upstream on media_id to balance
variable-sized blobs; never collect binaries to the driver.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary,"
    " meta struct<mime:string, source:string>"
)

FAKEIMG_MAGIC = b"FAKEIMG"


def fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic test payload: FAKEIMG | w | h | pixel bytes (an LCG
    keyed by seed). Stands in for a real encoded image."""
    n = width * height
    x = (seed * 2654435761) % (2**32)
    pix = bytearray()
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        pix.append(x % 256)
    return FAKEIMG_MAGIC + struct.pack("<II", width, height) + bytes(pix)


def _decode_one(content: bytes) -> tuple[int, int, bytes]:
    """Decode bytes -> (width, height, grayscale pixels). FAKEIMG is the
    deterministic container; PIL is the optional real path; anything else
    is beyond the stub boundary."""
    if content[: len(FAKEIMG_MAGIC)] == FAKEIMG_MAGIC:
        w, h = struct.unpack("<II", content[7:15])
        return w, h, content[15 : 15 + w * h]
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)

        img = Image.open(io.BytesIO(content)).convert("L")
        return img.width, img.height, img.tobytes()
    except ImportError:
        raise NotImplementedError(
            "real image decoding requires PIL (not in this container); "
            "only the FAKEIMG test container is supported"
        )


DECODED_SCHEMA = "media_id long, width int, height int, n_pixels long, mean_intensity double"


def decode_image(media: DataFrame) -> DataFrame:
    """Decode pass: binary -> image dimensions + intensity summary.
    One Arrow round-trip; output is small per row regardless of blob size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, pix = _decode_one(bytes(content))
                arr = np.frombuffer(pix, dtype=np.uint8)
                out.append((mid, w, h, len(arr), float(arr.mean()) if len(arr) else None))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_pixels", "mean_intensity"]
            )

    return media.select("media_id", "content").mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, content binary"


def resize_image(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize pass (nearest-neighbor on the decoded grid) — re-encodes into
    the FAKEIMG container so passes compose. Real codecs swap in at the
    _decode_one boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, pix = _decode_one(bytes(content))
                arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w)
                yi = (np.arange(target_h) * h // target_h).astype(int)
                xi = (np.arange(target_w) * w // target_w).astype(int)
                small = arr[np.ix_(yi, xi)]
                payload = (
                    FAKEIMG_MAGIC
                    + struct.pack("<II", target_w, target_h)
                    + small.tobytes()
                )
                rows.append((mid, target_w, target_h, payload))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return media.select("media_id", "content").mapInPandas(run, RESIZED_SCHEMA)


def byte_histogram_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """REAL feature extractor: normalized byte-value histogram of the blob
    as an array<float> embedding — content-based similarity without any
    codec. Feeds operators/similarity.py directly."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
                total = hist.sum() or 1
                rows.append((mid, (hist / total).astype(float).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, embedding array<double>"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing (video stand-in): emit one row per sampled
    offset — a 1:N mapInPandas demonstrating row-expanding media ops.
    Real frame extraction (ffmpeg/av) sits behind the same signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                for k, off in enumerate(range(0, len(blob), every_n_bytes)):
                    chunk = blob[off : off + every_n_bytes]
                    rows.append((mid, k, off, len(chunk), float(np.frombuffer(chunk, dtype=np.uint8).mean())))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "offset", "n_bytes", "mean_byte"]
            )

    return media.select("media_id", "content").mapInPandas(
        run, "media_id long, frame_no int, offset long, n_bytes int, mean_byte double"
    )


def media_table(spark, n: int = 12, width: int = 32, height: int = 24) -> DataFrame:
    """Deterministic in-memory media table for tests/demos."""
    rows = [
        (i, "image", bytearray(fake_image(width, height, seed=i)), ("image/fake", f"mem://{i}"))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
