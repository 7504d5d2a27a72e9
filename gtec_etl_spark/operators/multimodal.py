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


NETPBM_MAGICS = (b"P2", b"P3", b"P5", b"P6")


def _npbm_token(buf: bytes, pos: int) -> tuple[int, int]:
    """Next ASCII integer token at/after `pos`, skipping whitespace and
    '#'-to-end-of-line comments (netpbm header grammar)."""
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c == 0x23:  # '#'
            while pos < n and buf[pos] not in (0x0A, 0x0D):
                pos += 1
        elif chr(c).isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not chr(buf[pos]).isspace() and buf[pos] != 0x23:
        pos += 1
    if start == pos:
        raise ValueError("truncated netpbm header")
    return int(buf[start:pos]), pos


def _decode_netpbm(content: bytes) -> tuple[int, int, bytes]:
    """Pure-Python decoder for the uncompressed public netpbm formats —
    P5/P2 grayscale (PGM) and P6/P3 RGB (PPM), binary and ASCII rasters —
    the round-6 closure of the codec stub (no external image library
    needed for a REAL public format). Deterministic integer pipeline:
    values scale to 0-255 by (v*255 + maxval//2) // maxval when
    maxval < 255, and RGB collapses to luma (299R + 587G + 114B) // 1000
    (BT.601 weights, truncating — PIL convert('L') semantics). 16-bit
    rasters (maxval > 255) stay beyond the boundary."""
    magic = content[:2]
    _, pos = 0, 2
    w, pos = _npbm_token(content, pos)
    h, pos = _npbm_token(content, pos)
    maxval, pos = _npbm_token(content, pos)
    if not (0 < maxval <= 255):
        raise NotImplementedError(
            f"netpbm maxval {maxval}: 16-bit rasters are outside the"
            " pure-Python decode boundary"
        )
    nch = 3 if magic in (b"P3", b"P6") else 1
    n_vals = w * h * nch
    if magic in (b"P5", b"P6"):
        pos += 1  # spec: exactly ONE whitespace byte after maxval
        raster = content[pos : pos + n_vals]
        if len(raster) != n_vals:
            raise ValueError("truncated netpbm raster")
        vals = np.frombuffer(raster, dtype=np.uint8).astype(np.int64)
    else:
        import re

        body = re.sub(rb"#[^\n\r]*", b"", content[pos:])
        toks = body.split()
        if len(toks) < n_vals:
            raise ValueError("truncated netpbm ASCII raster")
        vals = np.array([int(t) for t in toks[:n_vals]], dtype=np.int64)
    if maxval != 255:
        vals = (vals * 255 + maxval // 2) // maxval
    if nch == 3:
        rgb = vals.reshape(-1, 3)
        vals = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
    return w, h, vals.astype(np.uint8).tobytes()


# (fmt, maxval) per media_id % 4 — covers binary/ASCII x RGB/gray and the
# maxval-rescale path. Shared by netpbm_media_table and the golden fixture.
NETPBM_CYCLE = (("P6", 255), ("P5", 255), ("P3", 100), ("P2", 99))


def netpbm_values(width: int, height: int, seed: int, nch: int, maxval: int) -> list[int]:
    """The deterministic LCG sample stream for synthetic netpbm payloads —
    same recurrence as fake_image, values in [0, maxval]."""
    n = width * height * nch
    x = (seed * 2654435761) % (2**32)
    vals = []
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append(x % (maxval + 1))
    return vals


def fake_netpbm(
    width: int, height: int, seed: int, fmt: str = "P6", maxval: int = 255
) -> bytes:
    """Deterministic REAL netpbm file (PGM/PPM): proper header with a
    comment line (exercises the tokenizer), then a binary or ASCII
    raster."""
    nch = 3 if fmt in ("P6", "P3") else 1
    vals = netpbm_values(width, height, seed, nch, maxval)
    header = (
        f"{fmt}\n# synthetic netpbm test image seed={seed}\n"
        f"{width} {height}\n{maxval}\n"
    ).encode()
    if fmt in ("P5", "P6"):
        return header + bytes(vals)
    return header + " ".join(str(v) for v in vals).encode()


def netpbm_media_table(
    spark, n: int = 12, width: int = 31, height: int = 17
) -> DataFrame:
    """Deterministic media table whose payloads are REAL netpbm files,
    cycling through NETPBM_CYCLE formats by media_id."""
    rows = []
    for i in range(n):
        fmt, maxval = NETPBM_CYCLE[i % len(NETPBM_CYCLE)]
        rows.append(
            (
                i,
                "image",
                bytearray(fake_netpbm(width, height, seed=i, fmt=fmt, maxval=maxval)),
                (f"image/x-portable-{'pixmap' if fmt in ('P6', 'P3') else 'graymap'}",
                 f"mem://netpbm/{i}.{fmt}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_one(content: bytes) -> tuple[int, int, bytes]:
    """Decode bytes -> (width, height, grayscale pixels). FAKEIMG is the
    deterministic test container; netpbm (PGM/PPM) is the REAL
    dependency-free path; PIL is the optional richer-codec path; anything
    else is beyond the stub boundary."""
    if content[: len(FAKEIMG_MAGIC)] == FAKEIMG_MAGIC:
        w, h = struct.unpack("<II", content[7:15])
        return w, h, content[15 : 15 + w * h]
    if content[:2] in NETPBM_MAGICS:
        return _decode_netpbm(content)
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)

        img = Image.open(io.BytesIO(content)).convert("L")
        return img.width, img.height, img.tobytes()
    except ImportError:
        raise NotImplementedError(
            "decoding this format requires PIL (not in this container); "
            "supported without dependencies: FAKEIMG, netpbm P2/P3/P5/P6"
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
