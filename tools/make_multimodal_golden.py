"""Generate golden-fixture parquet for the multimodal queries.

The FAKEIMG codec is fully deterministic (operators/multimodal.py:40-49), so
the expected outputs of `mm_decode_features` and `mm_resize_frame_sample`
are computable OUTSIDE Spark. This script recomputes them in pure
numpy/stdlib — an independent implementation of the LCG pixel stream,
byte-histogram embedding, nearest-neighbor resize, and frame sampling —
and writes fixtures/multimodal/*.parquet. The registered DuckDB oracles
read these files, turning both queries from rows-only checks into full
hash-matched correctness rows.

Rounding matches Spark's F.round(double, n): HALF_UP on the shortest
decimal representation (java.math.BigDecimal.valueOf semantics).

Usage: python tools/make_multimodal_golden.py
"""

from __future__ import annotations

import os
import struct
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FAKEIMG_MAGIC = b"FAKEIMG"
OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "fixtures", "multimodal")
)


def spark_round(v: float, n: int) -> float:
    """Spark F.round(double, n): BigDecimal.valueOf(v).setScale(n, HALF_UP)."""
    return float(Decimal(repr(v)).quantize(Decimal(1).scaleb(-n), ROUND_HALF_UP))


def lcg_pixels(width: int, height: int, seed: int) -> np.ndarray:
    """Independent recomputation of fake_image's pixel stream."""
    n = width * height
    x = (seed * 2654435761) % (2**32)
    pix = np.empty(n, dtype=np.uint8)
    for i in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        pix[i] = x % 256
    return pix


def container(width: int, height: int, pix: np.ndarray) -> bytes:
    return FAKEIMG_MAGIC + struct.pack("<II", width, height) + pix.tobytes()


def decode_features_golden(n: int = 16, width: int = 32, height: int = 24,
                           bins: int = 8) -> pa.Table:
    """Expected output of mm_decode_features: decode summary + histogram
    embedding mass per media row (media_table(n=16, 32x24), bins=8)."""
    rows = []
    for mid in range(n):
        pix = lcg_pixels(width, height, seed=mid)
        blob = np.frombuffer(container(width, height, pix), dtype=np.uint8)
        hist, _ = np.histogram(blob, bins=bins, range=(0, 256))
        total = hist.sum() or 1
        emb = hist / total
        # Spark's F.aggregate folds left-to-right; replicate that order.
        mass = 0.0
        for v in emb:
            mass += float(v)
        rows.append(
            {
                "media_id": mid,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(pix.mean()), 4),
                "embedding_mass": spark_round(mass, 4),
            }
        )
    return pa.Table.from_pylist(rows)


def resize_frame_sample_golden(n: int = 12, width: int = 64, height: int = 48,
                               tw: int = 16, th: int = 12,
                               every_n_bytes: int = 64) -> pa.Table:
    """Expected output of mm_resize_frame_sample: resize 64x48 -> 16x12,
    re-encode, sample frames every 64 bytes, summarize per media row."""
    rows = []
    for mid in range(n):
        arr = lcg_pixels(width, height, seed=mid).reshape(height, width)
        yi = (np.arange(th) * height // th).astype(int)
        xi = (np.arange(tw) * width // tw).astype(int)
        small = arr[np.ix_(yi, xi)]
        blob = container(tw, th, small.ravel())
        means = []
        total_bytes = 0
        for off in range(0, len(blob), every_n_bytes):
            chunk = np.frombuffer(blob[off : off + every_n_bytes], dtype=np.uint8)
            means.append(float(chunk.mean()))
            total_bytes += len(chunk)
        rows.append(
            {
                "media_id": mid,
                "n_frames": len(means),
                "total_bytes": total_bytes,
                "avg_frame_intensity": spark_round(sum(means) / len(means), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_ppm_golden(n: int = 12, width: int = 31, height: int = 17) -> pa.Table:
    """Expected output of mm_decode_ppm. Independent recomputation: the
    LCG value stream is regenerated directly (mod maxval+1) and the decode
    result — 0-255 rescale, BT.601 integer luma, mean intensity — is
    computed from the VALUES, never going through the engine's netpbm
    parser (which is exactly what the query is testing)."""
    cycle = (("P6", 255), ("P5", 255), ("P3", 100), ("P2", 99))
    rows = []
    for mid in range(n):
        fmt, maxval = cycle[mid % 4]
        nch = 3 if fmt in ("P6", "P3") else 1
        x = (mid * 2654435761) % (2**32)
        vals = np.empty(width * height * nch, dtype=np.int64)
        for i in range(len(vals)):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % (maxval + 1)
        if maxval != 255:
            vals = (vals * 255 + maxval // 2) // maxval
        if nch == 3:
            rgb = vals.reshape(-1, 3)
            vals = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        rows.append(
            {
                "media_id": mid,
                "fmt": fmt,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(vals.mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_png_golden(n: int = 12, width: int = 23, height: int = 19) -> pa.Table:
    """Expected output of mm_decode_png. Independent recomputation: the LCG
    byte stream is regenerated directly and projected to grayscale (channel
    0 for gray/gray+alpha, BT.601 integer luma for RGB/RGBA) WITHOUT going
    through the engine's PNG encoder/decoder (the zlib round-trip is
    exactly what the query is testing)."""
    cycle = (0, 2, 4, 6, 3)  # PNG_CYCLE incl. palette, independently
    nch_of = {0: 1, 2: 3, 4: 2, 6: 4, 3: 1}
    pal_size, pal_seed_off = 64, 9973  # PNG_PAL_* constants, independently

    def lcg(seed: int, count: int, mod: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.int64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % mod
        return vals

    rows = []
    for mid in range(n):
        ctype = cycle[mid % len(cycle)]
        nch = nch_of[ctype]
        if ctype == 3:
            idx = lcg(mid, width * height, pal_size)
            pal = lcg(mid + pal_seed_off, pal_size * 3, 256).reshape(-1, 3)
            rgb = pal[idx]
            g = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        else:
            vals = lcg(mid, width * height * nch, 256)
            px = vals.reshape(width * height, nch)
            if ctype in (0, 4):
                g = px[:, 0]
            else:
                g = (299 * px[:, 0] + 587 * px[:, 1] + 114 * px[:, 2]) // 1000
        rows.append(
            {
                "media_id": mid,
                "color_type": ctype,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(g.mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_jpeg_golden(n: int = 12, width: int = 24, height: int = 17) -> pa.Table:
    """Expected output of mm_decode_jpeg. The entropy layer (markers,
    Huffman, byte stuffing, restart intervals) is what the query tests,
    so the golden recomputes the LOSSY math only — LCG luma plane ->
    edge-replicated pad to the MCU grid -> per-block orthonormal DCT ->
    flat quant round-trip (rint(c/q)*q, DC 1 / AC 2) -> IDCT -> crop ->
    rint+clip — without touching the codec module's bitstream reader or
    writer. Layout cycle mirrors JPEG_CYCLE: gray, 4:4:4, 4:2:0,
    4:2:0+DRI — chroma never reaches the luma output, so only the MCU
    geometry (8 vs 16) differs across layouts."""
    T = np.zeros((8, 8))
    for k in range(8):
        for m in range(8):
            c = (1 / np.sqrt(2)) if k == 0 else 1.0
            T[k, m] = 0.5 * c * np.cos((2 * m + 1) * k * np.pi / 16)
    qtab = np.full((8, 8), 2.0)
    qtab[0, 0] = 1.0
    # mcu luma tile size per JPEG_CYCLE index: gray/444 -> 8, 4:2:0 -> 16
    tile_of = (8, 8, 16, 16)

    def lcg(seed: int, count: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.float64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % 256
        return vals

    rows = []
    for mid in range(n):
        tile = tile_of[mid % 4]
        pw = -(-width // tile) * tile
        ph = -(-height // tile) * tile
        plane = lcg(mid, width * height).reshape(height, width)
        pad = np.zeros((ph, pw))
        pad[:height, :width] = plane
        if width < pw:
            pad[:height, width:] = plane[:, -1:]
        if height < ph:
            pad[height:, :] = pad[height - 1 : height, :]
        recon = np.zeros_like(pad)
        for r0 in range(0, ph, 8):
            for c0 in range(0, pw, 8):
                blk = pad[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                coef = np.rint((T @ blk @ T.T) / qtab) * qtab
                recon[r0 : r0 + 8, c0 : c0 + 8] = T.T @ coef @ T + 128.0
        g = np.clip(np.rint(recon[:height, :width]), 0, 255).astype(np.uint8)
        rows.append(
            {
                "media_id": mid,
                "layout": mid % 4,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(g.reshape(-1).mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_jpeg12_golden(
    n: int = 12, width: int = 24, height: int = 17
) -> pa.Table:
    """Expected output of mm_decode_jpeg_12bit: the extended-precision
    baseline mode. Same codec-free flat-quant DCT recompute as the 8-bit
    golden but on 12-bit LCG planes (values mod 4096, level shift 2048)
    with the decoder's clip-to-4095-then->>4 luma collapse.
    JPEG12_CYCLE: gray q=1, gray q=3 + DRI, 4:4:4 q=1, 4:2:0 q=1."""
    T = np.zeros((8, 8))
    for k in range(8):
        for m in range(8):
            c = (1 / np.sqrt(2)) if k == 0 else 1.0
            T[k, m] = 0.5 * c * np.cos((2 * m + 1) * k * np.pi / 16)
    layout_of = ((8, 1), (8, 3), (8, 1), (16, 1))  # (luma tile, q)

    def lcg12(seed: int, count: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.float64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % 4096
        return vals

    rows = []
    for mid in range(n):
        tile, q = layout_of[mid % 4]
        qtab = np.full((8, 8), 2.0 * q)
        qtab[0, 0] = float(q)
        pw = -(-width // tile) * tile
        ph = -(-height // tile) * tile
        plane = lcg12(mid, width * height).reshape(height, width)
        pad = np.zeros((ph, pw))
        pad[:height, :width] = plane
        if width < pw:
            pad[:height, width:] = plane[:, -1:]
        if height < ph:
            pad[height:, :] = pad[height - 1 : height, :]
        recon = np.zeros_like(pad)
        for r0 in range(0, ph, 8):
            for c0 in range(0, pw, 8):
                blk = pad[r0 : r0 + 8, c0 : c0 + 8] - 2048.0
                coef = np.rint((T @ blk @ T.T) / qtab) * qtab
                recon[r0 : r0 + 8, c0 : c0 + 8] = T.T @ coef @ T + 2048.0
        full = np.clip(
            np.rint(recon[:height, :width]), 0, 4095
        ).astype(np.int64)
        g = (full >> 4).astype(np.uint8)
        rows.append(
            {
                "media_id": mid,
                "layout": mid % 4,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(g.reshape(-1).mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_jpeg_prog_golden(
    n: int = 12, width: int = 24, height: int = 17
) -> pa.Table:
    """Expected output of mm_decode_jpeg_progressive. The progressive
    entropy layer (scan script, spectral selection, successive
    approximation, EOB runs, correction bits) is what the query tests; the
    lossy DCT math is IDENTICAL to baseline, so the golden recomputes the
    same flat-quant round-trip per layout (JPEG_PROG_CYCLE: gray q=1,
    gray q=8, 4:4:4 q=1, 4:2:0 q=1) without touching the codec module."""
    T = np.zeros((8, 8))
    for k in range(8):
        for m in range(8):
            c = (1 / np.sqrt(2)) if k == 0 else 1.0
            T[k, m] = 0.5 * c * np.cos((2 * m + 1) * k * np.pi / 16)
    # (luma tile, q) per JPEG_PROG_CYCLE index
    layout_of = ((8, 1), (8, 8), (8, 1), (16, 1))

    def lcg(seed: int, count: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.float64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % 256
        return vals

    rows = []
    for mid in range(n):
        tile, q = layout_of[mid % 4]
        qtab = np.full((8, 8), 2.0 * q)
        qtab[0, 0] = float(q)
        pw = -(-width // tile) * tile
        ph = -(-height // tile) * tile
        plane = lcg(mid, width * height).reshape(height, width)
        pad = np.zeros((ph, pw))
        pad[:height, :width] = plane
        if width < pw:
            pad[:height, width:] = plane[:, -1:]
        if height < ph:
            pad[height:, :] = pad[height - 1 : height, :]
        recon = np.zeros_like(pad)
        for r0 in range(0, ph, 8):
            for c0 in range(0, pw, 8):
                blk = pad[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                coef = np.rint((T @ blk @ T.T) / qtab) * qtab
                recon[r0 : r0 + 8, c0 : c0 + 8] = T.T @ coef @ T + 128.0
        g = np.clip(np.rint(recon[:height, :width]), 0, 255).astype(np.uint8)
        rows.append(
            {
                "media_id": mid,
                "layout": mid % 4,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(g.reshape(-1).mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_wav_g711_golden(
    n: int = 12, n_frames: int = 480, sample_rate: int = 8000
) -> pa.Table:
    """Expected output of mm_decode_wav_g711: G.711 a-law/mu-law companded
    clips and IEEE float64, recomputed from the LCG stream with
    INDEPENDENT compress+expand implementations of the G.711 formulas
    (the operator module is never imported here)."""
    cycle = ((8, 1, 6), (8, 2, 6), (8, 1, 7), (8, 2, 7), (64, 1, 3), (64, 2, 3))

    def mu_comp(x):
        sign = 0x80 if x < 0 else 0
        m = min(abs(x), 32635) + 0x84
        exp = m.bit_length() - 8
        return (~(sign | (exp << 4) | ((m >> (exp + 3)) & 0x0F))) & 0xFF

    def mu_exp(b):
        u = (~b) & 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
        return -mag if (u >> 7) & 1 else mag

    def al_comp(x):
        mask = 0xD5 if x >= 0 else 0x55
        m = min(abs(x), 32767)
        if m >= 256:
            exp = m.bit_length() - 9
            byte = ((exp + 1) << 4) | ((m >> (exp + 4)) & 0x0F)
        else:
            byte = m >> 4
        return byte ^ mask

    def al_exp(b):
        a = b ^ 0x55
        exp = (a >> 4) & 7
        mant = a & 0x0F
        mag = (mant << 4) + 8 if exp == 0 else ((mant << 4) + 0x108) << max(exp - 1, 0)
        return mag if (a >> 7) & 1 else -mag

    rows = []
    for mid in range(n):
        bits, nch, fmtc = cycle[mid % len(cycle)]
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames * nch):
            x = (1103515245 * x + 12345) % (2**31)
            vals.append((x % 65536) - 32768)
        if fmtc == 3:
            out = vals  # float64 v/32768 expands back exactly
        elif fmtc == 6:
            out = [al_exp(al_comp(v)) for v in vals]
        else:
            out = [mu_exp(mu_comp(v)) for v in vals]
        s = np.array(out, dtype=np.int64)
        rows.append(
            {
                "media_id": mid,
                "sample_rate": sample_rate,
                "n_channels": nch,
                "bits": bits,
                "n_frames": n_frames,
                "peak_abs": int(np.abs(s).max()),
                "mean_abs_e3": int(np.abs(s).sum()) * 1000 // len(s),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_png_subbyte_golden(
    n: int = 12, width: int = 23, height: int = 19
) -> pa.Table:
    """Expected output of mm_decode_png_subbyte: 1/2/4-bit gray and
    palette layouts (plain + Adam7 — interlace only reorders bytes, the
    pixel grid is identical), recomputed from the LCG stream WITHOUT the
    encoder/decoder. Gray samples scale by the integral 255/(2^d-1);
    palette indices look up a 2^d-entry LCG palette."""
    cycle = (
        (0, 1, 0), (0, 2, 0), (0, 4, 0), (3, 1, 0), (3, 2, 0), (3, 4, 0),
        (0, 1, 1), (0, 2, 1), (0, 4, 1), (3, 1, 1), (3, 2, 1), (3, 4, 1),
    )
    pal_seed_off = 9973

    def lcg(seed: int, count: int, mod: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.int64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % mod
        return vals

    rows = []
    for mid in range(n):
        ctype, depth, il = cycle[mid % len(cycle)]
        maxv = (1 << depth) - 1
        vals = lcg(mid, width * height, maxv + 1)
        if ctype == 3:
            pal = lcg(mid + pal_seed_off, (1 << depth) * 3, 256).reshape(-1, 3)
            rgb = pal[vals]
            g = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        else:
            g = vals * (255 // maxv)
        rows.append(
            {
                "media_id": mid,
                "color_type": ctype,
                "bit_depth": depth,
                "interlace": il,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(g.mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_wav_golden(
    n: int = 12, n_frames: int = 480, sample_rate: int = 8000
) -> pa.Table:
    """Expected output of mm_decode_wav: rate/layout + exact integer
    amplitude stats per clip, recomputed straight from the LCG sample
    stream WITHOUT the RIFF parser (wav_media_table(n=12, 480 frames))."""
    cycle = ((16, 1), (16, 2), (8, 1), (8, 2))  # WAV_CYCLE, independently
    rows = []
    for mid in range(n):
        bits, nch = cycle[mid % 4]
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames * nch):
            x = (1103515245 * x + 12345) % (2**31)
            v = (x % 65536) - 32768 if bits == 16 else x % 256
            vals.append(v if bits == 16 else v - 128)
        s = np.array(vals, dtype=np.int64)
        rows.append(
            {
                "media_id": mid,
                "sample_rate": sample_rate,
                "n_channels": nch,
                "bits": bits,
                "n_frames": n_frames,
                "peak_abs": int(np.abs(s).max()),
                "mean_abs_e3": int(1000 * np.abs(s).sum()) // len(s),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_wav_deep_golden(
    n: int = 12, n_frames: int = 480, sample_rate: int = 8000
) -> pa.Table:
    """Expected output of mm_decode_wav_deep: the WIDE layouts (24/32-bit
    int PCM, IEEE float32), recomputed straight from the LCG sample stream
    WITHOUT the RIFF writer or parser. The float32 branch stores v/32768
    of the 16-bit stream and the decoder truncates back by *32768, so its
    expected samples are exactly the 16-bit stream values."""
    cycle = ((24, 1, 1), (24, 2, 1), (32, 1, 1), (32, 2, 1), (32, 1, 3), (32, 2, 3))
    rows = []
    for mid in range(n):
        bits, nch, fmtc = cycle[mid % len(cycle)]
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames * nch):
            x = (1103515245 * x + 12345) % (2**31)
            hi = (x % 65536) - 32768
            if fmtc == 3:
                vals.append(hi)
                continue
            x = (1103515245 * x + 12345) % (2**31)
            vals.append(hi * 256 + x % 256 if bits == 24 else hi * 65536 + x % 65536)
        s = np.array(vals, dtype=np.int64)
        rows.append(
            {
                "media_id": mid,
                "sample_rate": sample_rate,
                "n_channels": nch,
                "bits": bits,
                "n_frames": n_frames,
                "peak_abs": int(np.abs(s).max()),
                "mean_abs_e3": int(1000 * np.abs(s).sum()) // len(s),
            }
        )
    return pa.Table.from_pylist(rows)


def audio_rms_windows_golden(
    n: int = 12, n_frames: int = 480, sample_rate: int = 8000,
    window_frames: int = 160,
) -> pa.Table:
    """Expected output of mm_audio_rms_windows: tumbling-window integer
    energy/peak/RMS per clip, recomputed straight from the LCG stream
    without the RIFF parser or the operator."""
    import math

    cycle = ((16, 1), (16, 2), (8, 1), (8, 2))
    rows = []
    for mid in range(n):
        bits, nch = cycle[mid % 4]
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames * nch):
            x = (1103515245 * x + 12345) % (2**31)
            v = (x % 65536) - 32768 if bits == 16 else x % 256
            vals.append(v if bits == 16 else v - 128)
        s = np.array(vals, dtype=np.int64)
        for w in range(-(-n_frames // window_frames)):
            lo, hi = w * window_frames, min((w + 1) * window_frames, n_frames)
            seg = s[lo * nch : hi * nch]
            energy = int((seg * seg).sum())
            rows.append(
                {
                    "media_id": mid,
                    "window_idx": w,
                    "n_frames": hi - lo,
                    "energy": energy,
                    "peak_abs": int(np.abs(seg).max()),
                    "rms_e3": math.isqrt(energy * 1_000_000 // len(seg)),
                }
            )
    return pa.Table.from_pylist(rows)


def image_hist_golden(
    n: int = 16, n_base: int = 12, width: int = 32, height: int = 24,
    bins: int = 16,
) -> pa.Table:
    """Expected (media_id, hist) for mm_image_neardup's 16-row media
    table (ids >= n_base duplicate seed id % n_base): integer byte
    histograms of the FULL container blob (header + raster), recomputed
    here with a different binning formulation (floor-divide bincount)
    than the operator."""
    rows = []
    for mid in range(n):
        seed = mid % n_base
        pix = lcg_pixels(width, height, seed=seed) % (16 * (seed + 1))
        blob = np.frombuffer(
            container(width, height, pix.astype(np.uint8)), dtype=np.uint8
        )
        hist = np.bincount(blob // (256 // bins), minlength=bins)
        rows.append({"media_id": mid, "hist": [int(x) for x in hist]})
    return pa.Table.from_pylist(rows)


def decode_wav_adpcm_golden(
    n: int = 12, n_frames: int = 480, sample_rate: int = 8000
) -> pa.Table:
    """Expected output of mm_decode_wav_adpcm: IMA-ADPCM (format 17) and
    MS-ADPCM (format 2) clips, recomputed from the LCG stream with an
    INDEPENDENT simulation of both codecs' quantize+reconstruct loops
    (the operator module is never imported here). Because ADPCM decode
    state mirrors encode state exactly, the decoded stream equals the
    encoder's reconstruction track — which this recomputes from spec
    tables alone."""
    cycle = ((17, 1, 249), (17, 2, 249), (17, 1, 9), (2, 1, 64), (2, 2, 64), (2, 2, 9))
    ima_steps = [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ]
    ima_idx_adj = [-1, -1, -1, -1, 2, 4, 6, 8]
    ms_c1 = [256, 512, 0, 192, 240, 460, 392]
    ms_c2 = [0, -256, 0, 64, 0, -208, -232]
    ms_adapt = [230, 230, 230, 230, 307, 409, 512, 614,
                768, 614, 512, 409, 307, 230, 230, 230]

    def clamp16(v):
        return max(-32768, min(32767, v))

    def ima_reconstruct(samples, spb):
        """Per-channel IMA track: header restarts predictor at the true
        sample each block; step index carries across blocks."""
        out, idx = [], 0
        for b0 in range(0, len(samples), spb):
            pred = samples[b0]
            out.append(pred)
            for s in samples[b0 + 1 : b0 + spb]:
                # quantize (truncating successive-halving search) ...
                step, diff = ima_steps[idx], s - pred
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                for bit in (4, 2, 1):
                    if diff >= step:
                        nib |= bit
                        diff -= step
                    step >>= 1
                # ... then reconstruct with the same nibble
                step = ima_steps[idx]
                d = step >> 3
                if nib & 1:
                    d += step >> 2
                if nib & 2:
                    d += step >> 1
                if nib & 4:
                    d += step
                pred = clamp16(pred - d if nib & 8 else pred + d)
                idx = max(0, min(88, idx + ima_idx_adj[nib & 7]))
                out.append(pred)
        return out

    def ms_pred(s1, s2, c1, c2):
        # truncate-TOWARD-ZERO /256, matching the spec (and ffmpeg) —
        # a flooring >> 8 differs when the accumulator is negative
        acc = s1 * c1 + s2 * c2
        return -((-acc) >> 8) if acc < 0 else acc >> 8

    def ms_reconstruct(samples, spb, seed, ch):
        """Per-channel MS track: each block seeds (s2, s1) with the first
        two true samples, a deterministic delta, and a cycling predictor
        index; the quantizer is truncate-toward-zero diff/delta."""
        out = []
        for bi, b0 in enumerate(range(0, len(samples), spb)):
            c1, c2 = ms_c1[(bi + seed) % 7], ms_c2[(bi + seed) % 7]
            delta = 16 + (b0 * 7919 + seed * 131 + ch * 17) % 1000
            s2, s1 = samples[b0], samples[b0 + 1]
            out += [s2, s1]
            for s in samples[b0 + 2 : b0 + spb]:
                pred = ms_pred(s1, s2, c1, c2)
                code = max(-8, min(7, int((s - pred) / delta)))
                nib = code & 0x0F
                signed = nib - 16 if nib >= 8 else nib
                samp = clamp16(pred + signed * delta)
                delta = max(16, (ms_adapt[nib] * delta) >> 8)
                s2, s1 = s1, samp
                out.append(samp)
        return out

    rows = []
    for mid in range(n):
        fmtc, nch, spb = cycle[mid % len(cycle)]
        frames = -(-n_frames // spb) * spb
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(frames * nch):
            x = (1103515245 * x + 12345) % (2**31)
            vals.append((x % 65536) - 32768)
        tracks = []
        for c in range(nch):
            ch_vals = vals[c::nch]
            if fmtc == 17:
                tracks.append(ima_reconstruct(ch_vals, spb))
            else:
                tracks.append(ms_reconstruct(ch_vals, spb, mid, c))
        s = np.empty(frames * nch, dtype=np.int64)
        for c in range(nch):
            s[c::nch] = tracks[c]
        rows.append(
            {
                "media_id": mid,
                "sample_rate": sample_rate,
                "n_channels": nch,
                "bits": 4,
                "n_frames": frames,
                "peak_abs": int(np.abs(s).max()),
                "mean_abs_e3": int(np.abs(s).sum()) * 1000 // len(s),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_phash_golden(n_base: int = 12, width: int = 24, height: int = 24) -> pa.Table:
    """Expected (media_id, phash) for mm_phash_neardup's fixture:
    recomputed from the LCG gray stream with an INDEPENDENT plain-Python
    pipeline — perturbation, 8x8 truncating box means, recursive-definition
    Walsh-Hadamard (H_2n = [[H_n, H_n], [H_n, -H_n]] expanded as an
    explicit sign-matrix product rather than in-place butterflies), and
    the strict-median sign bits. The operator module is never imported."""
    # explicit 8x8 Hadamard sign matrix from the recursive definition
    had = [[1]]
    while len(had) < 8:
        had = [r + r for r in had] + [r + [-x for x in r] for r in had]

    def phash(vals):
        cells = []
        bh, bw = height // 8, width // 8
        for r in range(8):
            for c in range(8):
                s = 0
                for y in range(r * bh, (r + 1) * bh):
                    for x in range(c * bw, (c + 1) * bw):
                        s += vals[y * width + x]
                cells.append(s // (bh * bw))
        # 2-D WHT as H @ G @ H^T (H symmetric) in exact int arithmetic
        g = [cells[r * 8 : r * 8 + 8] for r in range(8)]
        hg = [[sum(had[i][k] * g[k][j] for k in range(8)) for j in range(8)] for i in range(8)]
        full = [[sum(hg[i][k] * had[k][j] for k in range(8)) for j in range(8)] for i in range(8)]
        flat = [full[r][c] for r in range(8) for c in range(8)][1:]
        med = sorted(flat)[31]
        return sum(1 << i for i, v in enumerate(flat) if v > med)

    rows = []
    for i in range(n_base):
        x = (i * 2654435761) % (2**32)
        vals = []
        for _ in range(width * height):
            x = (1103515245 * x + 12345) % (2**31)
            vals.append(x % 256)
        rows.append({"media_id": i, "phash": phash(vals)})
        pv = list(vals)
        for j in range(3):
            pos = (i * 48271 + j * 40503 + 12345) % len(pv)
            pv[pos] = (pv[pos] + 32) % 256
        rows.append({"media_id": 100 + i, "phash": phash(pv)})
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["media_id"]))


def audio_fp_golden(n_base: int = 12, n_frames: int = 1920, n_win: int = 64) -> pa.Table:
    """Expected (media_id, phash) for mm_audio_fingerprint's fixture:
    recomputed from the 16-bit LCG sample stream with an INDEPENDENT
    plain-Python pipeline — int16-wraparound perturbation, absolute-
    amplitude window sums, and a size-64 Hadamard MATRIX product (the
    recursive sign-matrix definition, not butterflies). The operator
    module is never imported."""
    had = [[1]]
    while len(had) < n_win:
        had = [r + r for r in had] + [r + [-x for x in r] for r in had]

    def fp(vals):
        per = len(vals) // n_win
        env = [sum(abs(v) for v in vals[w * per : (w + 1) * per]) for w in range(n_win)]
        coefs = [sum(had[i][k] * env[k] for k in range(n_win)) for i in range(n_win)][1:]
        med = sorted(coefs)[(len(coefs) - 1) // 2]
        return sum(1 << i for i, v in enumerate(coefs) if v > med)

    rows = []
    for i in range(n_base):
        x = (i * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames):
            x = (1103515245 * x + 12345) % (2**31)
            vals.append((x % 65536) - 32768)
        rows.append({"media_id": i, "phash": fp(vals)})
        pv = list(vals)
        for j in range(16):
            pos = (i * 48271 + j * 40503 + 12345) % len(pv)
            pv[pos] = ((pv[pos] + 32768 + 3000) % 65536) - 32768
        rows.append({"media_id": 100 + i, "phash": fp(pv)})
    return pa.Table.from_pylist(sorted(rows, key=lambda r: r["media_id"]))


def decode_video_golden(n: int = 8, frame_stride: int = 2) -> pa.Table:
    """Expected output of mm_decode_video_mjpeg: AVI/MJPEG clips whose
    sampled frames are recomputed with the SAME codec-free flat-quant
    DCT math as decode_jpeg_golden (LCG luma plane -> orthonormal DCT ->
    rint quant round-trip -> IDCT -> rint+clip) — the container walker,
    JPEG bitstream, and operator module are never touched. Frame f of
    video mid uses LCG seed mid*1000+f; the cycle mirrors AVI_CYCLE."""
    cycle = ((6, 16, 16, 10), (4, 24, 16, 15), (8, 16, 8, 30), (5, 8, 8, 25))
    T = np.zeros((8, 8))
    for k in range(8):
        for m in range(8):
            c = (1 / np.sqrt(2)) if k == 0 else 1.0
            T[k, m] = 0.5 * c * np.cos((2 * m + 1) * k * np.pi / 16)
    qtab = np.full((8, 8), 2.0)
    qtab[0, 0] = 1.0

    def lcg(seed: int, count: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.float64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % 256
        return vals

    rows = []
    for mid in range(n):
        nf, w, h, fps = cycle[mid % 4]
        total = decoded = 0
        for f in range(0, nf, frame_stride):
            plane = lcg(mid * 1000 + f, w * h).reshape(h, w)
            recon = np.zeros_like(plane)
            for r0 in range(0, h, 8):
                for c0 in range(0, w, 8):
                    blk = plane[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    coef = np.rint((T @ blk @ T.T) / qtab) * qtab
                    recon[r0 : r0 + 8, c0 : c0 + 8] = T.T @ coef @ T + 128.0
            g = np.clip(np.rint(recon), 0, 255).astype(np.uint8)
            total += int(g.astype(np.int64).sum())
            decoded += 1
        rows.append(
            {
                "media_id": mid, "width": w, "height": h, "fps": fps,
                "n_frames": nf, "frames_decoded": decoded, "total_luma": total,
            }
        )
    return pa.Table.from_pylist(rows)


def decode_gif_golden(n: int = 12, width: int = 23, height: int = 19) -> pa.Table:
    """Expected output of mm_decode_gif. GIF's LZW is LOSSLESS, so the
    golden recomputes palette + index streams straight from the LCG and
    projects BT.601 luma — the LZW coder, interlace reorder, and block
    walker are exactly what the query tests and are never touched here.
    Cycle mirrors GIF_CYCLE: (8, plain), (8, interlaced), (4, plain),
    (2, interlaced)."""
    cycle = ((8, 0), (8, 1), (4, 0), (2, 1))
    pal_off = 7717

    def lcg_vals(count, seed, maxval):
        x = (seed * 2654435761) % (2**32)
        out = []
        for _ in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            out.append(x % (maxval + 1))
        return out

    rows = []
    for mid in range(n):
        depth, il = cycle[mid % 4]
        ncol = 1 << depth
        pal = np.array(
            lcg_vals(ncol * 3, mid + pal_off, 255), dtype=np.int64
        ).reshape(-1, 3)
        idx = np.array(lcg_vals(width * height, mid, ncol - 1), dtype=np.int64)
        rgb = pal[idx]
        luma = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        rows.append(
            {
                "media_id": mid,
                "depth": depth,
                "interlace": il,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(luma.mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_bmp_golden(n: int = 8, width: int = 23, height: int = 19) -> pa.Table:
    """Expected output of mm_decode_bmp: uncompressed BMP is lossless,
    so the golden recomputes the LCG BGR/palette streams and projects
    BT.601 luma — the header/stride/bottom-up walker is what the query
    tests. Cycle mirrors BMP_CYCLE: 24-bit, 8-bit indexed."""
    pal_off = 7717

    def lcg_vals(count, seed, maxval):
        x = (seed * 2654435761) % (2**32)
        out = []
        for _ in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            out.append(x % (maxval + 1))
        return out

    rows = []
    for mid in range(n):
        bpp = (24, 8)[mid % 2]
        if bpp == 24:
            vals = np.array(
                lcg_vals(width * height * 3, mid, 255), dtype=np.int64
            ).reshape(-1, 3)
            luma = (299 * vals[:, 0] + 587 * vals[:, 1] + 114 * vals[:, 2]) // 1000
        else:
            pal = np.array(
                lcg_vals(256 * 3, mid + pal_off, 255), dtype=np.int64
            ).reshape(-1, 3)
            idx = np.array(lcg_vals(width * height, mid, 255), dtype=np.int64)
            rgb = pal[idx]
            luma = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        rows.append(
            {
                "media_id": mid,
                "bpp": bpp,
                "width": width,
                "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(luma.mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def decode_tiff_golden(n: int = 8, width: int = 23, height: int = 19) -> pa.Table:
    """Expected output of mm_decode_tiff: uncompressed TIFF is lossless,
    so the golden recomputes the LCG gray/RGB streams and projects
    BT.601 luma — the IFD/strip/byte-order walker is what the query
    tests. Cycle mirrors TIFF_CYCLE."""
    cycle = ((0, 0), (1, 0), (0, 1), (1, 1))

    def lcg_vals(count, seed):
        x = (seed * 2654435761) % (2**32)
        out = []
        for _ in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            out.append(x % 256)
        return out

    rows = []
    for mid in range(n):
        rgb, be = cycle[mid % 4]
        if rgb:
            v = np.array(lcg_vals(width * height * 3, mid), dtype=np.int64).reshape(-1, 3)
            luma = (299 * v[:, 0] + 587 * v[:, 1] + 114 * v[:, 2]) // 1000
        else:
            luma = np.array(lcg_vals(width * height, mid), dtype=np.int64)
        rows.append(
            {
                "media_id": mid, "rgb": rgb, "big_endian": be,
                "width": width, "height": height,
                "n_pixels": width * height,
                "mean_intensity": spark_round(float(luma.mean()), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(
        decode_features_golden(), os.path.join(OUT_DIR, "mm_decode_features.parquet")
    )
    pq.write_table(
        resize_frame_sample_golden(),
        os.path.join(OUT_DIR, "mm_resize_frame_sample.parquet"),
    )
    pq.write_table(
        decode_ppm_golden(), os.path.join(OUT_DIR, "mm_decode_ppm.parquet")
    )
    pq.write_table(
        decode_png_golden(), os.path.join(OUT_DIR, "mm_decode_png.parquet")
    )
    pq.write_table(
        decode_jpeg_golden(), os.path.join(OUT_DIR, "mm_decode_jpeg.parquet")
    )
    pq.write_table(
        decode_wav_g711_golden(),
        os.path.join(OUT_DIR, "mm_decode_wav_g711.parquet"),
    )
    pq.write_table(
        decode_wav_adpcm_golden(),
        os.path.join(OUT_DIR, "mm_decode_wav_adpcm.parquet"),
    )
    pq.write_table(
        decode_phash_golden(),
        os.path.join(OUT_DIR, "mm_phash.parquet"),
    )
    pq.write_table(
        audio_fp_golden(),
        os.path.join(OUT_DIR, "mm_audio_fp.parquet"),
    )
    pq.write_table(
        decode_video_golden(),
        os.path.join(OUT_DIR, "mm_video.parquet"),
    )
    pq.write_table(
        video_shot_golden(),
        os.path.join(OUT_DIR, "mm_video_shots.parquet"),
    )
    pq.write_table(
        image_augment_golden(),
        os.path.join(OUT_DIR, "mm_image_augment.parquet"),
    )
    pq.write_table(
        audio_augment_golden(),
        os.path.join(OUT_DIR, "mm_audio_augment.parquet"),
    )
    pq.write_table(
        image_tiles_golden(),
        os.path.join(OUT_DIR, "mm_image_tiles.parquet"),
    )
    pq.write_table(
        audio_vad_rms_golden(),
        os.path.join(OUT_DIR, "mm_audio_vad_rms.parquet"),
    )
    pq.write_table(
        decode_gif_golden(),
        os.path.join(OUT_DIR, "mm_decode_gif.parquet"),
    )
    pq.write_table(
        decode_bmp_golden(),
        os.path.join(OUT_DIR, "mm_decode_bmp.parquet"),
    )
    pq.write_table(
        decode_tiff_golden(),
        os.path.join(OUT_DIR, "mm_decode_tiff.parquet"),
    )
    pq.write_table(
        decode_jpeg12_golden(),
        os.path.join(OUT_DIR, "mm_decode_jpeg12.parquet"),
    )
    pq.write_table(
        decode_jpeg_prog_golden(),
        os.path.join(OUT_DIR, "mm_decode_jpeg_prog.parquet"),
    )
    pq.write_table(
        decode_png_subbyte_golden(),
        os.path.join(OUT_DIR, "mm_decode_png_subbyte.parquet"),
    )
    pq.write_table(
        decode_wav_golden(), os.path.join(OUT_DIR, "mm_decode_wav.parquet")
    )
    pq.write_table(
        decode_wav_deep_golden(),
        os.path.join(OUT_DIR, "mm_decode_wav_deep.parquet"),
    )
    pq.write_table(
        audio_rms_windows_golden(),
        os.path.join(OUT_DIR, "mm_audio_rms_windows.parquet"),
    )
    pq.write_table(
        image_hist_golden(), os.path.join(OUT_DIR, "mm_image_hist.parquet")
    )
    print(f"wrote golden fixtures to {OUT_DIR}")




def video_shot_golden(n: int = 8) -> pa.Table:
    """Expected output of mm_video_shot_detect: scene-structured AVI clips
    (SCENE_CYCLE, scenes of 3 identical frames) whose per-frame decoded
    luma is recomputed with the codec-free flat-quant DCT math (see
    decode_video_golden) — then 16-bin histograms (byte >> 4), consecutive
    L1 distances, and cuts where 2*L1 > n_pixels. Container, JPEG
    bitstream, and the operator module are never touched."""
    cycle = ((9, 16, 16, 10), (6, 24, 16, 15), (8, 16, 8, 30), (12, 8, 8, 25))
    scene_len = 3
    T = np.zeros((8, 8))
    for k in range(8):
        for m in range(8):
            c = (1 / np.sqrt(2)) if k == 0 else 1.0
            T[k, m] = 0.5 * c * np.cos((2 * m + 1) * k * np.pi / 16)
    qtab = np.full((8, 8), 2.0)
    qtab[0, 0] = 1.0

    def lcg(seed: int, count: int, maxval: int) -> np.ndarray:
        x = (seed * 2654435761) % (2**32)
        vals = np.empty(count, dtype=np.float64)
        for i in range(count):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % (maxval + 1)
        return vals

    rows = []
    for mid in range(n):
        nf, w, h, fps = cycle[mid % 4]
        npix = w * h
        prev = None
        n_cuts = 0
        max_l1 = 0
        total_l1 = 0
        for f in range(nf):
            scene = f // scene_len
            mv = 255 if scene % 2 == 0 else 95  # alternating luma range
            plane = lcg(mid * 1000 + scene, npix, mv).reshape(h, w)
            recon = np.zeros_like(plane)
            for r0 in range(0, h, 8):
                for c0 in range(0, w, 8):
                    blk = plane[r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    coef = np.rint((T @ blk @ T.T) / qtab) * qtab
                    recon[r0 : r0 + 8, c0 : c0 + 8] = T.T @ coef @ T + 128.0
            g = np.clip(np.rint(recon), 0, 255).astype(np.uint8)
            hist = np.bincount(g.reshape(-1) >> 4, minlength=16).astype(np.int64)
            if prev is not None:
                l1 = int(np.abs(hist - prev).sum())
                total_l1 += l1
                max_l1 = max(max_l1, l1)
                if 2 * l1 > npix:
                    n_cuts += 1
            prev = hist
        rows.append(
            {
                "media_id": mid, "width": w, "height": h, "n_frames": nf,
                "n_shot_cuts": n_cuts, "max_l1": max_l1, "total_l1": total_l1,
            }
        )
    return pa.Table.from_pylist(rows)


def image_augment_golden(
    n: int = 12, width: int = 31, height: int = 17,
    crop_margin: int = 2, brightness: int = 20,
) -> pa.Table:
    """Expected output of mm_image_augment: the netpbm LCG value stream
    (decode_ppm_golden's recomputation — parser never touched) pushed
    through flip / center-crop / brightness-clamp / positional checksum
    in plain numpy."""
    cycle = (("P6", 255), ("P5", 255), ("P3", 100), ("P2", 99))
    rows = []
    for mid in range(n):
        fmt, maxval = cycle[mid % 4]
        nch = 3 if fmt in ("P6", "P3") else 1
        x = (mid * 2654435761) % (2**32)
        vals = np.empty(width * height * nch, dtype=np.int64)
        for i in range(len(vals)):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % (maxval + 1)
        if maxval != 255:
            vals = (vals * 255 + maxval // 2) // maxval
        if nch == 3:
            rgb = vals.reshape(-1, 3)
            vals = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        a = vals.reshape(height, width)
        a = a[:, ::-1]
        a = a[crop_margin : height - crop_margin, crop_margin : width - crop_margin]
        a = np.minimum(a + brightness, 255)
        oh, ow = a.shape
        weights = np.arange(oh * ow, dtype=np.int64).reshape(oh, ow) % 97 + 1
        rows.append(
            {
                "media_id": mid, "out_w": ow, "out_h": oh,
                "aug_sum": int(a.sum()),
                "aug_mean_e4": int(a.sum() * 10000 // (oh * ow)),
                "pos_checksum": int((a * weights).sum()),
            }
        )
    return pa.Table.from_pylist(rows)


def audio_augment_golden(
    n: int = 12, n_frames: int = 480, sample_rate: int = 8000,
    gain_num: int = 5, gain_den: int = 4,
) -> pa.Table:
    """Expected output of mm_audio_augment: the WAV_CYCLE LCG sample
    stream (decode_wav_golden's recomputation — RIFF parser never
    touched) pushed through toward-zero gain, int16 clip, and the
    positional checksum in plain numpy."""
    cycle = ((16, 1), (16, 2), (8, 1), (8, 2))
    rows = []
    for mid in range(n):
        bits, nch = cycle[mid % 4]
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames * nch):
            x = (1103515245 * x + 12345) % (2**31)
            v = (x % 65536) - 32768 if bits == 16 else (x % 256) - 128
            vals.append(v)
        s = np.array(vals, dtype=np.int64)
        scaled = np.sign(s) * (np.abs(s) * gain_num // gain_den)
        clipped = np.clip(scaled, -32768, 32767)
        n = len(clipped)
        weights = np.arange(n, dtype=np.int64) % 97 + 1
        rows.append(
            {
                "media_id": mid, "sample_rate": sample_rate,
                "n_channels": nch, "n_frames": n // nch,
                "n_clipped": int((scaled != clipped).sum()),
                "peak_abs": int(np.abs(clipped).max()),
                "mean_abs_e3": int(np.abs(clipped).sum()) * 1000 // n,
                "pos_checksum": int((clipped * weights).sum()),
            }
        )
    return pa.Table.from_pylist(rows)




def image_tiles_golden(
    n: int = 12, width: int = 31, height: int = 17, tile: int = 8
) -> pa.Table:
    """Expected output of mm_image_tiles: the netpbm LCG value stream
    (parser never touched) tiled on the floor grid with per-tile stats
    and the local-coordinate positional checksum in plain numpy."""
    cycle = (("P6", 255), ("P5", 255), ("P3", 100), ("P2", 99))
    rows = []
    for mid in range(n):
        fmt, maxval = cycle[mid % 4]
        nch = 3 if fmt in ("P6", "P3") else 1
        x = (mid * 2654435761) % (2**32)
        vals = np.empty(width * height * nch, dtype=np.int64)
        for i in range(len(vals)):
            x = (1103515245 * x + 12345) % (2**31)
            vals[i] = x % (maxval + 1)
        if maxval != 255:
            vals = (vals * 255 + maxval // 2) // maxval
        if nch == 3:
            rgb = vals.reshape(-1, 3)
            vals = (299 * rgb[:, 0] + 587 * rgb[:, 1] + 114 * rgb[:, 2]) // 1000
        a = vals.reshape(height, width)
        nr, nc = height // tile, width // tile
        weights = (
            np.arange(tile * tile, dtype=np.int64).reshape(tile, tile) % 97 + 1
        )
        for tr in range(nr):
            for tc in range(nc):
                t = a[tr * tile : (tr + 1) * tile, tc * tile : (tc + 1) * tile]
                rows.append(
                    {
                        "media_id": mid, "tile_row": tr, "tile_col": tc,
                        "tile_sum": int(t.sum()),
                        "tile_mean_e4": int(t.sum() * 10000 // (tile * tile)),
                        "pos_checksum": int((t * weights).sum()),
                        "dropped_rows": height - nr * tile,
                        "dropped_cols": width - nc * tile,
                    }
                )
    return pa.Table.from_pylist(rows)


def audio_vad_rms_golden(
    n: int = 8, n_frames: int = 960, block: int = 80,
    mod: int = 6, loud_lt: int = 3,
) -> pa.Table:
    """Per-window RMS of the VAD fixture clips recomputed from the LCG
    sample stream + gain-block rule (RIFF parser never touched): 16-bit
    LCG samples, block b of clip m attenuated by floor-divide 16 unless
    (b + m) % mod < loud_lt; tumbling `block`-frame windows; exact
    integer energy and isqrt-scaled RMS. The mm_audio_vad oracle runs
    the SAME gaps-and-islands SQL over this table that the engine runs
    over its decoded windows."""
    import math

    rows = []
    for mid in range(n):
        x = (mid * 2654435761) % (2**32)
        vals = []
        for _ in range(n_frames):
            x = (1103515245 * x + 12345) % (2**31)
            vals.append((x % 65536) - 32768)
        samples = []
        for f, v in enumerate(vals):
            b = f // block
            samples.append(v if (b + mid) % mod < loud_lt else v // 16)
        for w in range(n_frames // block):
            seg = samples[w * block : (w + 1) * block]
            energy = sum(v * v for v in seg)
            rows.append(
                {
                    "media_id": mid, "window_idx": w,
                    "rms_e3": math.isqrt(energy * 1_000_000 // len(seg)),
                }
            )
    return pa.Table.from_pylist(rows)


if __name__ == "__main__":
    main()
