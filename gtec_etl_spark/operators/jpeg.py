"""Baseline JPEG (SOF0) decode — the last declared codec frontier
(operators/multimodal.py r7 boundary), closed with a dependency-free
pure numpy/stdlib implementation like the netpbm/PNG/WAV codecs before
it: segment parser (APPn/DQT/DHT/SOF0/DRI/SOS), byte-unstuffed entropy
runs split at restart markers, canonical Huffman decode from the file's
own DHT tables, DC-predictor + run-length AC block decode, dequant,
de-zigzag, float64 orthonormal IDCT, and luma (Y-plane) output — the
mm_* pipeline collapses every raster to 8-bit luma, so chroma blocks
are entropy-decoded (they must be, to advance the bitstream) but not
reconstructed.

Boundary (NotImplementedError, same discipline as the PNG frontier):
progressive (SOF2) and the rare SOF variants, arithmetic coding,
12-bit precision, and a subsampled LUMA component (hY < hmax — never
produced by real encoders, which only subsample chroma).

`fake_jpeg` is the matching deterministic encoder for fixtures: LCG
pixel planes -> forward DCT -> flat quant (DC 1 / AC 2, scaled by q)
-> canonical single-length Huffman tables emitted in DHT (DC: 12
symbols at 4 bits; AC: 162 at 8 bits — valid prefix codes with the
all-ones code unused, so any spec-correct reader opens these files).
Grayscale, 4:4:4, and 4:2:0 layouts, optional restart intervals.

No reference counterpart — the reference pipelines never decode media
(SURVEY.md section 2); charter multimodal extension.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th transmitted
# coefficient. Generated, not transcribed.
_ZZ: list[tuple[int, int]] = []
for _s in range(15):
    _diag = [(_y, _s - _y) for _y in range(max(0, _s - 7), min(_s, 7) + 1)]
    _ZZ += _diag[::-1] if _s % 2 == 0 else _diag
ZIGZAG = tuple(_ZZ)

# Orthonormal 8-point DCT-II matrix T: spatial = T.T @ coef @ T.
_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _c = (1 / np.sqrt(2)) if _k == 0 else 1.0
        _T[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


class _BitReader:
    """MSB-first bit reader over an already byte-unstuffed entropy run."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            b = self.d[self.pos] if self.pos < len(self.d) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.n += 8
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v


def _build_huffman(bits_counts: list[int], symbols: bytes) -> dict:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bits(1)
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """JPEG magnitude decode: `size`-bit value -> signed amplitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _entropy_runs(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Split the entropy-coded segment starting at `pos` into
    byte-unstuffed runs separated by RST0-7 markers; returns (runs,
    position of the terminating non-RST marker's 0xFF)."""
    runs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        m = data[pos + 1] if pos + 1 < n else 0xD9
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            runs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # real marker: end of scan
            break
    runs.append(bytes(cur))
    return runs, pos


def decode_jpeg(content: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JPEG to (width, height, luma_bytes)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps = None  # list of (cid, h, v, tq)
    w = h = None
    restart_interval = 0
    scan = None
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                t = np.zeros((8, 8), dtype=np.int64)
                for k in range(64):
                    t[ZIGZAG[k]] = seg[p + k]
                qt[tq] = t
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                syms = seg[p + 17 : p + 17 + nsym]
                huff[(tc, th)] = _build_huffman(counts, syms)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential"
                " (SOF0) is inside the pure-Python boundary"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []  # (comp_index, dc_table_id, ac_table_id)
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(
                    j for j, c in enumerate(comps) if c[0] == cs
                )
                scan.append((ci, tda >> 4, tda & 0x0F))
            break  # entropy-coded data follows
        # else: APPn/COM/etc — skipped
    if comps is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    y_ci = scan[0][0]
    if comps[y_ci][1] != hmax or comps[y_ci][2] != vmax:
        raise NotImplementedError("subsampled luma component")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    runs, _ = _entropy_runs(content, pos)
    yh, yv = comps[y_ci][1], comps[y_ci][2]
    yplane = np.zeros((mcuy * yv * 8, mcux * yh * 8), dtype=np.float64)
    n_mcus = mcux * mcuy
    run_i = 0
    br = _BitReader(runs[0])
    pred = [0] * len(comps)
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            run_i += 1
            br = _BitReader(runs[run_i])
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, dc_id, ac_id in scan:
            _, ch, cv, ctq = comps[ci]
            dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
            for by in range(cv):
                for bx in range(ch):
                    coef = np.zeros((8, 8), dtype=np.int64)
                    size = _huff_decode(br, dct)
                    diff = _extend(br.bits(size), size)
                    pred[ci] += diff
                    coef[0, 0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(br, act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[ZIGZAG[k]] = _extend(br.bits(s), s)
                        k += 1
                    if ci != y_ci:
                        continue  # chroma: bitstream advanced, no IDCT
                    block = _T.T @ (coef * qt[ctq]) @ _T + 128.0
                    r0 = (my * cv + by) * 8
                    c0 = (mx * ch + bx) * 8
                    yplane[r0 : r0 + 8, c0 : c0 + 8] = block
    luma = np.clip(np.rint(yplane[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, luma.tobytes()


# --------------------------------------------------------------- encoder

# Flat canonical Huffman tables (see module docstring): every table is
# emitted in the file's DHT, so the decoder-side never assumes them.
_DC_SYMS = bytes(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 codes of length 4
_AC_SYMS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8  # 162 codes of length 8


def _enc_table(bits_counts: list[int], symbols: bytes) -> dict:
    """{symbol: (code, length)} from the canonical construction."""
    dec = _build_huffman(bits_counts, symbols)
    return {sym: (code, length) for (length, code), sym in dec.items()}


_DC_ENC = _enc_table(_DC_BITS, _DC_SYMS)
_AC_ENC = _enc_table(_AC_BITS, _AC_SYMS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bits padding per spec


def _size_cat(v: int) -> int:
    return abs(v).bit_length()


def _write_amplitude(bw: _BitWriter, v: int, size: int) -> None:
    if size == 0:
        return
    bw.write(v if v >= 0 else v + (1 << size) - 1, size)


def _encode_block(bw: _BitWriter, coef: np.ndarray, pred: int) -> int:
    dc = int(coef[0, 0])
    diff = dc - pred
    s = _size_cat(diff)
    bw.write(*_DC_ENC[s])
    _write_amplitude(bw, diff, s)
    zz = [int(coef[ZIGZAG[k]]) for k in range(64)]
    k, last = 1, 0
    for k in range(1, 64):
        if zz[k]:
            last = k
    run = 0
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bw.write(*_AC_ENC[0xF0])
            run -= 16
        s = _size_cat(v)
        bw.write(*_AC_ENC[(run << 4) | s])
        _write_amplitude(bw, v, s)
        run = 0
    if last < 63:
        bw.write(*_AC_ENC[0x00])  # EOB
    return dc


def _plane_from_lcg(w: int, h: int, seed: int) -> np.ndarray:
    from gtec_etl_spark.operators.multimodal import netpbm_values

    return np.array(netpbm_values(w, h, seed, 1, 255), dtype=np.float64).reshape(
        h, w
    )


def _quant_tables(q: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat tables: DC step q, AC step 2q. AC step >= 2 caps |AC/step|
    at 512, keeping every size category within the baseline limit of
    10 for arbitrary 8-bit blocks."""
    t = np.full((8, 8), 2 * q, dtype=np.int64)
    t[0, 0] = q
    return t, t.copy()


def fake_jpeg(
    width: int,
    height: int,
    seed: int,
    gray: bool = False,
    subsample: int = 1,
    q: int = 1,
    restart_interval: int = 0,
) -> bytes:
    """Deterministic REAL baseline JPEG from the shared LCG stream.
    gray=True emits a 1-component scan; otherwise 3 components with
    chroma at `subsample` in {1: 4:4:4, 2: 4:2:0}. The component planes
    ARE the LCG streams (no RGB->YCbCr step: the decoder only
    reconstructs Y, and random chroma planes still exercise the full
    entropy decode). q scales the flat quant table (q=1 keeps the
    roundtrip within DCT rounding of lossless)."""
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    ncomp = 1 if gray else 3
    hv = [(subsample, subsample) if i == 0 and ncomp > 1 else (1, 1)
          for i in range(ncomp)]
    if ncomp == 1:
        hv = [(1, 1)]
    hmax = max(a for a, _ in hv)
    vmax = max(b for _, b in hv)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    qtab, _ = _quant_tables(q)
    planes = []
    for i in range(ncomp):
        ch, cv = hv[i]
        cw = -(-width * ch // hmax)
        chh = -(-height * cv // vmax)
        p = _plane_from_lcg(cw, chh, seed + 101 * i)
        pw, ph = mcux * ch * 8, mcuy * cv * 8
        pad = np.zeros((ph, pw))
        pad[:chh, :cw] = p
        if cw < pw:
            pad[:chh, cw:] = p[:, -1:]
        if chh < ph:
            pad[chh:, :] = pad[chh - 1 : chh, :]
        planes.append(pad)

    bw = _BitWriter()
    pred = [0] * ncomp
    n_mcus = mcux * mcuy
    chunks: list[bytes] = []
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            chunks.append(bytes(bw.out))
            bw = _BitWriter()
            pred = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for i in range(ncomp):
            ch, cv = hv[i]
            for by in range(cv):
                for bx in range(ch):
                    r0 = (my * cv + by) * 8
                    c0 = (mx * ch + bx) * 8
                    block = planes[i][r0 : r0 + 8, c0 : c0 + 8] - 128.0
                    coef = np.rint((_T @ block @ _T.T) / qtab).astype(
                        np.int64
                    )
                    pred[i] = _encode_block(bw, coef, pred[i])
    bw.flush()
    chunks.append(bytes(bw.out))
    entropy = bytearray()
    for i, c in enumerate(chunks):
        entropy += c
        if i < len(chunks) - 1:
            entropy += bytes([0xFF, 0xD0 + (i % 8)])

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz_q = bytes(int(qtab[ZIGZAG[k]]) for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
