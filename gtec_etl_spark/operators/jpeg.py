"""JPEG decode — baseline (SOF0, closed round 8) AND progressive
(SOF2, closed round 9), dependency-free pure numpy/stdlib like the
netpbm/PNG/WAV codecs before it: segment parser (APPn/DQT/DHT/SOF/DRI/
SOS), byte-unstuffed entropy runs split at restart markers, canonical
Huffman decode from the file's own DHT tables, DC-predictor +
run-length AC block decode (baseline) or multi-scan coefficient
accumulation with spectral selection, successive approximation, EOB
runs, and correction bits (progressive — the spec G.1.2 machinery),
dequant, de-zigzag, float64 orthonormal IDCT, and luma (Y-plane)
output — the mm_* pipeline collapses every raster to 8-bit luma, so
chroma blocks are entropy-decoded (they must be, to advance the
bitstream) but not reconstructed.

Boundary (NotImplementedError, same discipline as the PNG frontier):
arithmetic coding, hierarchical/lossless SOF variants, and a
subsampled LUMA component (hY < hmax — never produced
by real encoders, which only subsample chroma).

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
    prec = 8
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
            if prec not in (8, 12):
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
        elif marker == 0xC2:  # progressive: restart with the SOF2 decoder
            return _decode_progressive(content)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential"
                " (SOF0) and progressive (SOF2) are inside the"
                " pure-Python boundary"
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
                    block = _T.T @ (coef * qt[ctq]) @ _T + float(1 << (prec - 1))
                    r0 = (my * cv + by) * 8
                    c0 = (mx * ch + bx) * 8
                    yplane[r0 : r0 + 8, c0 : c0 + 8] = block
    full = np.clip(np.rint(yplane[:h, :w]), 0, (1 << prec) - 1).astype(np.int64)
    luma = (full >> (prec - 8)).astype(np.uint8)
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

# 12-bit tables: DC diff categories reach 15 (|DC| <= 8*2048 after the
# 2048 level shift, so diffs span +-32760 < 2^15) and AC size categories
# reach 14 per spec Table F.2 — 16 DC codes at length 5, 226 AC codes at
# length 8 (both leave the all-ones code unused: valid canonical sets).
_DC12_SYMS = bytes(range(16))
_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11
_AC12_SYMS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | sz for r in range(16) for sz in range(1, 15)]
)
_AC12_BITS = [0] * 7 + [len(_AC12_SYMS)] + [0] * 8
_DC12_ENC = _enc_table(_DC12_BITS, _DC12_SYMS)
_AC12_ENC = _enc_table(_AC12_BITS, _AC12_SYMS)


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


def _encode_block(
    bw: _BitWriter, coef: np.ndarray, pred: int, dc_enc=None, ac_enc=None
) -> int:
    dc_enc = dc_enc or _DC_ENC
    ac_enc = ac_enc or _AC_ENC
    dc = int(coef[0, 0])
    diff = dc - pred
    s = _size_cat(diff)
    bw.write(*dc_enc[s])
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
            bw.write(*ac_enc[0xF0])
            run -= 16
        s = _size_cat(v)
        bw.write(*ac_enc[(run << 4) | s])
        _write_amplitude(bw, v, s)
        run = 0
    if last < 63:
        bw.write(*ac_enc[0x00])  # EOB
    return dc


def _plane_from_lcg(w: int, h: int, seed: int, maxval: int = 255) -> np.ndarray:
    from gtec_etl_spark.operators.multimodal import netpbm_values

    return np.array(
        netpbm_values(w, h, seed, 1, maxval), dtype=np.float64
    ).reshape(h, w)


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
    precision: int = 8,
    maxval: int | None = None,
) -> bytes:
    """Deterministic REAL baseline JPEG from the shared LCG stream.
    gray=True emits a 1-component scan; otherwise 3 components with
    chroma at `subsample` in {1: 4:4:4, 2: 4:2:0}. The component planes
    ARE the LCG streams (no RGB->YCbCr step: the decoder only
    reconstructs Y, and random chroma planes still exercise the full
    entropy decode). q scales the flat quant table (q=1 keeps the
    roundtrip within DCT rounding of lossless). maxval bounds the LCG
    plane's value range (x % (maxval+1)) — scene-structured video
    fixtures use it to give scenes distinct luma DISTRIBUTIONS, which a
    histogram shot detector can see (two full-range noise planes have
    near-identical histograms)."""
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if maxval is None:
        maxval = (1 << precision) - 1
    elif not (0 < maxval < (1 << precision)):
        raise ValueError(f"maxval {maxval} out of range for {precision}-bit")
    shift = float(1 << (precision - 1))
    dc_enc = _DC12_ENC if precision == 12 else _DC_ENC
    ac_enc = _AC12_ENC if precision == 12 else _AC_ENC
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
        p = _plane_from_lcg(cw, chh, seed + 101 * i, maxval)
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
                    block = planes[i][r0 : r0 + 8, c0 : c0 + 8] - shift
                    coef = np.rint((_T @ block @ _T.T) / qtab).astype(
                        np.int64
                    )
                    pred[i] = _encode_block(bw, coef, pred[i], dc_enc, ac_enc)
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
    sof = bytes([precision]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], 0])
    out += seg(0xC0, sof)
    if precision == 12:
        out += seg(0xC4, bytes([0x00]) + bytes(_DC12_BITS) + _DC12_SYMS)
        out += seg(0xC4, bytes([0x10]) + bytes(_AC12_BITS) + _AC12_SYMS)
    else:
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


# --------------------------------------------------- progressive (SOF2)

def _decode_progressive(content: bytes) -> tuple[int, int, bytes]:
    """Progressive JPEG (SOF2) decode to (width, height, luma_bytes).

    Full spectral selection + successive approximation (spec G.1.2 /
    the jd-phuff algorithm family, reimplemented): per-scan coefficient
    accumulation into zigzag-order block arrays — DC first scans write
    the point-transformed prediction chain (value << Al), DC refinement
    ORs in one bit per block, AC first scans decode band runs with
    EOB-run skipping, AC refinement walks zero-history runs emitting
    correction bits for already-nonzero coefficients — then one shared
    dequant + IDCT pass identical to baseline. Only the luma component
    is reconstructed (chroma scans still advance the bitstream)."""
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    w = h = None
    prec = 8
    restart_interval = 0
    n = len(content)
    n_scans = 0
    coefs: list[np.ndarray] = []  # per comp: (bh_pad, bw_pad, 64) zz-order
    geom: list[tuple[int, int, int, int]] = []  # (bw, bh, bw_pad, bh_pad)
    hmax = vmax = mcux = mcuy = None

    while pos + 2 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = content[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise ValueError("truncated JPEG segment header")
        seg_len = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        seg = content[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:
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
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                huff[(tc, th)] = _build_huffman(counts, seg[p + 17 : p + 17 + nsym])
                p += 17 + nsym
        elif marker == 0xC2:
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec not in (8, 12):
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for _, ch, cv, _tq in comps:
                cw = -(-w * ch // hmax)
                chh = -(-h * cv // vmax)
                bw_, bh_ = -(-cw // 8), -(-chh // 8)
                bw_pad, bh_pad = mcux * ch, mcuy * cv
                geom.append((bw_, bh_, bw_pad, bh_pad))
                coefs.append(np.zeros((bh_pad, bw_pad, 64), dtype=np.int64))
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("JPEG SOS before SOF2")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i], seg[2 + 2 * i]
                ci = next(j for j, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tda >> 4, tda & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            runs, pos = _entropy_runs(content, pos)
            n_scans += 1
            _progressive_scan(
                runs, scan, ss, se, ah, al, coefs, comps, geom,
                (mcux, mcuy), huff, restart_interval,
            )
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} inside a progressive stream"
            )
        # else APPn/COM skipped
    if comps is None or not coefs or n_scans == 0:
        raise ValueError("JPEG missing SOF2/SOS")
    y_ci = 0  # luma = first SOF2 component by convention
    if comps[y_ci][3] not in qt:
        raise ValueError("JPEG missing DQT for the luma component")
    if comps[y_ci][1] != hmax or comps[y_ci][2] != vmax:
        raise NotImplementedError("subsampled luma component")
    bw_, bh_, bw_pad, _bh_pad = geom[y_ci]
    qtab = qt[comps[y_ci][3]]
    yplane = np.zeros((bh_ * 8, bw_ * 8), dtype=np.float64)
    zz_rows = np.array([r for r, _ in ZIGZAG])
    zz_cols = np.array([c for _, c in ZIGZAG])
    for by in range(bh_):
        for bx in range(bw_):
            coef = np.zeros((8, 8), dtype=np.int64)
            coef[zz_rows, zz_cols] = coefs[y_ci][by, bx]
            yplane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _T.T @ (coef * qtab) @ _T + float(1 << (prec - 1))
            )
    full = np.clip(np.rint(yplane[:h, :w]), 0, (1 << prec) - 1).astype(np.int64)
    luma = (full >> (prec - 8)).astype(np.uint8)
    return w, h, luma.tobytes()


def _progressive_scan(
    runs, scan, ss, se, ah, al, coefs, comps, geom, mcu_dims, huff,
    restart_interval,
):
    """Decode one progressive scan's entropy data into the coefficient
    arrays. Restart markers (run boundaries) reset DC predictors and the
    EOB run, mirroring the baseline decoder's per-run reset."""
    mcux, mcuy = mcu_dims
    interleaved = len(scan) > 1
    if ss > 0 and interleaved:
        raise ValueError("progressive AC scan must be single-component")
    run_i = 0
    br = _BitReader(runs[0])
    state = {"eobrun": 0, "pred": [0] * len(comps)}

    def maybe_restart(unit_idx: int) -> None:
        nonlocal br, run_i
        if restart_interval and unit_idx and unit_idx % restart_interval == 0:
            run_i += 1
            br = _BitReader(runs[run_i])
            state["eobrun"] = 0
            state["pred"] = [0] * len(comps)

    def dc_unit(ci: int, dc_id: int, row: int, col: int) -> None:
        blk = coefs[ci][row, col]
        if ah == 0:
            size = _huff_decode(br, huff[(0, dc_id)])
            diff = _extend(br.bits(size), size)
            state["pred"][ci] += diff
            blk[0] = state["pred"][ci] << al
        else:
            if br.bits(1):
                blk[0] |= 1 << al

    if ss == 0:  # DC scan (first or refinement)
        if interleaved:  # MCU order, ch x cv blocks per component
            for mcu in range(mcux * mcuy):
                maybe_restart(mcu)
                my, mx = divmod(mcu, mcux)
                for ci, dc_id, _ac_id in scan:
                    _, ch, cv, _tq = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            dc_unit(ci, dc_id, my * cv + by, mx * ch + bx)
        else:  # raster over the component's own block grid
            ci, dc_id, _ac_id = scan[0]
            bw_, bh_, _, _ = geom[ci]
            for bi in range(bh_ * bw_):
                maybe_restart(bi)
                dc_unit(ci, dc_id, bi // bw_, bi % bw_)
        return

    # AC scan: single component, raster order over its true block grid.
    ci, _dc_id, ac_id = scan[0]
    bw_, bh_, _bw_pad, _bh_pad = geom[ci]
    act = huff.get((1, ac_id))
    p1 = 1 << al
    m1 = -p1
    blocks = (coefs[ci][by, bx] for by in range(bh_) for bx in range(bw_))
    for bi, blk in enumerate(blocks):
        maybe_restart(bi)
        if ah == 0:  # AC first scan for this band
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(br, act)
                r, s = rs >> 4, rs & 0x0F
                if s:
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC band overflow")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        state["eobrun"] = eobrun - 1
                        break
                    k += 16  # ZRL
        else:  # AC refinement
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    rs = _huff_decode(br, act)
                    r, s = rs >> 4, rs & 0x0F
                    if s:
                        if s != 1:
                            raise ValueError("bad refinement size category")
                        newval = p1 if br.bits(1) else m1
                    else:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += br.bits(r)
                            state["eobrun"] = eobrun
                            break
                        newval = 0  # ZRL: skip 16 zero-history coefficients
                    # advance over r zero-history positions, emitting
                    # correction bits for nonzero-history ones passed
                    while k <= se:
                        if blk[k] != 0:
                            if br.bits(1) and (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if newval:
                        blk[k] = newval
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if blk[k] != 0:
                        if br.bits(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                state["eobrun"] -= 1


# ------------------------------------------------ progressive encoder

# Progressive AC table: EOB-run symbols (r<<4 | 0, r 0..14), ZRL (0xF0),
# and (r<<4 | s) for s 1..10 — 175 codes at length 8 (all-ones unused, a
# valid canonical prefix set like the baseline tables).
_PAC_SYMS = bytes(
    [(r << 4) for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PAC_BITS = [0] * 7 + [len(_PAC_SYMS)] + [0] * 8
_PAC_ENC = _enc_table(_PAC_BITS, _PAC_SYMS)


class _ProgACWriter:
    """AC band writer shared by first and refinement scans: EOB runs
    accumulate across blocks; refinement correction bits buffer until the
    symbol they ride behind (the jc-phuff emission discipline)."""

    def __init__(self, bw: _BitWriter):
        self.bw = bw
        self.eobrun = 0
        self.pending: list[int] = []  # buffered correction bits

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.bw.write(*_PAC_ENC[r << 4])
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def first_block(self, band: list[int], al: int) -> None:
        """AC first scan (Ah=0): encode sign*(|v|>>Al) run-lengths."""
        vals = [
            (abs(v) >> al) * (1 if v >= 0 else -1) for v in band
        ]
        last = -1
        for i, v in enumerate(vals):
            if v:
                last = i
        if last < 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()
            return
        self.flush_eobrun()
        r = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                r += 1
                continue
            while r > 15:
                self.bw.write(*_PAC_ENC[0xF0])
                r -= 16
            s = _size_cat(v)
            self.bw.write(*_PAC_ENC[(r << 4) | s])
            _write_amplitude(self.bw, v, s)
            r = 0
        if last < len(vals) - 1:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def refine_block(self, band: list[int], al: int) -> None:
        """AC refinement scan (Ah=Al+1): newly-significant coefficients
        emit (run, 1)+sign over ZERO-history positions; already-nonzero
        positions ride as buffered correction bits."""
        absv = [abs(v) >> al for v in band]
        eob = -1
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        r = 0
        buffered: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.flush_eobrun()
                self.bw.write(*_PAC_ENC[0xF0])
                r -= 16
                for b in buffered:
                    self.bw.write(b, 1)
                buffered = []
            if a > 1:
                buffered.append(a & 1)
                continue
            # newly significant (|v|>>Al == 1)
            self.flush_eobrun()
            self.bw.write(*_PAC_ENC[(r << 4) | 1])
            self.bw.write(1 if band[i] >= 0 else 0, 1)
            for b in buffered:
                self.bw.write(b, 1)
            buffered = []
            r = 0
        if r > 0 or buffered:
            self.eobrun += 1
            self.pending.extend(buffered)
            if self.eobrun == 0x7FFF or len(self.pending) > 930:
                self.flush_eobrun()


def fake_jpeg_progressive(
    width: int,
    height: int,
    seed: int,
    gray: bool = False,
    subsample: int = 1,
    q: int = 1,
) -> bytes:
    """Deterministic REAL progressive (SOF2) JPEG from the same LCG
    planes, quant tables, and DC Huffman table as fake_jpeg — only the
    scan structure differs: an interleaved DC first scan at Al=1, two
    spectral-selection AC bands (1-5, 6-63) per component at Al=1, a DC
    refinement scan, then the matching AC refinement bands — the
    libjpeg-style scan script exercising spectral selection AND
    successive approximation in both directions."""
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

    # Quantized zz-order coefficient grids per component (MCU-padded).
    grids = []
    dims = []  # (bw true, bh true, bw_pad, bh_pad)
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
        bw_pad, bh_pad = mcux * ch, mcuy * cv
        g = np.zeros((bh_pad, bw_pad, 64), dtype=np.int64)
        zz_rows = np.array([r for r, _ in ZIGZAG])
        zz_cols = np.array([c for _, c in ZIGZAG])
        for by in range(bh_pad):
            for bx in range(bw_pad):
                block = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = np.rint((_T @ block @ _T.T) / qtab).astype(np.int64)
                g[by, bx] = coef[zz_rows, zz_cols]
        grids.append(g)
        dims.append((-(-cw // 8), -(-chh // 8), bw_pad, bh_pad))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def sos_header(comp_ids: list[int], tds: int, tas: int,
                   ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, (tds << 4) | tas])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def dc_scan(al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        pred = [0] * ncomp
        for mcu in range(mcux * mcuy):
            my, mx = divmod(mcu, mcux)
            for i in range(ncomp):
                ch, cv = hv[i]
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(grids[i][my * cv + by, mx * ch + bx, 0])
                        if refine:
                            bw.write((dc >> al) & 1, 1)
                        else:
                            t = dc >> al  # DC point transform: arith shift
                            diff = t - pred[i]
                            pred[i] = t
                            s = _size_cat(diff)
                            bw.write(*_DC_ENC[s])
                            _write_amplitude(bw, diff, s)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci: int, ss: int, se: int, al: int, refine: bool) -> bytes:
        bw = _BitWriter()
        wtr = _ProgACWriter(bw)
        bw_true, bh_true, _, _ = dims[ci]
        for by in range(bh_true):
            for bx in range(bw_true):
                band = [int(v) for v in grids[ci][by, bx, ss : se + 1]]
                if refine:
                    wtr.refine_block(band, al)
                else:
                    wtr.first_block(band, al)
        wtr.flush_eobrun()
        bw.flush()
        return bytes(bw.out)

    zz_q = bytes(int(qtab[ZIGZAG[k]]) for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + zz_q)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, (hv[i][0] << 4) | hv[i][1], 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + _DC_SYMS)
    out += seg(0xC4, bytes([0x10]) + bytes(_PAC_BITS) + _PAC_SYMS)

    all_ids = [i + 1 for i in range(ncomp)]
    out += sos_header(all_ids, 0, 0, 0, 0, 0, 1) + dc_scan(1, False)
    for i in range(ncomp):
        out += sos_header([i + 1], 0, 0, 1, 5, 0, 1) + ac_scan(i, 1, 5, 1, False)
    for i in range(ncomp):
        out += sos_header([i + 1], 0, 0, 6, 63, 0, 1) + ac_scan(i, 6, 63, 1, False)
    out += sos_header(all_ids, 0, 0, 0, 0, 1, 0) + dc_scan(0, True)
    for i in range(ncomp):
        out += sos_header([i + 1], 0, 0, 1, 5, 1, 0) + ac_scan(i, 1, 5, 0, True)
    for i in range(ncomp):
        out += sos_header([i + 1], 0, 0, 6, 63, 1, 0) + ac_scan(i, 6, 63, 0, True)
    out += b"\xff\xd9"
    return bytes(out)
