"""Pure-stdlib JPEG codec (numpy DCT + canonical Huffman):
baseline sequential (SOF0/1) AND progressive (SOF2).

JPEG is the dominant crawl-image format, and the round-3 multimodal stage
left it behind a PIL gate. This module removes the gate for Huffman-coded
JPEG — baseline sequential (the majority of web images) and, since round
5, progressive (the meaningful minority crawls also contain):

* **decoder** — full marker parse (DQT/DHT/SOF0/1/2/SOS/DRI), generic
  canonical-Huffman tables from any DHT, byte-unstuffing + restart
  markers, per-component MCU assembly with sampling factors up to 2x2
  (4:4:4 / 4:2:2 / 4:2:0 / grayscale), dequantize, orthonormal IDCT,
  BT.601 YCbCr->RGB. Progressive decoding implements the full T.81
  Annex G control flow — spectral selection, successive approximation
  (DC/AC first + refinement scans), EOB runs, interleaved DC /
  non-interleaved AC scans — accumulating coefficients across scans and
  reconstructing once at EOI. Arithmetic coding (vanishingly rare on
  the web) still raises ``NotImplementedError``.
* **encoders** — ``encode_jpeg`` (baseline, 4:4:4/grayscale, Annex-K
  tables scaled by ``quality``) and ``encode_jpeg_progressive`` (SOF2
  with a libjpeg-like script: interleaved DC first at Al=1, per-band
  AC first scans, DC refinement, AC refinement with real multi-block
  EOB runs). The progressive stream carries the SAME quantized
  coefficients as the baseline one, so decode(progressive) is asserted
  BIT-IDENTICAL to decode(baseline) in the tests — every progressive
  decode path is exercised exactly.

The JPEG FDCT is the orthonormal 8x8 DCT-II, computed as T @ B @ T.T —
bit-exact with the spec's definition; quantization is the only lossy step
this codec controls, so encode->decode error is bounded by the
quantization tables (asserted in tests against the analytic bound).

Throughput note (100 TB): this is a REFERENCE implementation — the
Huffman bit loop is Python. The multimodal operators accept
``decode_fn=`` so a libjpeg-turbo binding replaces this kernel
machine-for-machine when the environment has one; the Spark-side
plumbing (schema, mapInPandas batching, partitioning) is identical.

Reference parity: the reference engine has no image pipeline at all
(SURVEY.md §2: multimodal columns are a north-star extension).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

# ------------------------------------------------------------------ #
# shared constants
# ------------------------------------------------------------------ #
#: Annex K luminance / chrominance quantization tables (natural order)
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _zigzag_order() -> np.ndarray:
    """The 64-entry zigzag permutation, generated (not transcribed)."""
    idx = np.arange(64).reshape(8, 8)
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(idx[i, j] for i, j in diag)
    return np.array(order)


_ZIGZAG = _zigzag_order()          # natural index at each zigzag position
_UNZIGZAG = np.argsort(_ZIGZAG)    # zigzag position of each natural index


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: dct2(B) = T @ B @ T.T equals the JPEG
    FDCT definition exactly."""
    n = np.arange(8)
    T = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * n[None, :] + 1) * n[:, None] / 16.0)
    T[0, :] = 1.0 / np.sqrt(8.0)
    return T


_DCT = _dct_matrix()


def _scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# ------------------------------------------------------------------ #
# canonical Huffman
# ------------------------------------------------------------------ #
def _canonical_codes(bits: list, huffval: list) -> dict:
    """symbol -> (code, length) from a DHT BITS/HUFFVAL pair."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list, huffval: list) -> dict:
    """(length, code) -> symbol for the decoder."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, huffval).items()}


#: encoder tables — fixed-length canonical codes (legal, simple, verifiable):
#: DC: 12 categories at 4 bits; AC: all 162 run/size symbols at 9 bits
#: (no all-ones codeword in either, as the spec requires)
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_DC_VALS = list(range(12))
_AC_SYMBOLS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    # EOBRUN category symbols (r<<4, run = 2^r..2^(r+1)-1) — only the
    # progressive encoder emits them; harmless extras in baseline DHTs
    + [r << 4 for r in range(1, 15)]
)
_ENC_AC_BITS = [0] * 8 + [len(_AC_SYMBOLS)] + [0] * 7
_ENC_AC_VALS = list(_AC_SYMBOLS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers; RST
    markers reset bit alignment (the caller resets DC predictors)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        """Buffer up to ~25 bits; STOPS (never reads past) at any real
        marker so read-ahead can't swallow a restart boundary."""
        d = self.data
        while self.nbits < 25 and self.pos < len(d):
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt != 0x00:
                    break  # RST / EOI / next segment — stop AT the marker
                self.pos += 2  # stuffed 0xFF00 -> literal 0xFF
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        if self.nbits == 0:
            # sitting on a marker with no buffered bits left
            d = self.data
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if self.pos < len(d) and d[self.pos] == 0xFF and 0xD0 <= nxt <= 0xD7:
                raise _Restart()
            return 1  # spec pad bits past the end of the scan
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Drop pad bits, consume the RSTn marker, realign to byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos < len(d) and d[self.pos] != 0xFF:
            self.pos += 1  # lenient: skip nonstandard whole pad bytes
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
        if 0xD0 <= nxt <= 0xD7:
            self.pos += 2


class _Restart(Exception):
    pass


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(value: int, size: int) -> int:
    """JPEG EXTEND: map the raw ``size``-bit value to its signed coefficient."""
    if size == 0:
        return 0
    return value if value >= (1 << (size - 1)) else value - (1 << size) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ------------------------------------------------------------------ #
# encoder
# ------------------------------------------------------------------ #
def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """Baseline JPEG bytes from an (H, W, 3) RGB or (H, W[, 1]) gray uint8
    array; 4:4:4 sampling, Annex-K tables scaled by ``quality``."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("expected (H, W), (H, W, 1) or (H, W, 3) uint8")
    h, w, nch = a.shape
    gray = nch == 1
    a = a.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    q_luma = _scaled_qtable(_Q_LUMA, quality)
    q_chroma = _scaled_qtable(_Q_CHROMA, quality)
    qtabs = [q_luma] + ([q_chroma, q_chroma] if not gray else [])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in enumerate([q_luma] + ([q_chroma] if not gray else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(tbl.flat[i]) for i in _ZIGZAG)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    # DHT: same simple tables for luma and chroma slots
    for tc_th, bits, vals in [
        (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
        (0x01, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x11, _ENC_AC_BITS, _ENC_AC_VALS),
    ]:
        if gray and tc_th in (0x01, 0x11):
            continue
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    bw = _BitWriter()
    by, bx = (h + 7) // 8, (w + 7) // 8
    pred = [0] * ncomp
    for myy in range(by):
        for mxx in range(bx):
            for ci in range(ncomp):
                plane, q = planes[ci], qtabs[ci]
                blk = np.full((8, 8), 0.0)
                ys, xs = myy * 8, mxx * 8
                src = plane[ys : ys + 8, xs : xs + 8]
                # edge replication (standard practice for partial blocks)
                blk[: src.shape[0], : src.shape[1]] = src
                if src.shape[0] < 8:
                    blk[src.shape[0] :, :] = blk[src.shape[0] - 1, :]
                if src.shape[1] < 8:
                    blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
                coef = _DCT @ (blk - 128.0) @ _DCT.T
                qc = np.round(coef / q).astype(np.int64)
                zz = qc.flat[_ZIGZAG].copy()
                # baseline AC categories stop at 10 bits; only reachable at
                # quantizer 1 (quality ~100) on adversarial blocks
                np.clip(zz[1:], -1023, 1023, out=zz[1:])
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = _category(diff)
                code, length = dc_codes[size]
                bw.write(code, length)
                if size:
                    bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
                run = 0
                last_nz = max((i for i in range(1, 64) if zz[i] != 0), default=0)
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        c, l = ac_codes[0xF0]
                        bw.write(c, l)
                        run -= 16
                    size = _category(v)
                    c, l = ac_codes[(run << 4) | size]
                    bw.write(c, l)
                    bw.write(v if v >= 0 else v + (1 << size) - 1, size)
                    run = 0
                if last_nz < 63:
                    c, l = ac_codes[0x00]
                    bw.write(c, l)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------ #
# decoder
# ------------------------------------------------------------------ #
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline-sequential (SOF0/1) or progressive (SOF2) JPEG to
    (H, W, C) uint8 (C=1 gray, 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps = None
    h = w = 0
    restart_interval = 0
    progressive = False
    prog = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                n = 65 if pq == 0 else 129
                raw = body[p + 1 : p + n]
                vals = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                    if pq == 0
                    else np.frombuffer(raw, dtype=">u2").astype(np.int32)
                )
                tbl = np.empty(64, dtype=np.int32)
                tbl[_ZIGZAG] = vals
                qtables[tq] = tbl.reshape(8, 8)
                p += n
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1 or marker == 0xC2:
            # SOF0/1 (baseline/extended sequential) or SOF2 (progressive)
            progressive = marker == 0xC2
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: baseline (SOF0/1) and "
                "progressive (SOF2) Huffman coding supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            if not progressive:
                pos += seglen
                return _decode_scan(
                    data, pos, h, w, comps, scan, qtables, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog is None:
                prog = _ProgressiveState(h, w, comps)
            pos = prog.decode_sos(
                data, pos + seglen, scan, ss, se, ahal >> 4, ahal & 0x0F,
                huff_dc, huff_ac, restart_interval,
            )
            continue
        pos += seglen
    if prog is not None:
        return prog.reconstruct(qtables)
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(
    data, pos, h, w, comps, scan, qtables, huff_dc, huff_ac, restart_interval
):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise NotImplementedError("sampling factors beyond 2x2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {k: 0 for k in pred}
            mcu_count += 1
            for comp, td, ta in scan:
                dctab, actab = huff_dc[td], huff_ac[ta]
                q = qtables[comp["tq"]]
                for byy in range(comp["v"]):
                    for bxx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(reader, dctab)
                        diff = _extend(reader.read_bits(s), s)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, actab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coef = np.empty(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz
                        blk = _DCT.T @ (coef.reshape(8, 8) * q) @ _DCT + 128.0
                        py = (my * comp["v"] + byy) * 8
                        px = (mx * comp["h"] + bxx) * 8
                        planes[comp["id"]][py : py + 8, px : px + 8] = blk
    # upsample subsampled components (nearest) and crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ #
# progressive (SOF2) decoding — ITU T.81 Annex G successive
# approximation + spectral selection, the same control flow as the
# public-domain libjpeg decode_mcu_{DC,AC}_{first,refine} routines
# (re-derived from the spec; coefficient store in zigzag order)
# ------------------------------------------------------------------ #
class _ProgressiveState:
    """Per-image coefficient accumulator across progressive scans."""

    def __init__(self, h: int, w: int, comps: list):
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        for c in comps:
            if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
                raise NotImplementedError("sampling factors beyond 2x2 unsupported")
        self.mcux = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        #: comp id -> (block_rows, block_cols, 64) zigzag-order int32
        self.coef = {
            c["id"]: np.zeros(
                (self.mcuy * c["v"], self.mcux * c["h"], 64), dtype=np.int32
            )
            for c in comps
        }
        self.pred = {c["id"]: 0 for c in comps}

    def _comp_block_dims(self, c) -> tuple:
        """Non-interleaved scans cover ceil(comp_size/8) blocks — NOT the
        MCU-padded grid (T.81 A.2.2)."""
        cw = (self.w * c["h"] + self.hmax - 1) // self.hmax
        ch = (self.h * c["v"] + self.vmax - 1) // self.vmax
        return (ch + 7) // 8, (cw + 7) // 8

    def decode_sos(self, data, pos, scan, ss, se, ah, al, huff_dc, huff_ac,
                   restart_interval) -> int:
        reader = _BitReader(data, pos)
        self.eobrun = 0
        if ss == 0:
            self.pred = {c["id"]: 0 for c, _, _ in scan}
            self._dc_scan(reader, scan, ah, al, huff_dc, restart_interval)
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be single-component")
            self._ac_scan(reader, scan[0], ss, se, ah, al, huff_ac,
                          restart_interval)
        # position after consumed entropy (pad bits discarded); the outer
        # marker loop resynchronizes on the next 0xFF marker
        return reader.pos

    # ---------------- DC scans ---------------------------------------- #
    def _dc_block(self, reader, comp, td, row, col, ah, al, huff_dc):
        cz = self.coef[comp["id"]]
        if ah == 0:  # DC first
            s = _huff_decode(reader, huff_dc[td])
            diff = _extend(reader.read_bits(s), s)
            self.pred[comp["id"]] += diff
            cz[row, col, 0] = self.pred[comp["id"]] << al
        else:  # DC refine: one raw bit
            if reader.read_bit():
                cz[row, col, 0] = int(cz[row, col, 0]) | (1 << al)

    def _dc_scan(self, reader, scan, ah, al, huff_dc, restart_interval):
        if len(scan) == 1:
            # ns=1 is NON-interleaved (T.81 A.2.2): the scan covers the
            # component's own ceil(size/8) block grid, NOT the MCU-padded
            # one — walking the padded grid on a subsampled component
            # would desync the entropy stream
            comp, td, _ta = scan[0]
            nby, nbx = self._comp_block_dims(comp)
            blk = 0
            for row in range(nby):
                for col in range(nbx):
                    if restart_interval and blk and blk % restart_interval == 0:
                        reader.sync_restart()
                        self.pred = {k: 0 for k in self.pred}
                    blk += 1
                    self._dc_block(reader, comp, td, row, col, ah, al, huff_dc)
            return
        mcu_count = 0
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    reader.sync_restart()
                    self.pred = {k: 0 for k in self.pred}
                mcu_count += 1
                for comp, td, _ta in scan:
                    for byy in range(comp["v"]):
                        for bxx in range(comp["h"]):
                            self._dc_block(
                                reader, comp, td,
                                my * comp["v"] + byy, mx * comp["h"] + bxx,
                                ah, al, huff_dc,
                            )

    # ---------------- AC scans (non-interleaved) --------------------- #
    def _ac_scan(self, reader, one, ss, se, ah, al, huff_ac, restart_interval):
        comp, _td, ta = one
        actab = huff_ac[ta]
        cz = self.coef[comp["id"]]
        nby, nbx = self._comp_block_dims(comp)
        blk_count = 0
        for row in range(nby):
            for col in range(nbx):
                if restart_interval and blk_count and blk_count % restart_interval == 0:
                    reader.sync_restart()
                    self.eobrun = 0
                blk_count += 1
                zz = cz[row, col]
                if ah == 0:
                    self._ac_first(reader, zz, ss, se, al, actab)
                else:
                    self._ac_refine(reader, zz, ss, se, al, actab)

    def _ac_first(self, reader, zz, ss, se, al, actab):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _huff_decode(reader, actab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += reader.read_bits(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC coefficient index overflow (progressive)")
            zz[k] = _extend(reader.read_bits(s), s) << al
            k += 1

    def _ac_refine(self, reader, zz, ss, se, al, actab):
        p1, m1 = 1 << al, -(1 << al)
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = _huff_decode(reader, actab)
                r, s = rs >> 4, rs & 0x0F
                s_val = 0
                if s == 0:
                    if r != 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += reader.read_bits(r)
                        break  # rest of this block handled by the EOB tail
                    # ZRL: skip 16 zero-history positions below
                else:
                    s_val = p1 if reader.read_bit() else m1
                # advance over r zero-history positions, appending a
                # correction bit to every already-nonzero coefficient passed
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and (int(zz[k]) & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s_val and k <= se:
                    zz[k] = s_val
                k += 1
        if self.eobrun > 0:
            # end-of-band: correction bits for the remaining already-nonzero
            # coefficients of THIS block, then count it against the run
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else m1
                k += 1
            self.eobrun -= 1

    # ---------------- final reconstruction --------------------------- #
    def reconstruct(self, qtables) -> np.ndarray:
        planes = {}
        for c in self.comps:
            cz = self.coef[c["id"]].astype(np.float64)
            nby, nbx = cz.shape[0], cz.shape[1]
            nat = np.zeros_like(cz)
            nat[:, :, _ZIGZAG] = cz
            q = qtables[c["tq"]].astype(np.float64)
            deq = nat.reshape(nby, nbx, 8, 8) * q
            # batched orthonormal IDCT: T.T @ B @ T per block
            blocks = np.einsum("ij,rcjk,kl->rcil", _DCT.T, deq, _DCT) + 128.0
            plane = blocks.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
            planes[c["id"]] = plane
        full = []
        for c in self.comps:
            p = planes[c["id"]]
            ry, rx = self.vmax // c["v"], self.hmax // c["h"]
            if ry > 1 or rx > 1:
                p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
            full.append(p[: self.h, : self.w])
        if len(full) == 1:
            out = full[0][:, :, None]
        else:
            y, cb, cr = full
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            out = np.stack([r, g, b], axis=2)
        return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ #
# progressive (SOF2) encoder — spectral selection + one level of
# successive approximation (Al=1 first scans + Ah=1,Al=0 refinements),
# 4:4:4/grayscale like the baseline encoder. Produces a legal SOF2
# stream exercising every progressive decode path (DC first/refine,
# AC first/refine, EOB runs via per-block EOB, band splits); used by
# the roundtrip tests, and a legitimate emitter in its own right.
# ------------------------------------------------------------------ #
def _quantized_blocks(planes, qtabs):
    """Per-component (nby, nbx, 64) zigzag-order quantized coefficients
    (same FDCT/quantize as the baseline encoder, edge replication)."""
    out = []
    for plane, q in zip(planes, qtabs):
        h, w = plane.shape
        nby, nbx = (h + 7) // 8, (w + 7) // 8
        cz = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                blk = np.empty((8, 8))
                src = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                blk[: src.shape[0], : src.shape[1]] = src
                if src.shape[0] < 8:
                    blk[src.shape[0] :, :] = blk[src.shape[0] - 1, :]
                if src.shape[1] < 8:
                    blk[:, src.shape[1] :] = blk[:, src.shape[1] - 1 : src.shape[1]]
                coef = _DCT @ (blk - 128.0) @ _DCT.T
                qc = np.round(coef / q).astype(np.int64)
                zz = qc.flat[_ZIGZAG].copy()
                np.clip(zz[1:], -1023, 1023, out=zz[1:])
                cz[by, bx] = zz
        out.append(cz)
    return out


class _EobrunWriter:
    """Accumulates consecutive end-of-band occurrences into one EOBRUN
    symbol (category r, run = 2^r + r-extra-bits), with the covered
    blocks' buffered correction bits appended after it — the emit-side
    mirror of the decoder's eobrun tail."""

    def __init__(self, bw: _BitWriter, ac_codes: dict):
        self.bw, self.ac = bw, ac_codes
        self.run = 0
        self.bits: list = []

    def add_eob(self, tail_bits: list) -> None:
        self.bits.extend(tail_bits)
        self.run += 1
        if self.run == 0x7FFF:  # spec maximum (category 14)
            self.flush()

    def flush(self) -> None:
        if self.run == 0:
            return
        r = self.run.bit_length() - 1
        c, l = self.ac[r << 4]
        self.bw.write(c, l)
        if r:
            self.bw.write(self.run - (1 << r), r)
        for b in self.bits:
            self.bw.write(b, 1)
        self.run = 0
        self.bits = []


def _sos_header(comps_idx, ncomp, ss, se, ah, al, interleaved_ids=None) -> bytes:
    if interleaved_ids is not None:
        body = bytes([len(interleaved_ids)])
        for cid in interleaved_ids:
            td_ta = 0x00 if cid == 1 else 0x11
            body += bytes([cid, td_ta])
    else:
        cid = comps_idx + 1
        td_ta = 0x00 if cid == 1 else 0x11
        body = bytes([1, cid, td_ta])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85) -> bytes:
    a = np.asarray(img)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("expected (H, W), (H, W, 1) or (H, W, 3) uint8")
    h, w, nch = a.shape
    gray = nch == 1
    a = a.astype(np.float64)
    if gray:
        planes = [a[:, :, 0]]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    q_luma = _scaled_qtable(_Q_LUMA, quality)
    q_chroma = _scaled_qtable(_Q_CHROMA, quality)
    qtabs = [q_luma] + ([q_chroma, q_chroma] if not gray else [])
    ncomp = len(planes)
    czs = _quantized_blocks(planes, qtabs)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in enumerate([q_luma] + ([q_chroma] if not gray else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(tbl.flat[i]) for i in _ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        out += struct.pack("BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    for tc_th, bits, vals in [
        (0x00, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x10, _ENC_AC_BITS, _ENC_AC_VALS),
        (0x01, _ENC_DC_BITS, _ENC_DC_VALS),
        (0x11, _ENC_AC_BITS, _ENC_AC_VALS),
    ]:
        if gray and tc_th in (0x01, 0x11):
            continue
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)

    dc_codes = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_codes = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)
    ids = list(range(1, ncomp + 1))

    # scan 1: DC first, interleaved, Al=1 (point transform = arithmetic
    # shift, floor division semantics — matches the decoder's << 1 | bit)
    out += _sos_header(None, ncomp, 0, 0, 0, 1, interleaved_ids=ids)
    bw = _BitWriter()
    nby, nbx = czs[0].shape[0], czs[0].shape[1]
    pred = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                v = int(czs[ci][by, bx, 0]) >> 1
                diff = v - pred[ci]
                pred[ci] = v
                size = _category(diff)
                code, length = dc_codes[size]
                bw.write(code, length)
                if size:
                    bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    out += bw.flush()

    # scans 2..: AC first per component, Al=1, two bands for luma.
    # End-of-band conditions accumulate into real multi-block EOB RUNS
    # (flushed before the next block that carries symbols) — the shape
    # libjpeg emits and the decoder's EOBRUN path expects.
    bands = [(0, 1, 5), (0, 6, 63)] + [(ci, 1, 63) for ci in range(1, ncomp)]
    for ci, ss, se in bands:
        out += _sos_header(ci, ncomp, ss, se, 0, 1)
        bw = _BitWriter()
        ew = _EobrunWriter(bw, ac_codes)
        cz = czs[ci]
        for by in range(cz.shape[0]):
            for bx in range(cz.shape[1]):
                zz = cz[by, bx]
                last = max(
                    (k for k in range(ss, se + 1) if abs(int(zz[k])) >> 1),
                    default=None,
                )
                if last is None:
                    ew.add_eob([])
                    continue
                ew.flush()
                run = 0
                for k in range(ss, last + 1):
                    t = abs(int(zz[k])) >> 1
                    if t == 0:
                        run += 1
                        continue
                    while run >= 16:
                        c, l = ac_codes[0xF0]
                        bw.write(c, l)
                        run -= 16
                    size = _category(t)
                    sv = t if zz[k] > 0 else -t
                    c, l = ac_codes[(run << 4) | size]
                    bw.write(c, l)
                    bw.write(sv if sv >= 0 else sv + (1 << size) - 1, size)
                    run = 0
                if last < se:
                    ew.add_eob([])
        ew.flush()
        out += bw.flush()

    # scan: DC refine, interleaved, Ah=1 Al=0 — one raw bit per block
    out += _sos_header(None, ncomp, 0, 0, 1, 0, interleaved_ids=ids)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                bw.write(int(czs[ci][by, bx, 0]) & 1, 1)
    out += bw.flush()

    # refinement AC scans: Ah=1 -> Al=0 over the same bands. Blocks with
    # no newly-significant coefficient defer entirely into the EOB run
    # (their band's correction bits ride as the run's buffered bits, in
    # block order — exactly what the decoder's eobrun tail consumes);
    # a block's post-last-symbol tail joins the run the same way.
    for ci, ss, se in bands:
        out += _sos_header(ci, ncomp, ss, se, 1, 0)
        bw = _BitWriter()
        ew = _EobrunWriter(bw, ac_codes)
        cz = czs[ci]
        for by in range(cz.shape[0]):
            for bx in range(cz.shape[1]):
                zz = cz[by, bx]
                newly = [
                    k for k in range(ss, se + 1) if abs(int(zz[k])) == 1
                ]
                if not newly:
                    ew.add_eob(
                        [int(zz[k]) & 1 for k in range(ss, se + 1) if zz[k] != 0]
                    )
                    continue
                ew.flush()
                run = 0
                pending = []  # correction bits awaiting the next symbol
                last_sym = newly[-1]
                for k in range(ss, last_sym + 1):
                    t = abs(int(zz[k]))
                    if t == 0:
                        run += 1
                        continue
                    # ZRLs must be emitted the moment the zero run exceeds
                    # 15 at ANY nonzero coefficient — BEFORE buffering a
                    # correction bit — because the decoder's ZRL pass
                    # consumes exactly 16 zero-history positions and reads
                    # the correction bits of nonzeros it passes over; a
                    # later-flushed ZRL would misorder those bits
                    # (libjpeg's `while (r > 15 && k <= EOB)` placement)
                    while run >= 16:
                        c, l = ac_codes[0xF0]
                        bw.write(c, l)
                        for bit in pending:
                            bw.write(bit, 1)
                        pending.clear()
                        run -= 16
                    if t > 1:  # already significant: correction bit
                        pending.append(t & 1)
                        continue
                    # newly significant (|coef| == 1 at this precision)
                    c, l = ac_codes[(run << 4) | 1]
                    bw.write(c, l)
                    bw.write(1 if zz[k] > 0 else 0, 1)
                    for bit in pending:
                        bw.write(bit, 1)
                    pending.clear()
                    run = 0
                if last_sym < se:
                    tail = [
                        int(zz[k]) & 1
                        for k in range(last_sym + 1, se + 1)
                        if zz[k] != 0
                    ]
                    ew.add_eob(tail)
        ew.flush()
        out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)
