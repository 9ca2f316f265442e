"""Pure-stdlib baseline JPEG codec (numpy DCT + canonical Huffman).

JPEG is the dominant crawl-image format, and the round-3 multimodal stage
left it behind a PIL gate. This module removes the gate for BASELINE
sequential JPEG (SOF0 — the overwhelming majority of web images):

* **decoder** — full marker parse (DQT/DHT/SOF0/SOS/DRI), generic
  canonical-Huffman tables from any DHT, byte-unstuffing + restart
  markers, per-component MCU assembly with sampling factors up to 2x2
  (4:4:4 / 4:2:2 / 4:2:0 / grayscale), dequantize, orthonormal IDCT,
  BT.601 YCbCr->RGB. Progressive (SOF2) and arithmetic coding raise
  ``NotImplementedError`` — they genuinely need a codec library.
* **encoder** — 4:4:4 (or grayscale) baseline with Annex-K quantization
  tables scaled by ``quality`` and simple fixed-length canonical Huffman
  tables (legal JPEG: the tables travel in DHT; files are a little larger
  than libjpeg's, which is irrelevant for fixtures/tests).

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

__all__ = ["decode_jpeg", "encode_jpeg"]

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
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
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
    """Decode baseline sequential JPEG to (H, W, C) uint8 (C=1 gray, 3 RGB)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps = None
    h = w = 0
    restart_interval = 0
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/extended seq)
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential (SOF0/1) supported"
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
            pos += seglen
            return _decode_scan(
                data, pos, h, w, comps, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
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
