"""Pure-stdlib image codecs: PNG / PPM / PGM / BMP decode+encode, numpy resize.

The container has no PIL/opencv, but the lossless container formats need
nothing beyond ``zlib`` and ``struct``: PNG is zlib-deflated filtered
scanlines, PPM/PGM are headers + raw bytes, BMP is a fixed header + padded
BGR rows. Implementing them here turns the multimodal decode stage
(operators/multimodal.py) from an environment-gated stub into a REAL
decoder for every uncompressed/lossless payload; only DCT-family formats
(JPEG &c.) remain behind the library gate.

Scope kept to the common interchange subset (same trade as the stdlib-only
XLSX reader in sources/formats.py):
  * PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA); all five filter types; no interlace, no palette;
  * PPM/PGM: binary (P6/P5), maxval <= 255;
  * BMP: BITMAPINFOHEADER, 24-bit uncompressed, bottom-up or top-down.

Everything returns/accepts ``np.ndarray`` of shape (H, W, C) uint8
(C=1 gray, 2 gray+alpha, 3 RGB, 4 RGBA).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_image",
    "decode_png",
    "encode_png",
    "decode_ppm",
    "encode_ppm",
    "decode_bmp",
    "encode_bmp",
    "resize_nearest",
    "sniff_format",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(data: bytes) -> str:
    """Magic-byte format detection:
    'png' | 'jpeg' | 'ppm' | 'pgm' | 'bmp' | 'unknown'."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes; raises NotImplementedError for formats that
    genuinely need a codec library (WEBP/AVIF/...)."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        from linkml_store_spark.functions.jpegcodec import decode_jpeg

        return decode_jpeg(data)
    if fmt in ("ppm", "pgm"):
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "gif":
        from linkml_store_spark.functions.gifcodec import decode_gif

        return decode_gif(data)
    raise NotImplementedError(
        "payload is not a PNG/JPEG/GIF/PPM/PGM/BMP; other formats "
        "(WEBP/...) need an image library — pass decode_fn=..."
    )


# ------------------------------------------------------------------ #
# PNG
# ------------------------------------------------------------------ #
def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
            if color not in _CHANNELS:
                raise NotImplementedError(f"PNG color type {color} (palette unsupported)")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(height, width, channels)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal encoder: filter type 0 on every scanline (valid PNG; larger
    than optimal — fine for fixtures/sinks)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------ #
# PPM / PGM (binary)
# ------------------------------------------------------------------ #
def decode_ppm(data: bytes) -> np.ndarray:
    magic = data[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    c = 3 if magic == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=pos)
    return px.reshape(h, w, c).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 3:
        return b"P6 %d %d 255\n" % (w, h) + arr.tobytes()
    if c == 1:
        return b"P5 %d %d 255\n" % (w, h) + arr.tobytes()
    raise ValueError("PPM supports 1 or 3 channels")


# ------------------------------------------------------------------ #
# BMP (24-bit uncompressed)
# ------------------------------------------------------------------ #
def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant unsupported")
    w, h_signed = struct.unpack("<ii", data[18:26])
    bpp, comp = struct.unpack("<HI", data[28:34])
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP {bpp}bpp/compression={comp} unsupported")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("BMP encoder expects 3 channels")
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    body = bytearray()
    bgr = arr[:, :, ::-1]
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    off = 14 + 40
    file_size = off + len(body)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(body)


# ------------------------------------------------------------------ #
# resize
# ------------------------------------------------------------------ #
def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via index sampling — pure numpy, exact and
    deterministic (pixel-center convention)."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return arr[ys][:, xs]


# ------------------------------------------------------------------ #
# audio: WAV (RIFF PCM) — same no-dependency trade as the image codecs
# ------------------------------------------------------------------ #
def sniff_media(data: bytes) -> str:
    """Extends sniff_format with audio: 'wav' or the image formats."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return sniff_format(data)


def decode_wav(data: bytes):
    """Decode a RIFF/WAVE PCM payload to (samples, sample_rate): samples is
    float64 in [-1, 1], shape (n_frames, n_channels). Covers 8/16/32-bit
    integer PCM and 32-bit float PCM — the interchange subset; compressed
    codecs (MP3/AAC/...) stay behind the library gate."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, _align, bits = fmt
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"{bits}-bit integer PCM unsupported")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    else:
        raise NotImplementedError(f"WAV format code {audio_fmt}/{bits}bit unsupported")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_wav(samples, sample_rate: int, bits: int = 16) -> bytes:
    """Encode float samples in [-1, 1] (n_frames[, n_channels]) as 16-bit
    PCM WAV — fixture/export path."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if bits != 16:
        raise NotImplementedError("encoder emits 16-bit PCM only")
    n_ch = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    hdr = b"WAVE" + b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate,
        sample_rate * n_ch * 2, n_ch * 2, 16,
    ) + b"data" + struct.pack("<I", len(pcm))
    # RIFF chunk size = file size - 8 bytes (the "RIFF" tag + this field);
    # hdr already starts with the 4-byte "WAVE" form type.
    return b"RIFF" + struct.pack("<I", len(hdr) + len(pcm)) + hdr + pcm


def audio_features(samples, sample_rate: int, n_bands: int = 8) -> dict:
    """Deterministic per-clip features: duration, RMS, peak, zero-crossing
    rate, and an ``n_bands`` log-spaced FFT band-energy profile — the
    numeric columns an audio curation pipeline filters on."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 2:
        s = s.mean(axis=1)  # downmix
    n = len(s)
    rms = float(np.sqrt(np.mean(s * s))) if n else 0.0
    peak = float(np.abs(s).max()) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(s))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(s)) if n else np.zeros(1)
    edges = np.unique(
        np.geomspace(1, max(len(spec) - 1, 1), n_bands + 1).astype(int)
    )
    bands = [float(spec[a:b].sum()) for a, b in zip(edges, edges[1:])]
    bands += [0.0] * (n_bands - len(bands))
    return {
        "duration_s": n / sample_rate if sample_rate else 0.0,
        "rms": rms,
        "peak": peak,
        "zcr": zcr,
        "band_energy": bands,
    }
