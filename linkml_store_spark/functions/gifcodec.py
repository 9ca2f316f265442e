"""Pure-stdlib GIF codec (GIF87a/89a, LZW, interlace, animation).

Closes the last common crawl-image gate short of WEBP: GIF is LZW over
palette indices — pure public spec (GIF89a specification, 1990), no
codec library needed. Round-trips are EXACT for paletted content (GIF is
lossless), so the tests assert bit-identical pixels, and the encoder's
output is validated frame-for-frame through the decoder.

* **decoder** — header + logical screen descriptor, global/local color
  tables, graphic-control extensions (delay, disposal methods 0-3,
  transparency), interlaced row order (4-pass), variable-width LSB-first
  LZW with CLEAR/EOI handling and 12-bit dictionary cap, frame
  composition onto the logical screen (``decode_gif`` = first composed
  frame, ``decode_gif_frames`` = every composed frame as (H, W, 3)).
* **encoder** — multi-frame GIF89a from uint8 RGB arrays with <= 256
  distinct colors (palette built from the data; tests' fixtures are
  paletted by construction), optional per-frame delay/transparency,
  optional interlace, real LZW compression with dictionary reset at
  4096 codes.

Throughput note: like jpegcodec, this is a reference kernel (Python LZW
loop); the multimodal operators' ``decode_fn=`` seam swaps in a C codec
without touching the Spark plumbing.

Reference parity: the reference engine has no image pipeline at all
(SURVEY.md §2: multimodal columns are a north-star extension).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]


# ------------------------------------------------------------------ #
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes)
# ------------------------------------------------------------------ #
def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(dict_base)
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(dict_base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream (code out of range)")
            out += entry
            prev = entry
            # the decoder's table trails the encoder's by one entry (no
            # append happens for the first code after CLEAR), so the width
            # switch fires one entry EARLY relative to the table size —
            # GIF's standard "early change" rule
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # the decoder widens when ITS table (mirroring this append) reaches
        # 2^width — so the next emitted code must already use width+1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


# ------------------------------------------------------------------ #
# decoder
# ------------------------------------------------------------------ #
def decode_gif_frames(data: bytes) -> list:
    """All composed frames of a GIF as (H, W, 3) uint8 arrays (logical
    screen size; disposal methods 0-3 and transparency applied)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    # canvas holds palette indices per pixel is not enough (palettes vary
    # per frame) — compose in RGB with a painted mask for transparency
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    frames = []
    transparent = None
    disposal = 0
    prev_canvas = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = data[pos]
                body = data[pos + 1 : pos + 1 + size]
                pos += 1 + size
                packed = body[0]
                disposal = (packed >> 2) & 0x07
                transparent = body[3] if packed & 0x01 else None
            # skip remaining sub-blocks (any extension)
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left, top, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        else:
            if gct is None:
                raise ValueError("GIF image without any color table")
            ct = gct
        interlaced = bool(iflags & 0x40)
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            size = data[pos]
            lzw += data[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(min_code, bytes(lzw))[: iw * ih], dtype=np.uint8
        ).reshape(ih, iw)
        if interlaced:
            idx = _deinterlace(idx)
        prev_canvas = canvas.copy()
        region = canvas[top : top + ih, left : left + iw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = ct[idx[mask]]
        else:
            region[:, :] = ct[idx]
        frames.append(canvas.copy())
        # apply the frame's disposal AFTER it has been shown
        if disposal == 2:  # restore to background
            bgcol = gct[bg] if gct is not None and bg < len(gct) else 0
            canvas[top : top + ih, left : left + iw] = bgcol
        elif disposal == 3 and prev_canvas is not None:  # restore previous
            canvas = prev_canvas
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """First composed frame as (H, W, 3) uint8."""
    return decode_gif_frames(data)[0]


# ------------------------------------------------------------------ #
# encoder
# ------------------------------------------------------------------ #
def encode_gif(
    frames,
    delay_cs: int = 10,
    interlace: bool = False,
    transparent_color=None,
    loop: bool = True,
) -> bytes:
    """GIF89a bytes from one (H, W, 3) uint8 array or a list of them
    (same size; <= 256 distinct colors across all frames — the palette is
    built from the data). ``transparent_color`` (an RGB triple) marks
    that color transparent in every frame."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must be (H, W, 3) and equally sized")
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8)
        if not (colors == tc).all(axis=1).any():
            colors = np.vstack([colors, tc])
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    palette = np.zeros((1 << depth, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    t_idx = lut[tuple(transparent_color)] if transparent_color is not None else None

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    if loop and len(frames) > 1:  # Netscape loop extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        out += b"\x21\xf9\x04"
        packed = 0x01 if t_idx is not None else 0x00
        out += struct.pack("<BHB", packed, delay_cs, t_idx or 0)
        out += b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
        idx = np.array(
            [lut[tuple(px)] for px in f.reshape(-1, 3)], dtype=np.uint8
        ).reshape(h, w)
        if interlace:
            order = [
                r
                for start, step in _INTERLACE_PASSES
                for r in range(start, h, step)
            ]
            idx = idx[order]
        min_code = max(2, depth)
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx.tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
