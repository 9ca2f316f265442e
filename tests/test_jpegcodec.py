"""Baseline JPEG codec (functions/jpegcodec.py): roundtrips, the exactness
window the multimodal oracle relies on, and decoder-only paths (chroma
subsampling, restart markers) exercised via hand-crafted streams."""

import struct

import numpy as np
import pytest

from linkml_store_spark.functions import jpegcodec as jc
from linkml_store_spark.functions.jpegcodec import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)


def test_rgb_roundtrip_quality_ladder():
    img = _gradient(24, 33)
    prev_err = None
    for q in (50, 85, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape and out.dtype == np.uint8
        err = float(np.abs(out.astype(int) - img.astype(int)).mean())
        assert err < 8.0, f"quality {q}: mean err {err}"
        if prev_err is not None:
            assert err <= prev_err + 0.5  # higher quality never much worse
        prev_err = err


def test_grayscale_roundtrip():
    g = ((np.mgrid[0:24, 0:33][1] * 11) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=85))
    assert out.shape == (24, 33, 1)
    assert float(np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean()) < 8.0


def test_piecewise_flat_is_bit_exact_at_q76():
    # quality 76 -> luma DC quantizer exactly 8 -> flat 8x8 blocks
    # round-trip losslessly (the invariant the multimodal_jpeg oracle uses)
    img = np.empty((24, 32), dtype=np.uint8)
    for by in range(3):
        for bx in range(4):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (bx * 17 + by * 29) % 256
    out = decode_jpeg(encode_jpeg(img, quality=76))
    assert np.array_equal(out[:, :, 0], img)


def test_odd_dimensions_and_noise():
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (13, 9, 3), dtype=np.uint8)
    for q in (10, 60, 100):
        out = decode_jpeg(encode_jpeg(noise, quality=q))
        assert out.shape == noise.shape


def test_q100_adversarial_checkerboard_clamps():
    cb = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(cb, quality=100))
    assert int(np.abs(out[:, :, 0].astype(int) - cb.astype(int)).max()) <= 1


def test_progressive_missing_scan_rejected():
    # SOF2 parses now (round 5); a stream with no SOS still errors cleanly
    data = b"\xff\xd8\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + b"\x01\x11\x00"
    with pytest.raises(ValueError):
        decode_jpeg(data)


def _structured(shape, seed=7, noise=18.0):
    import numpy as _np

    rng = _np.random.RandomState(seed)
    h, w = shape[:2]
    c = shape[2] if len(shape) == 3 else 1
    yy, xx = _np.mgrid[0:h, 0:w]
    base = _np.zeros((h, w, c))
    for ch in range(c):
        base[:, :, ch] = 128 + 90 * _np.sin(xx / 3.0 + ch) + 30 * _np.cos(yy / 2.5)
    img = _np.clip(base + rng.randn(h, w, c) * noise, 0, 255).astype(_np.uint8)
    return img if len(shape) == 3 else img[:, :, 0]


def test_progressive_decode_bit_identical_to_baseline():
    # The progressive stream carries the same quantized coefficients, so
    # after full decode the pixels must match the baseline stream EXACTLY
    # — this exercises every SOF2 path: interleaved DC first (Al=1) +
    # refinement, per-band non-interleaved AC first + refinement,
    # newly-significant placement, correction bits, ZRL, and EOB runs.
    from linkml_store_spark.functions.jpegcodec import encode_jpeg_progressive

    for shape in [(24, 33, 3), (17, 16), (8, 8, 3), (40, 40)]:
        img = _structured(shape)
        for q in (85, 50, 95):
            b = decode_jpeg(encode_jpeg(img, quality=q))
            p = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(b, p), (shape, q)


def test_progressive_flat_image_long_eobruns():
    # a flat image makes every AC band an end-of-band occurrence -> the
    # encoder emits multi-block EOBRUN symbols and the decoder must count
    # them across blocks
    from linkml_store_spark.functions.jpegcodec import encode_jpeg_progressive

    img = np.full((48, 56, 3), 77, dtype=np.uint8)
    data = encode_jpeg_progressive(img, quality=85)
    out = decode_jpeg(data)
    assert np.array_equal(out, decode_jpeg(encode_jpeg(img, quality=85)))
    # flat color decodes to (nearly) the constant everywhere
    assert int(np.abs(out.astype(int) - 77).max()) <= 2


def test_progressive_noise_all_refinement_paths():
    from linkml_store_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    for q in (20, 85):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(img, quality=q)),
            decode_jpeg(encode_jpeg(img, quality=q)),
        )


def test_not_a_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"GIF89a")


# --------------------------------------------------------------------- #
# hand-crafted streams for decoder-only paths
# --------------------------------------------------------------------- #
def _headers(h, w, comps, restart_interval=0):
    """SOI + DQT(q=8 flat tables) + SOF0 + DHT (the codec's simple encoder
    tables) + optional DRI + SOS, plus the quant tables used."""
    out = bytearray(b"\xff\xd8")
    q8 = np.full((8, 8), 8, dtype=np.int32)
    for tq in sorted({tq for _, _, _, tq in comps}):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(q8.flat[i]) for i in jc._ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hs, vs, tq in comps:
        out += struct.pack("BBB", cid, (hs << 4) | vs, tq)
    for tc_th in (0x00, 0x10, 0x01, 0x11):
        bits, vals = (
            (jc._ENC_DC_BITS, jc._ENC_DC_VALS)
            if tc_th & 0x10 == 0
            else (jc._ENC_AC_BITS, jc._ENC_AC_VALS)
        )
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for i, (cid, _, _, _) in enumerate(comps):
        out += struct.pack("BB", cid, 0x00 if i == 0 else 0x11)
    out += b"\x00\x3f\x00"
    return out


def _write_flat_block(bw, dc_codes, ac_codes, dcq, pred):
    """Entropy-code one flat block: quantized DC ``dcq``, all AC zero."""
    diff = dcq - pred
    size = int(abs(diff)).bit_length()
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    c, l = ac_codes[0x00]  # EOB
    bw.write(c, l)
    return dcq


def test_decode_420_subsampled():
    # one MCU: Y at 2x2 (four flat 8x8 blocks), Cb/Cr at 1x1 — with the
    # flat q=8 tables every block reconstructs exactly, so the expected RGB
    # is pure BT.601 arithmetic
    y_vals = [40, 90, 160, 210]  # (by, bx) order: (0,0) (0,1) (1,0) (1,1)
    cb_v, cr_v = 140, 112
    dc_codes = jc._canonical_codes(jc._ENC_DC_BITS, jc._ENC_DC_VALS)
    ac_codes = jc._canonical_codes(jc._ENC_AC_BITS, jc._ENC_AC_VALS)
    bw = jc._BitWriter()
    pred = 0
    for v in y_vals:  # Y blocks: v-major then h (by, bx)
        pred = _write_flat_block(bw, dc_codes, ac_codes, v - 128, pred)
    _write_flat_block(bw, dc_codes, ac_codes, cb_v - 128, 0)
    _write_flat_block(bw, dc_codes, ac_codes, cr_v - 128, 0)
    data = bytes(
        _headers(16, 16, [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)])
    ) + bw.flush() + b"\xff\xd9"

    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    y_plane = np.empty((16, 16))
    for i, v in enumerate(y_vals):
        by, bx = divmod(i, 2)
        y_plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    r = np.clip(np.round(y_plane + 1.402 * (cr_v - 128.0)), 0, 255)
    g = np.clip(
        np.round(y_plane - 0.344136 * (cb_v - 128.0) - 0.714136 * (cr_v - 128.0)),
        0,
        255,
    )
    b = np.clip(np.round(y_plane + 1.772 * (cb_v - 128.0)), 0, 255)
    expected = np.stack([r, g, b], axis=2).astype(np.uint8)
    assert np.array_equal(out, expected)


def test_decode_restart_markers():
    # grayscale 8x24 = 3 MCUs with DRI=1: RST between MCUs, DC pred resets
    vals = [50, 120, 200]
    dc_codes = jc._canonical_codes(jc._ENC_DC_BITS, jc._ENC_DC_VALS)
    ac_codes = jc._canonical_codes(jc._ENC_AC_BITS, jc._ENC_AC_VALS)
    body = bytearray()
    for i, v in enumerate(vals):
        bw = jc._BitWriter()
        _write_flat_block(bw, dc_codes, ac_codes, v - 128, 0)  # pred reset
        body += bw.flush()
        if i < len(vals) - 1:
            body += bytes([0xFF, 0xD0 + i])
    data = bytes(_headers(8, 24, [(1, 1, 1, 0)], restart_interval=1)) + bytes(
        body
    ) + b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == (8, 24, 1)
    for i, v in enumerate(vals):
        assert np.all(out[:, i * 8 : i * 8 + 8, 0] == v), f"MCU {i}"


def test_sniff_and_dispatch():
    from linkml_store_spark.functions.imagecodec import decode_image, sniff_format

    img = _gradient(8, 8)
    data = encode_jpeg(img, quality=90)
    assert sniff_format(data) == "jpeg"
    assert decode_image(data).shape == img.shape


def test_jpeg_media_distributed_decode(spark):
    # the multimodal_jpeg entry query's invariant: distributed mapInPandas
    # decode of the piecewise-flat JPEGs reproduces the analytic block means
    from linkml_store_spark.operators.multimodal import (
        codec_decode,
        extract_features,
        jpeg_media_df,
    )

    media = jpeg_media_df(spark, n=6)
    got = {
        r["media_id"]: r["mean_pixel"]
        for r in extract_features(media, decode_fn=codec_decode).collect()
    }
    for i in range(6):
        expect = np.mean(
            [(i * 31 + bx * 17 + by * 29) % 256 for by in range(3) for bx in range(4)]
        )
        assert abs(got[i] - expect) < 1e-9, (i, got[i], expect)


# ------------------------------------------------------------------ #
# property-based
# ------------------------------------------------------------------ #
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 20), st.integers(1, 20), st.sampled_from([1, 3]),
       st.integers(5, 100), st.integers(0, 999))
def test_jpeg_property_roundtrip_shape_and_bound(h, w, c, q, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w) if c == 1 else (h, w, c), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=q))
    assert out.shape == (h, w, c)
    assert out.dtype == np.uint8


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 255), st.integers(1, 3), st.integers(1, 4))
def test_jpeg_property_flat_blocks_exact_at_q76(v, bh, bw_):
    # every flat 8x8-block grayscale image is bit-exact at quality 76
    img = np.full((bh * 8, bw_ * 8), v, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=76))
    assert np.array_equal(out[:, :, 0], img)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(4, 40),
    w=st.integers(4, 40),
    c=st.sampled_from([1, 3]),
    q=st.integers(20, 95),
    seed=st.integers(0, 10_000),
)
def test_jpeg_property_progressive_equals_baseline(h, w, c, q, seed):
    from linkml_store_spark.functions.jpegcodec import encode_jpeg_progressive

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, c)).astype(np.uint8)
    if c == 1:
        img = img[:, :, 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, quality=q)),
        decode_jpeg(encode_jpeg(img, quality=q)),
    )
