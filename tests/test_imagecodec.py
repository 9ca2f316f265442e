"""Pure-stdlib image codecs + real multimodal decode/resize pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkml_store_spark.functions import imagecodec as ic


def _img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip(c):
    px = _img(13, 17, c, seed=c)
    out = ic.decode_png(ic.encode_png(px))
    assert out.shape == (13, 17, c)
    assert np.array_equal(out, px)


def test_png_all_filter_types():
    # hand-build a PNG using every filter type (0-4) on successive rows and
    # check against an independently computed expectation
    import struct
    import zlib

    w, c = 4, 3
    rows = [_img(1, w, c, seed=i)[0] for i in range(5)]
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for ftype, row in enumerate(rows):
        flat = row.ravel().astype(np.int32)
        enc = np.zeros(w * c, dtype=np.int32)
        for i in range(w * c):
            a = flat[i - c] if i >= c else 0
            b = prev[i]
            cc = prev[i - c] if i >= c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (flat[i] - pred) % 256
        raw += bytes([ftype]) + bytes(enc.astype(np.uint8))
        prev = flat
    ihdr = struct.pack(">IIBBBBB", w, 5, 8, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
    out = ic.decode_png(data)
    assert np.array_equal(out, np.stack(rows).reshape(5, w, c))


def test_ppm_pgm_roundtrip():
    rgb = _img(9, 11, 3, seed=7)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(rgb)), rgb)
    gray = _img(6, 5, 1, seed=8)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(gray)), gray)


def test_ppm_header_comments():
    data = b"P5 # a comment\n# another\n 3 2 255\n" + bytes(range(6))
    out = ic.decode_ppm(data)
    assert out.shape == (2, 3, 1) and out.ravel().tolist() == list(range(6))


def test_bmp_roundtrip_padding():
    # width 3 -> 9-byte rows padded to 12: exercises stride handling
    px = _img(5, 3, 3, seed=9)
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)
    px2 = _img(4, 4, 3, seed=10)  # no padding case
    assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px2)), px2)


def test_decode_image_dispatch_and_gate():
    px = _img(4, 4, 3, seed=1)
    assert np.array_equal(ic.decode_image(ic.encode_png(px)), px)
    assert np.array_equal(ic.decode_image(ic.encode_ppm(px)), px)
    assert np.array_equal(ic.decode_image(ic.encode_bmp(px)), px)
    # JPEG now dispatches to the built-in baseline codec (lossy: near-equal)
    from linkml_store_spark.functions.jpegcodec import encode_jpeg

    out = ic.decode_image(encode_jpeg(px, quality=95))
    assert out.shape == px.shape
    # GIF dispatches to the built-in LZW codec (lossless roundtrip)
    from linkml_store_spark.functions.gifcodec import encode_gif

    assert np.array_equal(ic.decode_image(encode_gif(px)), px)
    # formats that genuinely need a codec library still gate
    with pytest.raises(NotImplementedError):
        ic.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_resize_nearest():
    px = _img(8, 8, 3, seed=2)
    up = ic.resize_nearest(px, 16, 16)
    assert up.shape == (16, 16, 3)
    # 2x nearest upsample duplicates each source pixel
    assert np.array_equal(up[::2, ::2], px)
    down = ic.resize_nearest(px, 4, 4)
    assert down.shape == (4, 4, 3)
    assert np.array_equal(ic.resize_nearest(px, 8, 8), px)


# ------------------------------------------------------------------ #
# distributed: real decode + resize through the multimodal operators
# ------------------------------------------------------------------ #
def test_extract_features_real_codec(spark):
    from linkml_store_spark.operators import multimodal as mm

    media = mm.real_media_df(spark, n=9)
    feats = mm.extract_features(media, decode_fn=mm.codec_decode).collect()
    assert len(feats) == 9
    rows = {r["media_id"]: r for r in media.collect()}
    for r in feats:
        px = ic.decode_image(bytes(rows[r["media_id"]]["payload"]))
        assert abs(r["mean_pixel"] - px.astype(float).mean()) < 1e-9


def test_resize_images_real_default(spark):
    from linkml_store_spark.operators import multimodal as mm

    media = mm.real_media_df(spark, n=6)
    out = mm.resize_images(media, 8, 6).collect()
    for r in out:
        px = ic.decode_image(bytes(r["payload"]))
        assert px.shape[:2] == (6, 8)
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
    # format preserved through the round trip
    fmts = {ic.sniff_format(bytes(r["payload"])) for r in out}
    assert fmts == {"png", "ppm", "bmp"}


# ------------------------------------------------------------------ #
# audio: WAV codec + distributed feature extraction
# ------------------------------------------------------------------ #
def test_wav_roundtrip_and_formats():
    t = np.linspace(0, 1, 8000, endpoint=False)
    stereo = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 220 * t)], axis=1)
    data = ic.encode_wav(stereo, 8000)
    assert ic.sniff_media(data) == "wav"
    out, rate = ic.decode_wav(data)
    assert rate == 8000 and out.shape == (8000, 2)
    assert np.abs(out - stereo).max() < 1e-3  # 16-bit quantization
    with pytest.raises(NotImplementedError):
        # an fmt chunk claiming a compressed codec gates cleanly
        bad = bytearray(data)
        bad[20:22] = (85).to_bytes(2, "little")  # WAVE_FORMAT_MPEGLAYER3
        ic.decode_wav(bytes(bad))


def test_audio_features_sine():
    t = np.linspace(0, 1, 8000, endpoint=False)
    mono = np.sin(2 * np.pi * 440 * t)
    f = ic.audio_features(mono, 8000)
    assert abs(f["duration_s"] - 1.0) < 1e-9
    assert abs(f["rms"] - 1 / np.sqrt(2)) < 1e-3
    assert abs(f["peak"] - 1.0) < 1e-3
    # a 440 Hz tone crosses zero ~880 times/s
    assert 0.1 < f["zcr"] < 0.13
    # band energy concentrates in one band
    be = np.array(f["band_energy"])
    assert be.max() > 0.9 * be.sum()


def test_extract_audio_features_distributed(spark):
    from linkml_store_spark.operators import multimodal as mm

    rows = []
    for i, hz in enumerate([220, 440, 880]):
        t = np.linspace(0, 0.5, 4000, endpoint=False)
        wav = ic.encode_wav(np.sin(2 * np.pi * hz * t), 8000)
        rows.append(
            {"media_id": i, "kind": "audio", "payload": bytearray(wav),
             "meta": {"format": "wav", "width": 0, "height": 0, "duration_ms": 500}}
        )
    df = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in mm.extract_audio_features(df).collect()}
    assert len(feats) == 3
    for i in range(3):
        assert abs(feats[i]["duration_s"] - 0.5) < 1e-9
        assert feats[i]["sample_rate"] == 8000
        assert abs(feats[i]["rms"] - 1 / np.sqrt(2)) < 1e-2
    # higher pitch -> higher zero-crossing rate
    assert feats[0]["zcr"] < feats[1]["zcr"] < feats[2]["zcr"]


# ------------------------------------------------------------------ #
# property-based roundtrips
# ------------------------------------------------------------------ #
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 2, 3, 4]),
       st.integers(0, 2**32 - 1))
def test_png_property_roundtrip(h, w, c, seed):
    px = _img(h, w, c, seed=seed % 1000)
    assert np.array_equal(ic.decode_png(ic.encode_png(px)), px)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 3]),
       st.integers(0, 999))
def test_ppm_bmp_property_roundtrip(h, w, c, seed):
    px = _img(h, w, c, seed=seed)
    assert np.array_equal(ic.decode_ppm(ic.encode_ppm(px)), px)
    if c == 3:
        assert np.array_equal(ic.decode_bmp(ic.encode_bmp(px)), px)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 500), st.sampled_from([1, 2]), st.integers(0, 999))
def test_wav_property_roundtrip(n, ch, seed):
    rng = np.random.RandomState(seed)
    s = rng.uniform(-1, 1, size=(n, ch))
    out, rate = ic.decode_wav(ic.encode_wav(s, 16000))
    assert rate == 16000 and out.shape == (n, ch)
    # quantization bound: 0.5/32768 rounding + |s|/32768 from the standard
    # 32767-encode / 32768-decode scale asymmetry
    assert np.abs(out - s).max() <= (1.5 / 32768) + 1e-12
