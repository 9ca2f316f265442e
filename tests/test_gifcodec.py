"""GIF codec (functions/gifcodec.py): LZW roundtrips, interlace,
animation composition, transparency, dispatch, and distributed decode.
GIF is lossless for paletted content, so every roundtrip asserts
bit-identical pixels."""

import numpy as np
import pytest

from linkml_store_spark.functions.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _logo(h=20, w=31):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[5:15, 4:20] = [200, 30, 30]
    img[0:5, :] = [0, 120, 255]
    return img


def test_lzw_roundtrip_widths_and_resets():
    rng = np.random.RandomState(0)
    cases = [
        bytes([0, 1, 2, 0, 1, 2, 0, 1, 2, 1, 1, 1, 0, 0]),
        bytes(rng.randint(0, 4, 500).tolist()),
        bytes(rng.randint(0, 256, 5000).tolist()),
        bytes([0] * 10000),  # single-symbol: maximal run growth
        bytes(rng.randint(0, 256, 60000).tolist()),  # forces 4096-code resets
    ]
    for data in cases:
        mcs = 2 if max(data) < 4 else 8
        assert _lzw_decode(mcs, _lzw_encode(mcs, data)) == data


def test_single_frame_roundtrip_exact():
    img = _logo()
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_full_256_color_palette():
    g = np.zeros((48, 48, 3), dtype=np.uint8)
    g[:, :, 0] = (np.arange(48)[None, :] % 16) * 16
    g[:, :, 1] = (np.arange(48)[:, None] % 16) * 16
    assert len(np.unique(g.reshape(-1, 3), axis=0)) == 256
    assert np.array_equal(decode_gif(encode_gif(g)), g)


def test_interlaced_roundtrip():
    img = _logo(21, 17)  # odd height exercises every interlace pass tail
    assert np.array_equal(decode_gif(encode_gif(img, interlace=True)), img)


def test_animation_frames_compose():
    img = _logo()
    frames = [img, np.roll(img, 5, axis=1), np.roll(img, 10, axis=1)]
    dec = decode_gif_frames(encode_gif(frames, delay_cs=5))
    assert len(dec) == 3
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)


def test_transparency_keeps_previous_composition():
    f1 = np.full((10, 10, 3), 50, dtype=np.uint8)
    f2 = f1.copy()
    f2[2:5, 2:5] = [255, 0, 0]
    f2t = f2.copy()
    f2t[(f2t == [50, 50, 50]).all(axis=2)] = [1, 2, 3]
    dec = decode_gif_frames(encode_gif([f1, f2t], transparent_color=[1, 2, 3]))
    assert np.array_equal(dec[0], f1)
    assert np.array_equal(dec[1], f2)  # transparent pixels show frame 1


def test_too_many_colors_rejected():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
    with pytest.raises(ValueError):
        encode_gif(img)


def test_not_a_gif():
    with pytest.raises(ValueError):
        decode_gif(b"\x89PNG\r\n\x1a\n")


def test_sniff_and_dispatch():
    from linkml_store_spark.functions.imagecodec import decode_image, sniff_format

    img = _logo()
    data = encode_gif(img)
    assert sniff_format(data) == "gif"
    assert np.array_equal(decode_image(data), img)


def test_gif_distributed_decode(spark):
    # GIF payloads flow through the standard multimodal pipeline: binary
    # column -> mapInPandas featurize with the REAL codec
    from linkml_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        codec_decode,
        extract_features,
    )

    rows = []
    for i in range(6):
        img = np.full((16, 16, 3), (i * 37) % 256, dtype=np.uint8)
        img[4:12, 4:12] = [(i * 53) % 256, 0, 255]
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": bytearray(encode_gif(img)),
                "meta": {"format": "gif", "width": 16, "height": 16,
                         "channels": 3, "duration_s": None, "sample_rate": None},
            }
        )
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             extract_features(media, decode_fn=codec_decode).collect()}
    for i in range(6):
        img = np.full((16, 16, 3), (i * 37) % 256, dtype=np.uint8)
        img[4:12, 4:12] = [(i * 53) % 256, 0, 255]
        assert abs(feats[i]["mean_pixel"] - float(img.mean())) < 1e-6


# ------------------------------------------------------------------ #
# property-based fuzzing
# ------------------------------------------------------------------ #
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(3, 40),
    w=st.integers(3, 40),
    ncolors=st.integers(2, 17),
    seed=st.integers(0, 10_000),
    interlace=st.booleans(),
)
def test_gif_property_roundtrip(h, w, ncolors, seed, interlace):
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
    idx = rng.randint(0, ncolors, (h, w))
    img = palette[idx]
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert np.array_equal(out, img)


def test_animation_frames_distributed(spark):
    # animated GIFs -> one row per composed frame via mapInPandas
    from linkml_store_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        animation_frames,
    )

    rows = []
    for i in range(4):
        base = np.full((12, 12, 3), 40 + i, dtype=np.uint8)
        frames = [base]
        for j in range(1, 3 + (i % 2)):
            f = base.copy()
            f[2 : 2 + j, 2 : 2 + j] = [255, 255, 255]
            frames.append(f)
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": bytearray(encode_gif(frames)),
                "meta": {"format": "gif", "width": 12, "height": 12,
                         "duration_ms": 100 * len(frames)},
            }
        )
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = animation_frames(media).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for i in range(4):
        frames = sorted(by_media[i], key=lambda r: r["frame_idx"])
        assert len(frames) == 3 + (i % 2)
        assert frames[0]["n_frames"] == len(frames)
        assert frames[0]["width"] == 12 and frames[0]["height"] == 12
        # frame means strictly increase as the white square grows
        means = [r["mean_pixel"] for r in frames]
        assert means == sorted(means) and means[0] < means[-1]
