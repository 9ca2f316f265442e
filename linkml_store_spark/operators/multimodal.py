"""Multimodal columns: binary payloads with typed metadata.

North-star extension: image/audio/video ride as opaque ``binary`` columns
with a struct of metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages.

The decode step is REAL for PNG / PPM / PGM / BMP (pure-stdlib,
``functions/imagecodec.py``) AND Huffman-coded JPEG — baseline
sequential plus, since round 5, progressive (SOF2) — via the built-in
numpy DCT/Huffman codec (``functions/jpegcodec.py``; 4:4:4 / 4:2:2 /
4:2:0 / grayscale), all used by ``codec_decode`` and the default
``resize_images`` path. Only WEBP and exotic audio
containers remain behind the library gate (GIF incl. animation is
built in, functions/gifcodec.py): for those, ``decode_fn=None`` on ``extract_features`` falls
back to a deterministic fake (pixels seeded from the payload hash) so the
Spark-side plumbing — schema, batch shape, partition behavior, UDF
signatures — stays testable; swap in a PIL/torchaudio ``decode_fn`` and
nothing else changes (recommended for throughput: the built-in JPEG
Huffman loop is reference-grade Python, libjpeg-turbo is ~100x).

Scale notes: binary columns are parquet-native; mapInPandas streams Arrow
batches so a 100 TB image table never materializes rows in Python lists;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds per-batch memory
(set it low for large payloads).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# every decode stage fans its input out first (round 12): the per-item
# codec calls run inside ONE Python worker when a one-row-group store
# scans as one partition; fan_out is a no-op on pre-split inputs
from linkml_store_spark.operators.scale import fan_out

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthetic_media_df(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * 4
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": bytearray(payload),
                "meta": {
                    "format": "fake",
                    "width": 32 + (i % 8) * 16,
                    "height": 32 + (i % 5) * 16,
                    "duration_ms": 1000 + i * 37,
                },
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for an image decoder: seeds a tiny 'pixel'
    array from the payload hash. Replace with PIL.Image.open in production."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(min(height, 8), min(width, 8), 3), dtype=np.uint8)


def codec_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """REAL decode via the pure-stdlib codecs (PNG/JPEG incl. progressive/
    GIF/PPM/PGM/BMP); the meta width/height are advisory — actual
    dimensions come from the payload."""
    from linkml_store_spark.functions.imagecodec import decode_image

    return decode_image(payload)


def jpeg_media_df(spark, n: int = 16, width: int = 32, height: int = 24) -> DataFrame:
    """Media table with REAL baseline-JPEG payloads (functions/jpegcodec.py).

    Images are PIECEWISE-FLAT grayscale on the 8x8 block grid with block
    value ``(i*31 + bx*17 + by*29) % 256``. At quality 76 the luma DC
    quantizer is exactly 8, so a flat block's only nonzero coefficient
    round-trips losslessly (DC_q = v - 128 exactly) — the decode is
    BIT-EXACT despite JPEG being lossy in general, which makes the whole
    encode -> Huffman -> decode -> mean path value-oracleable by plain
    arithmetic while still exercising multi-block entropy coding and the
    DC prediction chain (block-to-block diffs are nonzero).

    Odd media_ids are encoded PROGRESSIVE (SOF2, multi-scan successive
    approximation — round 5) and even ones baseline, so one pass through
    the decoder exercises both entropy layouts under the same bit-exact
    oracle (the streams carry identical quantized coefficients)."""
    from linkml_store_spark.functions.jpegcodec import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    assert width % 8 == 0 and height % 8 == 0
    rows = []
    for i in range(n):
        img = np.empty((height, width), dtype=np.uint8)
        for by in range(height // 8):
            for bx in range(width // 8):
                img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    i * 31 + bx * 17 + by * 29
                ) % 256
        enc = encode_jpeg_progressive if i % 2 else encode_jpeg
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": bytearray(enc(img, quality=76)),
                "meta": {
                    "format": "jpeg",
                    "width": width,
                    "height": height,
                    "duration_ms": 0,
                },
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def gif_media_df(spark, n: int = 12) -> DataFrame:
    """Media table with REAL GIF payloads (functions/gifcodec.py). Flat
    16x16 background ``(i*37) % 256`` with an 8x8 inner square of
    ``((i*53) % 256, 0, 255)`` — GIF is LOSSLESS, so the decoded mean is
    exact integer arithmetic any SQL engine replays."""
    from linkml_store_spark.functions.gifcodec import encode_gif

    rows = []
    for i in range(n):
        img = np.full((16, 16, 3), (i * 37) % 256, dtype=np.uint8)
        img[4:12, 4:12] = [(i * 53) % 256, 0, 255]
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": bytearray(encode_gif(img)),
                "meta": {"format": "gif", "width": 16, "height": 16,
                         "duration_ms": 0},
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def real_media_df(spark, n: int = 16) -> DataFrame:
    """Media table with REAL payloads: deterministic gradient images encoded
    round-robin as PNG / PPM / BMP by the stdlib codecs."""
    from linkml_store_spark.functions.imagecodec import encode_bmp, encode_png, encode_ppm

    encoders = [("png", encode_png), ("ppm", encode_ppm), ("bmp", encode_bmp)]
    rows = []
    for i in range(n):
        w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(xx * 7 + i) % 256, (yy * 5 + 2 * i) % 256, (xx + yy + 3 * i) % 256],
            axis=2,
        ).astype(np.uint8)
        fmt, enc = encoders[i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": bytearray(enc(px)),
                "meta": {"format": fmt, "width": w, "height": h, "duration_ms": 0},
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(
    df: DataFrame,
    decode_fn: Optional[Callable[[bytes, int, int], np.ndarray]] = None,
    feature_dim: int = 16,
) -> DataFrame:
    """Decode + featurize each media row (Arrow-batched mapInPandas).

    With decode_fn=None the deterministic fake decoder runs; a real decoder
    drops in without touching the distributed plumbing. Raises cleanly for
    kinds a decoder can't handle.
    """
    decode = decode_fn or _fake_decode

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            # decode is inherently per-item (a codec call); everything after
            # it is one stacked numpy pass over the whole Arrow batch
            flats = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                px = decode(bytes(payload), meta["width"], meta["height"])
                flats.append(px.astype(np.float64).ravel())
            lengths = np.array([f.size for f in flats], dtype=np.int64)
            cat = np.concatenate(flats) if lengths.sum() else np.zeros(1)
            # per-row chunk sizes matching np.array_split(flat, feature_dim):
            # the first (len % dim) chunks get one extra element
            sizes = (lengths // feature_dim)[:, None] + (
                np.arange(feature_dim)[None, :] < (lengths % feature_dim)[:, None]
            )
            flat_sizes = sizes.ravel()
            starts = np.concatenate(([0], np.cumsum(flat_sizes)[:-1]))
            # reduceat quirks on empty segments (equal/clipped indices return
            # cat[start] instead of 0) are masked out by flat_sizes == 0
            sums = np.add.reduceat(cat, np.minimum(starts, cat.size - 1))
            sums = np.where(flat_sizes == 0, 0.0, sums)
            feature = sums / np.maximum(flat_sizes, 1)
            row_sums = sums.reshape(n, feature_dim).sum(axis=1)
            mean_pixel = row_sums / np.maximum(lengths, 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "mean_pixel": mean_pixel,
                    "feature": list(feature.reshape(n, feature_dim)),
                }
            )

    return fan_out(df, key="media_id").mapInPandas(process, schema=FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    target_width: int,
    target_height: int,
    resize_fn: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Resize stage: payload -> payload' with updated meta. The default
    resamples for REAL via the pure-stdlib codecs (decode PNG/PPM/PGM/BMP,
    nearest-neighbor resample, re-encode in the same format); pass
    ``resize_fn`` for formats that need a codec library (JPEG &c.)."""

    def _codec_resize(payload: bytes, w: int, h: int) -> bytes:
        from linkml_store_spark.functions.imagecodec import (
            decode_image,
            encode_bmp,
            encode_png,
            encode_ppm,
            resize_nearest,
            sniff_format,
        )

        fmt = sniff_format(payload)
        px = resize_nearest(decode_image(payload), w, h)
        if fmt == "png":
            return encode_png(px)
        if fmt in ("ppm", "pgm"):
            return encode_ppm(px)
        return encode_bmp(px)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = resize_fn or _codec_resize
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # the codec call is inherently per-item; everything else is a
            # single column assignment over the Arrow batch (same treatment
            # as extract_features — no per-row dict rebuild)
            out = pdf.copy()
            out["payload"] = [
                fn(bytes(p), target_width, target_height)
                for p in pdf["payload"]
            ]
            out["meta"] = [
                {**dict(m), "width": target_width, "height": target_height}
                for m in pdf["meta"]
            ]
            yield out

    return fan_out(df, key="media_id").mapInPandas(process, schema=df.schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (frame decode itself stubbed as payload passthrough + frame_ts)."""
    # explode_outer, not explode: explode's inferred `size(arr) > 0` filter
    # gets pushed below the projection and re-builds the sequence array per
    # row a second time (see dedup.ngram_jaccard_pairs). duration_ms >= 0
    # always yields a non-empty sequence, so results are identical.
    frames = df.withColumn(
        "frame_ts",
        F.explode_outer(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ),
    ).filter(F.col("frame_ts").isNotNull())
    return frames.select("media_id", "kind", "frame_ts", "payload", "meta")


ANIMATION_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def animation_frames(
    df: DataFrame,
    frames_fn: Optional[Callable[[bytes], list]] = None,
) -> DataFrame:
    """REAL animation frame extraction: one output row per decoded,
    fully-composed frame (Arrow-batched ``mapInPandas``). The default
    ``frames_fn`` is the built-in GIF codec (``decode_gif_frames`` —
    disposal + transparency applied); a video library drops into the same
    seam for MP4/WEBM without touching the distributed plumbing.

    Scale shape: frame decode is per-payload work that parallelizes over
    partitions; output volume is frames-per-media × rows, still columnar.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from linkml_store_spark.functions.gifcodec import decode_gif_frames

        fn = frames_fn or decode_gif_frames
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = fn(bytes(payload))
                for j, fr in enumerate(frames):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": j,
                            "n_frames": len(frames),
                            "mean_pixel": float(np.asarray(fr).mean()),
                            "width": int(fr.shape[1]),
                            "height": int(fr.shape[0]),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return fan_out(df.select("media_id", "payload"), key="media_id").mapInPandas(
        process, schema=ANIMATION_FRAME_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("band_energy", T.ArrayType(T.DoubleType())),
    ]
)


def extract_audio_features(
    df: DataFrame,
    n_bands: int = 8,
) -> DataFrame:
    """REAL audio decode + featurize for WAV PCM payloads (pure-stdlib RIFF
    parser, ``functions/imagecodec.decode_wav``): per-clip duration, RMS,
    peak, zero-crossing rate, and a log-spaced FFT band-energy profile —
    the numeric columns an audio curation pipeline filters on. Arrow-batched
    mapInPandas; compressed codecs (MP3/...) raise through the decode gate.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from linkml_store_spark.functions.imagecodec import audio_features, decode_wav

        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode_wav(bytes(payload))
                f = audio_features(samples, rate, n_bands=n_bands)
                rows.append(
                    {
                        "media_id": mid,
                        "sample_rate": rate,
                        "n_channels": samples.shape[1],
                        "duration_s": f["duration_s"],
                        "rms": f["rms"],
                        "peak": f["peak"],
                        "zcr": f["zcr"],
                        "band_energy": f["band_energy"],
                    }
                )
            yield pd.DataFrame(rows)

    return fan_out(df, key="media_id").mapInPandas(process, schema=AUDIO_FEATURE_SCHEMA)
