"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; the Spark-side plumbing (schema, partition sizing, Arrow batch
shape, UDF signatures) is real and tested, while the codec step itself
is stubbed: the decode libraries (Pillow/ffmpeg/etc.) are not in this
container, so ``decode_image``/``extract_frames`` raise
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic content-hash-seeded fake decode with the correct output
shape. Swapping the stub for a real codec changes only the body of the
marked functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", IMAGE_META),
        T.StructField("source", T.StringType()),
    ]
)


def synthetic_media_table(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for
    exercising the plumbing at any scale."""
    df = spark.range(n_rows).select(
        F.format_string("media-%08d", F.col("id")).alias("media_id"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(512)) + 32).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(512)) + 32).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(3)) + 1).cast("int"),
        ).alias("source"),
    )
    return df


def _fake_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic stand-in decode: content-hash-seeded uint8 array of
    the declared shape."""
    seed = int.from_bytes(payload[:8] if payload else b"\0" * 8, "little", signed=False)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def image_features(df: DataFrame, fake: bool = False, resize_to: int = 8) -> DataFrame:
    """Decode → resize → per-channel mean features via ``mapInPandas``
    (streaming over Arrow batches; output schema fixed). STUB: the real
    decode needs an image library not present in this container."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("feat", T.ArrayType(T.DoubleType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an image codec library (not in this "
                    "container); pass fake=True for the deterministic stub"
                )
            rows = []
            for _, r in pdf.iterrows():
                m = r["meta"]
                img = _fake_decode(r["payload"], m["width"], m["height"], m["channels"])
                # nearest-neighbor "resize" then per-channel means
                ys = np.linspace(0, img.shape[0] - 1, resize_to).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, resize_to).astype(int)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "source": r["source"],
                        "feat": small.mean(axis=(0, 1)).astype(float).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, out_schema)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-media frame indices
    (metadata math only — JVM); the decode of each sampled frame is the
    stubbed step above."""
    n_frames = (F.col("meta.width") * 0 + 300).alias("n_frames")  # stub: fixed clip length
    return df.select(
        "media_id",
        "source",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
