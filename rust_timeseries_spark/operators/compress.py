"""Compressed block tables: bucketed tier rows ⇄ binary blocks.

One block per (key..., block_start): within a block, ``bucket_ts`` and
integer counters are delta-of-delta encoded, float aggregates are
Gorilla-XOR encoded (functions/compression.py). Blocks are the at-rest
format for cold tiers — a day of 1m buckets (1440 points) typically
packs into a few hundred bytes per column instead of 11.5 KB.

Encode runs as ``applyInPandas`` per block group (Arrow batch → numpy →
bitstream); decode as ``mapInPandas`` (streaming, no shuffle — each
block row explodes independently). Both sides are deterministic, and
``decode(encode(x)) == x`` bit-for-bit (tests/test_compression.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import compression as C
from .rollup import TIER_SECONDS, bucket_col


def _ts_to_epoch_np(s: pd.Series) -> np.ndarray:
    if np.issubdtype(s.dtype, np.datetime64):
        return s.to_numpy().astype("datetime64[s]").astype(np.int64)
    return s.to_numpy(dtype=np.int64)


def compress_tier(
    tier_df: DataFrame,
    block_tier: str = "1d",
    keys: list[str] | None = None,
    int_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Pack a tier table into per-(keys, block_start) binary blocks.

    Output schema: keys..., block_start long (epoch s), n_points int,
    ts_blob binary, ``<col>_blob`` binary per value column,
    raw_bytes/enc_bytes long (compression accounting).
    """
    keys = keys if keys is not None else ["source"]
    int_cols = int_cols if int_cols is not None else ["tok_sum", "tok_count", "tok_min", "tok_max"]
    float_cols = float_cols if float_cols is not None else []

    key_fields = [tier_df.schema[k] for k in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("block_start", T.LongType()),
            T.StructField("n_points", T.IntegerType()),
            T.StructField("ts_blob", T.BinaryType()),
            *[T.StructField(f"{c}_blob", T.BinaryType()) for c in [*int_cols, *float_cols]],
            T.StructField("raw_bytes", T.LongType()),
            T.StructField("enc_bytes", T.LongType()),
        ]
    )
    n_int = len(int_cols)

    def kernel(key_vals: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        ts = _ts_to_epoch_np(pdf[order_col])
        blobs = [C.encode_dod_int64(ts)]
        for c in int_cols:
            blobs.append(C.encode_dod_int64(pdf[c].to_numpy(dtype=np.int64)))
        for c in float_cols:
            blobs.append(C.encode_gorilla_f64(pdf[c].to_numpy(dtype=np.float64)))
        n = len(pdf)
        row = {k: [v] for k, v in zip(keys, key_vals[:-1])}
        row["block_start"] = [int(key_vals[-1])]
        row["n_points"] = [n]
        row["ts_blob"] = [blobs[0]]
        for c, b in zip([*int_cols, *float_cols], blobs[1:]):
            row[f"{c}_blob"] = [b]
        row["raw_bytes"] = [8 * n * (1 + n_int + len(float_cols))]
        row["enc_bytes"] = [sum(len(b) for b in blobs)]
        return pd.DataFrame(row)

    dtype = dict(tier_df.dtypes)[order_col]
    with_block = tier_df.withColumn(
        "_block_start", bucket_col(order_col, block_tier, epoch=True, dtype=dtype)
    )
    return with_block.groupBy(*keys, "_block_start").applyInPandas(kernel, out_schema)


def decompress_blocks(
    blocks_df: DataFrame,
    keys: list[str] | None = None,
    int_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
) -> DataFrame:
    """Explode block rows back into (keys..., bucket_ts long, value
    columns) — streaming mapInPandas, no shuffle."""
    keys = keys if keys is not None else ["source"]
    int_cols = int_cols if int_cols is not None else ["tok_sum", "tok_count", "tok_min", "tok_max"]
    float_cols = float_cols if float_cols is not None else []

    key_fields = [blocks_df.schema[k] for k in keys]
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("bucket_ts", T.LongType()),
            *[T.StructField(c, T.LongType()) for c in int_cols],
            *[T.StructField(c, T.DoubleType()) for c in float_cols],
        ]
    )

    def gen(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ts = C.decode_dod_int64(row["ts_blob"])
                data = {k: row[k] for k in keys}
                data["bucket_ts"] = ts
                for c in int_cols:
                    data[c] = C.decode_dod_int64(row[f"{c}_blob"])
                for c in float_cols:
                    data[c] = C.decode_gorilla_f64(row[f"{c}_blob"])
                frames.append(pd.DataFrame(data))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blocks_df.mapInPandas(gen, out_schema)


def compression_report(blocks_df: DataFrame) -> DataFrame:
    """Aggregate compression accounting: total raw vs encoded bytes and
    overall ratio."""
    return blocks_df.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_points").alias("n_points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("enc_bytes").alias("enc_bytes"),
        (F.sum("raw_bytes") / F.sum("enc_bytes")).alias("ratio"),
    )
