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

    Key-domain note (review r5): a float key containing a real NaN is
    unsupported on THIS grouped path — Spark's applyInPandas raises
    ("Value at index is null") when a grouping key is NaN.
    ``compress_tier_arrow`` handles NaN keys with Spark SQL's groupBy
    semantics (canonicalized NaN = one group, pinned by
    tests/test_compression.py::test_compress_tier_arrow_nan_float_keys).

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


def compress_tier_arrow(
    tier_df: DataFrame,
    block_tier: str = "1d",
    keys: list[str] | None = None,
    int_cols: list[str] | None = None,
    float_cols: list[str] | None = None,
    order_col: str = "bucket_ts",
) -> DataFrame:
    """Columnar encode path: byte-identical blocks to ``compress_tier``
    via ``mapInArrow`` instead of grouped ``applyInPandas``.

    Round-3 bench measured the grouped path ~99% Arrow/pandas plumbing
    (per-group pandas frame construction), not encode compute. Here the
    rows are repartitioned on the block key and sorted within
    partitions, then stream through Python as raw Arrow RecordBatches:
    no pandas conversion, one numpy view per column per batch, group
    boundaries cut with a vectorized change-point scan. A group that
    spans a batch boundary is carried into the next batch, so blocks are
    identical regardless of batch sizing (pinned by
    tests/test_compression.py::test_compress_tier_arrow_identical).
    """
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    keys = keys if keys is not None else ["source"]
    int_cols = int_cols if int_cols is not None else ["tok_sum", "tok_count", "tok_min", "tok_max"]
    float_cols = float_cols if float_cols is not None else []
    n_int, n_flt = len(int_cols), len(float_cols)
    gcols = [*keys, "_block_start"]

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
    arrow_schema = to_arrow_schema(out_schema)

    dtype = dict(tier_df.dtypes)[order_col]
    with_block = tier_df.withColumn(
        "_block_start", bucket_col(order_col, block_tier, epoch=True, dtype=dtype)
    )
    parts = (
        with_block.select(*gcols, order_col, *int_cols, *float_cols)
        .repartition(*gcols)
        .sortWithinPartitions(*gcols, order_col)
    )

    def _group_key_np(tbl: "pa.Table") -> list[tuple[np.ndarray, np.ndarray]]:
        out = []
        for c in gcols:
            col = tbl.column(c)
            out.append((
                col.to_numpy(zero_copy_only=False),
                col.is_null().to_numpy(zero_copy_only=False),
            ))
        return out

    def _change_points(kv: list[tuple[np.ndarray, np.ndarray]], n: int) -> np.ndarray:
        # ADVICE r4: a null numeric key surfaces as NaN via to_numpy and
        # NaN != NaN, so an elementwise compare would cut every null row
        # into its own group — diverging from the grouped applyInPandas
        # path, which groups nulls together. Null-mask the compare:
        # null==null counts as "no change", null vs non-null as a cut.
        # A real (non-null) float NaN key needs the same treatment
        # (review r5): Spark's groupBy canonicalizes NaN, so adjacent
        # NaN rows are ONE group there — both-NaN is "no change" here
        # too (and NaN vs anything else breaks, which the plain compare
        # already gives).
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for arr, nulls in kv:
            neq = arr[1:] != arr[:-1]
            # same = equal non-nulls | both null | both (non-null) NaN;
            # every mixed case (incl. null vs non-null) is a cut
            same = ~neq & ~nulls[1:] & ~nulls[:-1]
            same |= nulls[1:] & nulls[:-1]
            if np.issubdtype(arr.dtype, np.floating):
                nan = np.isnan(arr) & ~nulls
                same |= nan[1:] & nan[:-1]
            change[1:] |= ~same
        return change

    def _encode_groups(tbl: "pa.Table"):
        n = tbl.num_rows
        if n == 0:
            return None
        kv = _group_key_np(tbl)
        starts = np.flatnonzero(_change_points(kv, n))
        ends = np.append(starts[1:], n)
        ts_np = tbl.column(order_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(ts_np.dtype, np.datetime64):
            ts_np = ts_np.astype("datetime64[s]").astype(np.int64)
        else:
            ts_np = ts_np.astype(np.int64)
        ints = {c: tbl.column(c).to_numpy(zero_copy_only=False).astype(np.int64) for c in int_cols}
        flts = {c: tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64) for c in float_cols}
        out: dict[str, list] = {f.name: [] for f in out_schema.fields}
        for s, e in zip(starts, ends):
            blobs = [C.encode_dod_int64(ts_np[s:e])]
            for c in int_cols:
                blobs.append(C.encode_dod_int64(ints[c][s:e]))
            for c in float_cols:
                blobs.append(C.encode_gorilla_f64(flts[c][s:e]))
            for k, (arr, nulls) in zip(keys, kv):
                out[k].append(None if nulls[s] else arr[s])
            out["block_start"].append(int(kv[-1][0][s]))
            npts = int(e - s)
            out["n_points"].append(npts)
            out["ts_blob"].append(blobs[0])
            for c, b in zip([*int_cols, *float_cols], blobs[1:]):
                out[f"{c}_blob"].append(b)
            out["raw_bytes"].append(8 * npts * (1 + n_int + n_flt))
            out["enc_bytes"].append(sum(len(b) for b in blobs))
        return pa.RecordBatch.from_pydict(out, schema=arrow_schema)

    def gen(batches):
        carry = None
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
                carry = None
            n = tbl.num_rows
            if n == 0:
                continue
            # the last group may continue into the next batch — hold it
            kv = _group_key_np(tbl)
            last_start = int(np.flatnonzero(_change_points(kv, n))[-1])
            head, carry = tbl.slice(0, last_start), tbl.slice(last_start)
            rb = _encode_groups(head)
            if rb is not None and rb.num_rows:
                yield rb
        if carry is not None:
            rb = _encode_groups(carry)
            if rb is not None and rb.num_rows:
                yield rb

    return parts.mapInArrow(gen, out_schema)


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
