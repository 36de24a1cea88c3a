"""Token-table source: scan, schema enforcement, per-row invariants.

The engine's raw input is an Iceberg table of pre-tokenized training
sequences ``(doc_id string, tokens array<int>, n_tok int, source
string)`` (BASELINE.json input_hint). In the sandbox the physical format
is parquet; on a cluster, ``format="iceberg"`` gets partition pruning on
``source``/day from Iceberg metadata for free.

Validation mirrors the reference's validating constructors
(``ACDData::new`` — reference src/duration/core/data.rs:167-188): bad
rows are counted and surfaced, not silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def read_tokens(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Scan the token table. Only project columns you need downstream —
    rollups never touch ``tokens``, so Catalyst prunes it out of the
    parquet/Iceberg scan (verify via .explain ReadSchema).

    The ``fmt="iceberg"`` branch is exercised by
    tests/test_rollup.py::test_read_tokens_iceberg_branch_executes via a
    registered Python Data Source named ``iceberg`` (this sandbox has no
    Iceberg runtime jar): the DataSourceV2 format lookup, the
    ``load(path)`` option plumbing, and the downstream schema/invariant
    contract all run for real; only the storage behind the name is a
    stand-in. Against a real catalog the same line resolves to
    iceberg-spark-runtime unchanged — end-to-end catalog behavior
    (snapshots, hidden partitioning) still needs a cluster to verify.
    The parquet path (and the TierStore dynamic-partition-overwrite
    MERGE stand-in, plans/tiers.py) is what the rest of the suite
    pins."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def invariant_violations(df: DataFrame) -> DataFrame:
    """Per-row invariant check: ``size(tokens) == n_tok`` and
    non-negative token ids (BASELINE.json per-row invariant; analogue of
    the reference's ingest validation, data.rs:172-179).

    Returns a 1-row DataFrame of violation counters; the caller decides
    whether to raise (strict ingest) or route to a quarantine table.
    """
    return df.select(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.size("tokens") != F.col("n_tok"), 1).otherwise(0)).alias("n_tok_mismatch"),
        F.sum(F.when(F.col("n_tok") <= 0, 1).otherwise(0)).alias("n_nonpositive"),
        F.sum(F.when(F.col("doc_id").isNull() | F.col("source").isNull(), 1).otherwise(0)).alias("n_null_key"),
    )


def assert_invariants(df: DataFrame) -> None:
    """Strict ingest: raise ValueError naming the violated invariant,
    mirroring the reference's typed error taxonomy
    (ACDError::{NonPositiveData,...}, src/duration/errors.rs:175-182)."""
    row = invariant_violations(df).collect()[0]
    if row["n_tok_mismatch"]:
        raise ValueError(f"TokenArrayMismatch: {row['n_tok_mismatch']} rows with size(tokens) != n_tok")
    if row["n_nonpositive"]:
        raise ValueError(f"NonPositiveData: {row['n_nonpositive']} rows with n_tok <= 0")
    if row["n_null_key"]:
        raise ValueError(f"NullKey: {row['n_null_key']} rows with null doc_id/source")


def token_equality_check(df: DataFrame, reference_df: DataFrame) -> DataFrame:
    """Per-row token-array equality vs the source-of-truth table
    (BASELINE.json: 'per-row token-array equality holds against the
    source table'). Inner join on doc_id, compare arrays element-wise.
    At scale both sides are bucketed by doc_id so this is a co-located
    sort-merge join with no extra shuffle."""
    a = df.select("doc_id", F.col("tokens").alias("tokens_a"))
    b = reference_df.select("doc_id", F.col("tokens").alias("tokens_b"))
    return (
        a.join(b, "doc_id", "full_outer")
        .select(
            F.count(F.lit(1)).alias("n_joined"),
            F.sum(F.when(F.col("tokens_a").isNull() | F.col("tokens_b").isNull(), 1).otherwise(0)).alias("n_missing"),
            F.sum(F.when(F.col("tokens_a") != F.col("tokens_b"), 1).otherwise(0)).alias("n_mismatch"),
        )
    )
