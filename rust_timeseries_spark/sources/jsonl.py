"""JSONL (newline-delimited JSON) source/sink for document corpora.

JSONL is the lingua franca of LLM training-data interchange (one JSON
object per line), so the engine speaks it alongside parquet/Iceberg.
Two scale rules are pinned here:

* **Explicit schema always.** ``spark.read.json`` without a schema runs
  a full inference pre-scan — a second pass over 100 TB before the real
  job starts, and a silently drifting schema when a rare field appears.
  ``read_jsonl`` therefore REQUIRES the schema; corrupt lines are
  captured per-row (PERMISSIVE + ``_corrupt_record``) instead of
  failing the job, mirroring the validating-scan policy of
  ``sources/tokens.py`` (bad rows surfaced, not dropped — reference
  src/duration/core/data.rs:167-188).
* **Splittability caveat.** Plain ``.json`` files split by line; gzip
  members do not — a .jsonl.gz corpus should be many files (the writer
  leaves Spark's per-task file layout alone for exactly that reason).

Round-trip losslessness (UTF-8 text incl. quotes/backslashes/control
chars through the JSON escaper) is driver-gated by *jsonl_roundtrip*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as JSONL. One file per task — at scale, size the
    upstream partitioning (coalesce/repartition) for the object-store
    file-size sweet spot rather than fighting the writer."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-pinned JSONL scan. Malformed lines land in
    ``corrupt_col`` (all data fields null) so the caller can count and
    quarantine them — never a silent drop, never a job abort on one bad
    line in a trillion."""
    full = T.StructType(schema.fields + [T.StructField(corrupt_col, T.StringType(), True)])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
