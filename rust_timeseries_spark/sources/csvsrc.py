"""CSV source/sink with the same scale policy as the JSONL source:
explicit schema REQUIRED (inference = a full pre-scan of the corpus),
PERMISSIVE corrupt-record capture (quarantine, never silent drop or
job abort).

CSV-specific scale rule pinned here: **embedded newlines cost
splittability.** Spark's CSV writer quotes fields containing the
delimiter/quote and can embed literal newlines, but reading those back
requires ``multiLine=true`` — which makes every file a single split
(one task per file at 100 TB). The engine's contract is therefore:
keep newlines OUT of CSV fields (strip or escape them upstream — the
default writer/reader pair here round-trips quotes, delimiters,
backslashes and tabs losslessly WITHOUT multiLine), and reserve
``read_csv(..., multiline=True)`` for small, already-chunked inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as headered CSV; Spark quotes/escapes fields
    containing delimiter or quote characters."""
    df.write.mode(mode).option("header", "true").option("escape", '"').csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
    multiline: bool = False,
) -> DataFrame:
    """Schema-pinned CSV scan with corrupt-record capture. The default
    reader stays line-splittable; ``multiline=True`` parses embedded
    newlines at the cost of one-split-per-file (see module docstring)."""
    full = T.StructType(schema.fields + [T.StructField(corrupt_col, T.StringType(), True)])
    return (
        spark.read.schema(full)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("escape", '"')
        .option("multiLine", "true" if multiline else "false")
        .csv(path)
    )
