"""Train/eval n-gram decontamination.

Reference scope note: no counterpart in mickwise/rust_timeseries —
this is a graft-added training-data-pipeline operator: before an eval
set can be trusted, every eval document must be checked for n-gram
overlap against the training corpus (the published recipe: GPT-3
appendix C uses 13-gram collision scans; Llama/PaLM reports use
8–13-word n-grams). The engine-side shape is what matters at 100 TB:

* one pass over each corpus deriving DISTINCT word n-grams per doc
  (JVM `split`/`transform`/`slice` — no Python in the hot path),
* the training side projected to a DISTINCT n-gram set (map-side
  partial aggregation collapses the heavy duplication before the
  shuffle),
* a single equi-join (LEFT SEMI shape) from exploded eval n-grams to
  that set, partial-counted per eval doc,
* a left join back to the eval docs so zero-gram / zero-hit documents
  keep a row (a doc shorter than n words has 0 n-grams and is clean by
  definition — dropping it would silently shrink the eval set).

At real scale the train n-gram set is far larger than memory — the
equi-join shuffles both sides by n-gram, which Spark handles with AQE;
a lower-cost screen (bloom filter on train n-grams pushed into the
eval scan) is a config-level optimization of the same plan, not a
different algorithm. N-grams stay as strings so any SQL engine can
recompute the pipeline exactly (the driver oracle is live DuckDB SQL);
a production variant may xxhash64 them to fixed 8-byte keys to shrink
the shuffle — same join, smaller payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(text_col: str, n: int):
    """Array of DISTINCT word ``n``-grams of a whitespace-tokenized
    text column (empty array when the doc has fewer than ``n`` words).
    Pure built-in expressions — stays inside whole-stage codegen."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    ws = f"split({text_col}, ' ')"
    return F.expr(
        f"CASE WHEN size({ws}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({ws}) - {n}), "
        f"i -> array_join(slice({ws}, i + 1, {n}), ' '))) "
        f"ELSE array() END"
    )


def ngram_overlap(
    eval_df: DataFrame,
    train_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per eval document: ``n_ngrams`` (distinct word n-grams),
    ``n_hit`` (how many of them appear in ANY training document) and
    ``contaminated`` (1 when ``n_hit > 0``). One row per eval doc,
    including docs with zero n-grams."""
    # bind the word split to a column first: higher-order functions are
    # CodegenFallback, so a split() nested inside the transform lambda
    # is re-evaluated PER ELEMENT (O(m²) splits per doc); a
    # multi-referenced non-cheap alias is kept materialized once per
    # row by CollapseProject. The eval-side gram table is additionally
    # checkpointed — it feeds both the explode and the per-doc size
    # projection.
    ws = "_rts_ws"
    grams_ws = F.expr(
        f"CASE WHEN size({ws}) >= {n} THEN "
        f"array_distinct(transform(sequence(0, size({ws}) - {n}), "
        f"i -> array_join(slice({ws}, i + 1, {n}), ' '))) "
        f"ELSE array() END"
    )
    ev = (
        eval_df.withColumn(ws, F.split(F.col(text_col), " "))
        .select(F.col(id_col), grams_ws.alias("grams"))
        .localCheckpoint()
    )
    ev_g = ev.select(id_col, F.explode("grams").alias("g"))
    train_g = (
        train_df.withColumn(ws, F.split(F.col(text_col), " "))
        .select(F.explode(grams_ws).alias("g"))
        .distinct()
    )
    hits = (
        ev_g.join(train_g, "g", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    base = ev.select(id_col, F.size("grams").cast("long").alias("n_ngrams"))
    return (
        base.join(hits, id_col, "left")
        .select(
            id_col,
            "n_ngrams",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.when(F.coalesce(F.col("n_hit"), F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("contaminated"),
        )
    )
