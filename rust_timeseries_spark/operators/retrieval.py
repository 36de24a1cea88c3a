"""Lexical retrieval: BM25 scoring and top-k search over a document
table.

Reference scope note: the reference engine (mickwise/rust_timeseries)
has no retrieval surface — this is a graft-added training-data-pipeline
operator: corpus curation needs lexical search (finding documents
matching probe queries — eval-leak auditing, targeted subset pulls,
quality probes) next to the embedding ANN path
(``operators/similarity.py``). BM25 (Robertson/Spärck Jones; the
Lucene-standard formulation) is the canonical scoring function.

Shape at 100 TB — everything is equi-joins and aggregates:

* one pass over the corpus builds per-(doc, term) frequencies and
  per-doc lengths (explode → two-phase count — map-side partial
  aggregation collapses the Zipf head before the shuffle);
* document frequencies come from a second aggregate over distinct
  (term, doc) — the posting-list cardinalities;
* the query set (thousands of rows at most) BROADCASTS onto the
  posting lists: per-(query, term) hits never shuffle the corpus side;
* scores aggregate per (query, doc) and a per-query window takes
  top-k. The only data-proportional shuffles are keyed by term and by
  (query, doc) — no cartesian anywhere.

IDF uses the Lucene/BM25+ form ``ln(1 + (N − df + 0.5)/(df + 0.5))``,
which is positive for every df (the classic form goes negative past
df > N/2 and Lucene pins it for exactly that reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: BM25 defaults (Robertson et al.; Lucene ships the same)
BM25_K1 = 1.2
BM25_B = 0.75


def doc_term_freqs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, dl): whitespace term frequencies plus the
    document length in tokens. One explode + one two-phase aggregate."""
    words = F.split(F.col(text_col), " ")
    exploded = docs.select(
        F.col(id_col), F.size(words).alias("dl"), F.explode(words).alias("term")
    )
    return exploded.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"), F.first("dl").cast("long").alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query",
    round_dp: int | None = 9,
) -> DataFrame:
    """Top-``k`` documents per query under BM25.

    Returns (query_id, doc_id, score, rank) with rank 1..k per query;
    ties broken by ascending doc_id AFTER rounding the score to
    ``round_dp`` decimals — float scores that differ only past the
    rounding grid would otherwise make the ranking engine-dependent
    (the same float-tie hazard the topk_sources gate hit; round-before-
    rank is the pinned convention). Pass ``round_dp=None`` for raw
    float ordering when cross-engine stability is not needed.

    The query table broadcasts (query sets are small); corpus-side work
    is posting-list equi-joins keyed by term. Scores are plain IEEE
    double arithmetic — ``ln`` is the only transcendental — so a SQL
    engine reproduces them bit-for-bit.
    """
    # materialized once: the (doc, term) frequency table feeds the
    # corpus stats, the posting-list cardinalities AND the hit join —
    # without the checkpoint the explode + two-phase count runs 3×
    tf = doc_term_freqs(docs, id_col, text_col).localCheckpoint()
    # avgdl as exact-BIGINT sum / count, NOT F.avg: engines disagree on
    # avg-over-integers internals (Spark folds doubles in partition
    # order, DuckDB divides an exact integer sum) — one pinned division
    # of two exact values is bit-identical everywhere
    n_stats = tf.groupBy(id_col).agg(F.first("dl").alias("dl")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    q_terms = queries.select(
        F.col(qid_col), F.explode(F.array_distinct(F.split(F.col(qtext_col), " "))).alias("term")
    )
    # the two corpus scalars (N, avgdl) attach via a broadcast join on a
    # unit key. BOTH keys must be runtime-opaque column expressions
    # (pmod(x, 1) — always 0, never constant-folded): a literal key on
    # either side gets rewritten into a pushed filter, the equi-
    # condition disappears, and the join degrades to a nested-loop node
    hits = (
        tf.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df_t.join(F.broadcast(q_terms.select("term").distinct()), "term")), "term")
        .withColumn("_one", F.pmod(F.col("tf"), F.lit(1)).cast("int"))
        .join(
            F.broadcast(
                n_stats.withColumn("_one", F.pmod(F.col("n_docs"), F.lit(1)).cast("int"))
            ),
            "_one",
        )
        .drop("_one")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_c = F.col("tf").cast("double")
    denom = tf_c + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * tf_c * F.lit(k1 + 1.0) / denom
    # per-(query, doc) score = ordered fold of the ≤|query| per-term
    # contributions in TERM order — F.sum's partition-order float
    # addition is nondeterministic across engines; sorting by term pins
    # one IEEE summation order that any SQL engine reproduces
    scores = (
        hits.withColumn("_c", contrib)
        .groupBy(qid_col, id_col)
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(term, _c))), "
                "CAST(0 AS DOUBLE), (s, x) -> s + x._c)"
            ).alias("score")
        )
    )
    rank_score = (
        F.round(F.col("score"), round_dp) if round_dp is not None else F.col("score")
    )
    w = Window.partitionBy(qid_col).orderBy(rank_score.desc(), F.col(id_col).asc())
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "score", F.col("rank").cast("long").alias("rank"))
    )
