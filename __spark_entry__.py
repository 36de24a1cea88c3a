"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operators (SURVEY.md §2) over the
driver testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL.

Conventions shared by every (query, oracle) pair so the driver's
row-count/schema/value-hash compare is stable:

* Bucket timestamps are **epoch-second bigints** computed with integer
  arithmetic (``es - es % width``) on both sides — timezone-independent.
* Double aggregates whose inputs are 2-decimal values are ``round(x, 2)``
  (the true sum lies on the 0.01 grid, so rounding is exact); derived
  ratios are ``round(x, 4)``; statistical quantities are formatted
  ``%.5e`` (6 significant digits) so the compare is scale-free.
* Exact integer / min / max / string outputs are left unrounded.
* Recursive kernels (EWMA/ψ, forecasts) are not SQL-expressible → no
  oracle entry (driver records rows-only); their numerics are pinned by
  golden tests in tests/ instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_timeseries_spark.operators import gapfill, recursion, rolling, rollup  # noqa: E402
from rust_timeseries_spark.stats import acd as acd_stats  # noqa: E402
from rust_timeseries_spark.stats import el as el_stats  # noqa: E402
from rust_timeseries_spark.stats import hac as hac_stats  # noqa: E402
from rust_timeseries_spark.operators import dedup as dedup_ops  # noqa: E402
from rust_timeseries_spark.operators import similarity as sim_ops  # noqa: E402
from rust_timeseries_spark.operators import textops  # noqa: E402
from rust_timeseries_spark.operators import compress as compress_ops  # noqa: E402
from rust_timeseries_spark.operators import multimodal  # noqa: E402


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _r2(c):  # sums of 2-decimal inputs: exact on the 0.01 grid
    return F.round(c, 2)


def _r4(c):  # derived ratios
    return F.round(c, 4)


def _sci(c):  # scale-free 6-significant-digit compare for statistics
    c = c.cast("double")
    return F.when(c.isNotNull(), F.format_string("%.5e", c))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tier cascade on sf0.001 events — raw → 1m → 1h →
    1d — with derived means at the 1h tier (the engine's §7.0 slice)."""
    ev = _events(spark, "/root/testdata/sf0.001")
    t1m = rollup.rollup_raw(ev, "1m", keys=["event_type"], ts_col="ts", value_col="value", epoch=True)
    t1h = rollup.fold_up(t1m, "1h", keys=["event_type"], epoch=True)
    return rollup.with_mean(t1h)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _q_rollup_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = rollup.rollup_raw(_events(spark, sf_dir), "1m", ["event_type"], "ts", "value", epoch=True)
    return t.select(
        "event_type", "bucket_ts", _r2(F.col("tok_sum")).alias("tok_sum"),
        "tok_count", "tok_min", "tok_max",
    )


_SQL_ROLLUP_1M = """
WITH e AS (
  SELECT event_type,
         es - es % 60 AS bucket_ts, value
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
)
SELECT event_type, bucket_ts,
       round(sum(value), 2) AS tok_sum,
       count(value) AS tok_count,
       min(value) AS tok_min,
       max(value) AS tok_max
FROM e GROUP BY event_type, bucket_ts
"""


def _q_rollup_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1m = rollup.rollup_raw(_events(spark, sf_dir), "1m", ["event_type"], "ts", "value", epoch=True)
    t1h = rollup.with_mean(rollup.fold_up(t1m, "1h", keys=["event_type"], epoch=True))
    return t1h.select(
        "event_type", "bucket_ts", _r2(F.col("tok_sum")).alias("tok_sum"),
        "tok_count", "tok_min", "tok_max",
        (_r2(F.col("tok_sum")) / F.col("tok_count")).alias("tok_mean"),
    )


_SQL_ROLLUP_1H = """
WITH e AS (
  SELECT event_type, es - es % 3600 AS bucket_ts, value
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
)
SELECT event_type, bucket_ts,
       round(sum(value), 2) AS tok_sum,
       count(value) AS tok_count,
       min(value) AS tok_min,
       max(value) AS tok_max,
       round(sum(value), 2) / count(value) AS tok_mean
FROM e GROUP BY event_type, bucket_ts
"""


def _q_rollup_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1m = rollup.rollup_raw(_events(spark, sf_dir), "1m", ["event_type"], "ts", "value", epoch=True)
    t1h = rollup.fold_up(t1m, "1h", keys=["event_type"], epoch=True)
    t1d = rollup.fold_up(t1h, "1d", keys=["event_type"], epoch=True)
    return t1d.select(
        "event_type", "bucket_ts", _r2(F.col("tok_sum")).alias("tok_sum"),
        "tok_count", "tok_min", "tok_max",
    )


_SQL_ROLLUP_1D = """
WITH e AS (
  SELECT event_type, es - es % 86400 AS bucket_ts, value
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
)
SELECT event_type, bucket_ts,
       round(sum(value), 2) AS tok_sum,
       count(value) AS tok_count,
       min(value) AS tok_min,
       max(value) AS tok_max
FROM e GROUP BY event_type, bucket_ts
"""


def _q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = rollup.grouping_rollup(
        _events(spark, sf_dir).withColumnRenamed("event_type", "source"),
        "1d", "ts", "value", epoch=True,
    )
    return g.select(
        "source", "bucket_ts", _r2(F.col("tok_sum")).alias("tok_sum"),
        "tok_count", F.col("grouping_level").cast("int").alias("grouping_level"),
    )


_SQL_GROUPING_SETS = """
WITH e AS (
  SELECT event_type AS source, es - es % 86400 AS bucket_ts, value
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
)
SELECT source, bucket_ts,
       round(sum(value), 2) AS tok_sum,
       count(value) AS tok_count,
       CAST(CASE WHEN GROUPING(source) = 1 THEN 3
                 WHEN GROUPING(bucket_ts) = 1 THEN 1
                 ELSE 0 END AS INTEGER) AS grouping_level
FROM e GROUP BY ROLLUP (source, bucket_ts)
"""


def _q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1d = rollup.rollup_raw(_events(spark, sf_dir), "1d", ["event_type"], "ts", "value", epoch=True)
    top = rollup.top_k_sources(t1d.withColumnRenamed("event_type", "source"), k=3)
    return top.select("source", _r2(F.col("total_tok")).alias("total_tok"))


_SQL_TOPK = """
SELECT event_type AS source, round(sum(value), 2) AS total_tok
FROM events GROUP BY event_type
ORDER BY sum(value) DESC, event_type ASC LIMIT 3
"""


def _q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    t1h = t1h.withColumn("tok_sum", _r2(F.col("tok_sum")))
    r = rolling.rolling_stats(t1h, "tok_sum", k=3, keys=["event_type"], order_col="bucket_ts")
    return r.select(
        "event_type", "bucket_ts",
        (_r2(F.col("roll_sum")) / F.col("roll_count")).alias("roll_mean"),
        _r2(F.col("roll_min")).alias("roll_min"),
        _r2(F.col("roll_max")).alias("roll_max"),
        _r2(F.col("roll_sum")).alias("roll_sum"),
        _sci(F.col("roll_std")).alias("roll_std"),
        "roll_count",
    )


_SQL_ROLLING = """
WITH b AS (
  SELECT event_type, es - es % 3600 AS bucket_ts, round(sum(value), 2) AS tok_sum
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY event_type, bucket_ts
)
SELECT event_type, bucket_ts,
       round(sum(tok_sum) OVER w, 2) / count(tok_sum) OVER w AS roll_mean,
       round(min(tok_sum) OVER w, 2) AS roll_min,
       round(max(tok_sum) OVER w, 2) AS roll_max,
       round(sum(tok_sum) OVER w, 2) AS roll_sum,
       printf('%.5e', stddev_samp(tok_sum) OVER w) AS roll_std,
       count(tok_sum) OVER w AS roll_count
FROM b
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def _q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    dense = gapfill.densify(t1h, "1h", keys=["event_type"])
    filled = gapfill.locf(dense, ["tok_sum"], keys=["event_type"])
    return filled.select(
        "event_type", "bucket_ts", _r2(F.col("tok_sum")).alias("tok_sum_locf"), "tok_count"
    )


_SQL_GAPFILL_LOCF = """
WITH b AS (
  SELECT event_type, es - es % 3600 AS bucket_ts,
         sum(value) AS tok_sum, count(value) AS tok_count
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY event_type, bucket_ts
),
bounds AS (SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM b GROUP BY event_type),
spine AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket_ts FROM bounds),
dense AS (
  SELECT s.event_type, s.bucket_ts, b.tok_sum, coalesce(b.tok_count, 0) AS tok_count
  FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.bucket_ts = b.bucket_ts
)
SELECT event_type, bucket_ts,
       round(last_value(tok_sum IGNORE NULLS) OVER
         (PARTITION BY event_type ORDER BY bucket_ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS tok_sum_locf,
       tok_count
FROM dense
"""


def _q_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    dense = gapfill.densify(
        t1h.select("event_type", "bucket_ts", _r2(F.col("tok_sum")).alias("tok_sum")), "1h", keys=["event_type"]
    )
    filled = gapfill.interpolate_linear(dense, ["tok_sum"], keys=["event_type"])
    return filled.select("event_type", "bucket_ts", F.col("tok_sum").alias("tok_sum_interp"))


_SQL_GAPFILL_LINEAR = """
WITH b AS (
  SELECT event_type, es - es % 3600 AS bucket_ts, round(sum(value), 2) AS tok_sum
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY event_type, bucket_ts
),
bounds AS (SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM b GROUP BY event_type),
spine AS (SELECT event_type, unnest(generate_series(lo, hi, 3600)) AS bucket_ts FROM bounds),
dense AS (
  SELECT s.event_type, s.bucket_ts, b.tok_sum
  FROM spine s LEFT JOIN b ON s.event_type = b.event_type AND s.bucket_ts = b.bucket_ts
),
anch AS (
  SELECT event_type, bucket_ts, tok_sum,
         last_value(tok_sum IGNORE NULLS) OVER wb AS prev_v,
         first_value(tok_sum IGNORE NULLS) OVER wf AS next_v,
         last_value(CASE WHEN tok_sum IS NOT NULL THEN CAST(bucket_ts AS DOUBLE) END IGNORE NULLS) OVER wb AS prev_t,
         first_value(CASE WHEN tok_sum IS NOT NULL THEN CAST(bucket_ts AS DOUBLE) END IGNORE NULLS) OVER wf AS next_t
  FROM dense
  WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY event_type ORDER BY bucket_ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket_ts,
       CASE
         WHEN tok_sum IS NOT NULL THEN CAST(tok_sum AS DOUBLE)
         WHEN prev_v IS NULL THEN CAST(next_v AS DOUBLE)
         WHEN next_v IS NULL THEN CAST(prev_v AS DOUBLE)
         ELSE prev_v + (next_v - prev_v) * ((CAST(bucket_ts AS DOUBLE) - prev_t) / (next_t - prev_t))
       END AS tok_sum_interp
FROM anch
"""


def _q_lag_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    m = rolling.lag_moments(
        t1h.select("event_type", "bucket_ts", (_r2(F.col("tok_sum")) / F.col("tok_count")).alias("v")),
        "v", max_lag=3, keys=["event_type"], order_col="bucket_ts",
    )
    return m.select(
        "event_type", "lag",
        _sci(F.col("gamma_j")).alias("gamma_j"),
        _sci(F.col("tau_j")).alias("tau_j"),
        _sci(F.col("rho_tilde_sq")).alias("rho_tilde_sq"),
    )


_SQL_LAG_MOMENTS = """
WITH b AS (
  SELECT event_type, es - es % 3600 AS bucket_ts, round(sum(value), 2) / count(value) AS v
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY event_type, bucket_ts
),
m AS (SELECT event_type, avg(v) AS ybar, count(*) AS n FROM b GROUP BY event_type),
d AS (
  SELECT b.event_type, b.bucket_ts, b.v - m.ybar AS dev, m.n
  FROM b JOIN m ON b.event_type = m.event_type
),
lagged AS (
  SELECT event_type, n, dev,
         lag(dev, 1) OVER w AS l1, lag(dev, 2) OVER w AS l2, lag(dev, 3) OVER w AS l3
  FROM d WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts)
),
stacked AS (
  SELECT event_type, n, 1 AS lag, dev * l1 AS g, dev * dev * l1 * l1 AS tau FROM lagged WHERE l1 IS NOT NULL
  UNION ALL
  SELECT event_type, n, 2 AS lag, dev * l2 AS g, dev * dev * l2 * l2 AS tau FROM lagged WHERE l2 IS NOT NULL
  UNION ALL
  SELECT event_type, n, 3 AS lag, dev * l3 AS g, dev * dev * l3 * l3 AS tau FROM lagged WHERE l3 IS NOT NULL
)
SELECT event_type, lag,
       printf('%.5e', sum(g) / (max(n) - lag)) AS gamma_j,
       printf('%.5e', sum(tau) / (max(n) - lag)) AS tau_j,
       printf('%.5e', (sum(g) / (max(n) - lag)) ^ 2 / (sum(tau) / (max(n) - lag))) AS rho_tilde_sq
FROM stacked GROUP BY event_type, lag
"""


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct_text"),
        )
        .withColumn("n_dupes", F.col("n_docs") - F.col("n_distinct_text"))
    )


_SQL_DEDUP_EXACT = """
SELECT source, count(*) AS n_docs,
       count(DISTINCT md5(text)) AS n_distinct_text,
       count(*) - count(DISTINCT md5(text)) AS n_dupes
FROM documents GROUP BY source
"""


def _q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    uniq = F.array_distinct(words)
    return d.select(
        "doc_id", "source",
        F.size(words).alias("n_ws_tokens"),
        F.size(uniq).alias("n_distinct_tokens"),
        (F.size(uniq).cast("double") / F.size(words)).alias("ttr"),
        (F.col("n_chars").cast("double") / F.size(words)).alias("chars_per_token"),
    )


_SQL_DOC_TOKENS = """
SELECT doc_id, source,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr,
       CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
FROM documents
"""


#: document-frequency cap for the word-level Jaccard driver query — words
#: in more documents than this leave both the inverted index and the set
#: sizes (the hot-token scale guard, operators/dedup.py max_df); mirrored
#: exactly by the oracle's df-filtered word table. 250 keeps the result
#: non-degenerate at every tested scale (9 pairs at sf0.01, ~1.5k at
#: sf0.1) while bounding any one token's join contribution to ≤ 250²/2
#: rows.
_JACCARD_MAX_DF = 250


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup_ops.ngram_jaccard_pairs(
        _documents(spark, sf_dir), group_col="source", shingle_k=1, max_df=_JACCARD_MAX_DF
    )
    return out.select(
        F.col("id_a").alias("d1"), F.col("id_b").alias("d2"),
        "inter", "union_sz", "jaccard",
    )


_SQL_JACCARD = f"""
WITH w0 AS (
  SELECT doc_id, source, unnest(list_distinct(string_split(text, ' '))) AS word FROM documents
),
hot AS (SELECT word FROM w0 GROUP BY word HAVING count(*) > {_JACCARD_MAX_DF}),
w AS (SELECT * FROM w0 WHERE word NOT IN (SELECT word FROM hot)),
sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
  FROM w a JOIN w b ON a.word = b.word AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, inter,
       s1.sz + s2.sz - inter AS union_sz,
       CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
FROM inter JOIN sz s1 ON inter.d1 = s1.doc_id JOIN sz s2 ON inter.d2 = s2.doc_id
"""


def _q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _embeddings(spark, sf_dir)
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    return e.select("vec_id", "label", F.size("embedding").alias("dim"), _sci(F.sqrt(sq)).alias("l2_norm"))


_SQL_EMBEDDING_NORMS = """
SELECT vec_id, label, len(embedding) AS dim,
       printf('%.5e', sqrt(sq)) AS l2_norm
FROM (
  SELECT vec_id, label, embedding,
         (SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM unnest(embedding) AS t(x)) AS sq
  FROM embeddings
)
"""


_SQL_EWMA = """
WITH RECURSIVE b AS (
  SELECT event_type AS key, es - es % 3600 AS t, round(sum(value), 2) / count(value) AS v
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY key, t
),
idx AS (
  SELECT key, t, v, row_number() OVER (PARTITION BY key ORDER BY t) AS i,
         sum(v) OVER (PARTITION BY key) / count(*) OVER (PARTITION BY key) AS m
  FROM b
),
rec AS (
  SELECT key, 1 AS i, 0.3 * m + 0.7 * m AS psi FROM idx WHERE i = 1
  UNION ALL
  SELECT r.key, r.i + 1, 0.3 * x.v + 0.7 * r.psi
  FROM rec r JOIN idx x ON x.key = r.key AND x.i = r.i
)
SELECT idx.key, idx.t, idx.v AS v, printf('%.5e', rec.psi) AS ewma
FROM rec JOIN idx ON idx.key = rec.key AND idx.i = rec.i
"""


def _q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA over hourly mean series — the ψ recursion as a DuckDB
    RECURSIVE CTE oracle: ψ_1 = α·m + β·m (sample-mean seed), then
    ψ_{i+1} = α·x_i + β·ψ_i — the same op order as the kernel, so values
    match to %.5e (the sample means differ at 1 ulp between engines)."""
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    series = t1h.select(
        F.col("event_type").alias("key"), F.col("bucket_ts").alias("t"),
        (_r2(F.col("tok_sum")) / F.col("tok_count")).alias("v"),
    )
    return recursion.ewma(series, ["key"], alpha=0.3, order_col="t").select(
        "key", "t", "v", _sci(F.col("psi")).alias("ewma")
    )


_SQL_FORECAST = """
WITH RECURSIVE b AS (
  SELECT event_type AS key, es - es % 3600 AS t, round(sum(value), 2) / count(value) AS v
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY key, t
),
idx AS (
  SELECT key, t, v, row_number() OVER (PARTITION BY key ORDER BY t) AS i,
         count(*) OVER (PARTITION BY key) AS n
  FROM b
),
rec AS (
  SELECT key, 1 AS i, n,
         0.2 + 0.2 * (0.2 / (1.0 - 0.2 - 0.3)) + 0.3 * (0.2 / (1.0 - 0.2 - 0.3)) AS psi
  FROM idx WHERE i = 1
  UNION ALL
  SELECT r.key, r.i + 1, r.n, 0.2 + 0.2 * x.v + 0.3 * r.psi
  FROM rec r JOIN idx x ON x.key = r.key AND x.i = r.i
  WHERE r.i < r.n
),
tail AS (
  SELECT rec.key, rec.psi AS psi_T, x.v AS x_T
  FROM rec JOIN idx x ON x.key = rec.key AND x.i = rec.i
  WHERE rec.i = rec.n
),
fc AS (
  SELECT key, 1 AS h, 0.2 + 0.2 * x_T + 0.3 * psi_T AS psi_hat FROM tail
  UNION ALL
  SELECT key, h + 1, 0.2 + 0.2 * psi_hat + 0.3 * psi_hat FROM fc WHERE h < 8
)
SELECT key, CAST(h AS INTEGER) AS h, printf('%.5e', psi_hat) AS psi_hat FROM fc
"""


def _q_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACD(1,1) ψ forecast per event_type: in-sample recursion (uncond-
    mean seed) + H-step roll-forward, both mirrored as DuckDB RECURSIVE
    CTEs with the kernel's exact op order (ψ guards never bind at these
    magnitudes, so the clamp is a no-op on both sides)."""
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    series = t1h.select(
        F.col("event_type").alias("key"), F.col("bucket_ts").alias("t"),
        (_r2(F.col("tok_sum")) / F.col("tok_count")).alias("v"),
    )
    return recursion.acd_forecast(series, ["key"], omega=0.2, alpha=[0.2], beta=[0.3], horizon=8).select(
        "key", "h", _sci(F.col("psi_hat")).alias("psi_hat")
    )


def _hourly_mean_series(spark, sf_dir):
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    return t1h.select(
        F.col("event_type").alias("key"), F.col("bucket_ts").alias("t"),
        (_r2(F.col("tok_sum")) / F.col("tok_count")).alias("v"),
    )


def _q_el_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Escanciano-Lobato portmanteau per event_type over hourly means
    (engine kernel = exact reference math; oracle recomputes it in SQL)."""
    series = _hourly_mean_series(spark, sf_dir)
    out = el_stats.escanciano_lobato(series, ["key"], q=2.4, d=3)
    return out.select("key", "p_tilde", _sci(F.col("stat")).alias("stat"))


_SQL_EL_TEST = """
WITH b AS (
  SELECT event_type AS key, es - es % 3600 AS t, round(sum(value), 2) / count(value) AS v
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY key, t
),
m AS (SELECT key, sum(v) / count(*) AS ybar, count(*) AS n FROM b GROUP BY key),
d AS (SELECT b.key, b.t, b.v - m.ybar AS dev, m.n FROM b JOIN m ON b.key = m.key),
lagged AS (
  SELECT key, n, dev,
         lag(dev, 1) OVER w AS l1, lag(dev, 2) OVER w AS l2, lag(dev, 3) OVER w AS l3
  FROM d WINDOW w AS (PARTITION BY key ORDER BY t)
),
rho AS (
  SELECT key, max(n) AS n, lag,
         (sum(g) / (max(n) - lag)) ^ 2 / (sum(tau) / (max(n) - lag)) AS rho_sq
  FROM (
    SELECT key, n, 1 AS lag, dev * l1 AS g, dev*dev*l1*l1 AS tau FROM lagged WHERE l1 IS NOT NULL
    UNION ALL
    SELECT key, n, 2 AS lag, dev * l2 AS g, dev*dev*l2*l2 AS tau FROM lagged WHERE l2 IS NOT NULL
    UNION ALL
    SELECT key, n, 3 AS lag, dev * l3 AS g, dev*dev*l3*l3 AS tau FROM lagged WHERE l3 IS NOT NULL
  ) GROUP BY key, lag
),
l_vals AS (
  SELECT key, lag AS p,
         max(n) OVER (PARTITION BY key) * sum(rho_sq) OVER (PARTITION BY key ORDER BY lag) AS q_star,
         CASE WHEN sqrt(max(n) OVER (PARTITION BY key)) * max(sqrt(rho_sq)) OVER (PARTITION BY key)
                   <= sqrt(2.4 * ln(max(n) OVER (PARTITION BY key)))
              THEN lag * ln(max(n) OVER (PARTITION BY key))
              ELSE 2.0 * lag END AS penalty
  FROM rho
),
pick AS (
  SELECT key, p, q_star,
         row_number() OVER (PARTITION BY key ORDER BY q_star - penalty DESC, p ASC) AS rn
  FROM l_vals
)
SELECT key, CAST(p AS INTEGER) AS p_tilde, printf('%.5e', q_star) AS stat
FROM pick WHERE rn = 1
"""


def _q_hac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAC (Bartlett, bw=2, centered) of a 3-column score matrix — per
    event_type over its 1m bucket series (bucket_ts is a unique,
    deterministic time index; no row_number ties)."""
    t1m = rollup.rollup_raw(_events(spark, sf_dir), "1m", ["event_type"], "ts", "value", epoch=True)
    df = t1m.select(
        F.col("event_type").alias("key"),
        F.col("bucket_ts").alias("t"),
        F.array(
            _r2(F.col("tok_sum")),
            F.col("tok_count").cast("double"),
            F.col("tok_max"),
        ).alias("s"),
    )
    out = hac_stats.hac_covariance(df, ["key"], kernel="bartlett", bandwidth=2, center=True)
    return out.select(
        "key",
        F.posexplode("cov").alias("pos", "cov_val"),
    ).select(
        "key",
        (F.col("pos") / 3).cast("int").alias("i"),
        F.pmod(F.col("pos"), F.lit(3)).cast("int").alias("j"),
        _sci(F.col("cov_val")).alias("cov"),
    )


_SQL_HAC = """
WITH base AS (
  SELECT event_type AS key, es - es % 60 AS t,
         round(sum(value), 2) AS s0, CAST(count(value) AS DOUBLE) AS s1, max(value) AS s2
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
  GROUP BY key, t
),
ranked AS (
  SELECT key, row_number() OVER (PARTITION BY key ORDER BY t) AS t, s0, s1, s2 FROM base
),
m AS (SELECT key, count(*) AS n, avg(s0) AS m0, avg(s1) AS m1, avg(s2) AS m2 FROM ranked GROUP BY key),
long AS (
  SELECT b.key, b.t, u.i,
         CASE u.i WHEN 0 THEN b.s0 - m.m0 WHEN 1 THEN b.s1 - m.m1 ELSE b.s2 - m.m2 END AS v, m.n
  FROM ranked b JOIN m ON b.key = m.key
  CROSS JOIN (SELECT unnest(ARRAY[0, 1, 2]) AS i) u
),
gam AS (
  SELECT a.key, k.k, a.i AS i, b2.i AS j, sum(a.v * b2.v) AS raw, max(a.n) AS n
  FROM long a
  CROSS JOIN (SELECT unnest(ARRAY[0, 1, 2]) AS k) k
  JOIN long b2 ON a.key = b2.key AND a.t = b2.t + k.k
  GROUP BY a.key, k.k, a.i, b2.i
),
weighted AS (
  SELECT key, i, j,
         CASE WHEN k = 0 THEN raw / n
              ELSE (1.0 - k / 3.0) * (raw / (n - k)) END AS contrib,
         k
  FROM gam
),
sym AS (
  SELECT key, i, j, contrib FROM weighted
  UNION ALL
  SELECT key, j AS i, i AS j, contrib FROM weighted WHERE k > 0
)
SELECT key, CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       printf('%.5e', sum(contrib)) AS cov
FROM sym GROUP BY key, i, j
"""


def _duration_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival durations, normalized to unit mean —
    the reference's actual model domain (duration models fit durations,
    not level series).  Deterministic float path: epoch seconds are
    distinct bigints per key, durations are exact integer gaps, the key
    mean is an exact integer sum / count, and the normalized value is
    one IEEE division — identical doubles in Spark and DuckDB."""
    ev = _events(spark, sf_dir)
    es = rollup.epoch_seconds(F.col("ts"), dict(ev.dtypes)["ts"])
    base = ev.select(F.col("event_type").alias("key"), es.alias("t")).distinct()
    w = W.partitionBy("key").orderBy("t")
    d = base.withColumn("dur", F.col("t") - F.lag("t").over(w)).where(F.col("dur").isNotNull())
    wk = W.partitionBy("key")
    mean = F.sum("dur").over(wk).cast("double") / F.count("dur").over(wk)
    return d.select("key", "t", (F.col("dur").cast("double") / mean).alias("v"))


def _q_acd_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACD(1,1) MLE per event_type over unit-mean inter-arrival
    durations, verified the way the reference's integration test
    verifies a fit (tests/integration_acd_pipline.rs:257-315:
    fit-success + downstream properties, not optimizer internals):

    * ``loglik0`` — ℓ at FIXED θ₀=(ω=0.2, α=0.2, β=0.3): the
      deterministic ψ-recursion + logpdf sum, recomputed by the oracle
      as a RECURSIVE CTE with the kernel's exact op order;
    * ``converged`` — the real optimizer (L-BFGS + More–Thuente) ran to
      convergence on every key;
    * ``fit_improved`` — ℓ(θ̂) ≥ ℓ(θ₀): the fitted parameters beat the
      fixed reference point.

    The fitted values themselves are pinned by tests/test_acd.py
    (golden kernels + simulate→recover)."""
    series = _duration_series(spark, sf_dir)
    spec = acd_stats.AcdSpec(p=1, q=1)
    fit = acd_stats.acd_fit(series, ["key"], spec)
    ll0 = acd_stats.acd_loglik_fixed(series, ["key"], spec, omega=0.2, alpha=[0.2], beta=[0.3])
    return (
        fit.select("key", "converged", "loglik")
        .join(ll0.withColumnRenamed("loglik", "loglik0"), "key")
        .select(
            "key",
            _sci(F.col("loglik0")).alias("loglik0"),
            "converged",
            (F.col("loglik") >= F.col("loglik0")).alias("fit_improved"),
        )
    )


_SQL_ACD_FIT = """
WITH RECURSIVE e AS (
  SELECT DISTINCT event_type AS key, CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events
),
d AS (
  SELECT key, t, t - lag(t) OVER (PARTITION BY key ORDER BY t) AS dur FROM e
),
s AS (
  SELECT key, t,
         CAST(dur AS DOUBLE) / (CAST(sum(dur) OVER (PARTITION BY key) AS DOUBLE)
                                / count(dur) OVER (PARTITION BY key)) AS v
  FROM d WHERE dur IS NOT NULL
),
idx AS (
  SELECT key, t, v, row_number() OVER (PARTITION BY key ORDER BY t) AS i,
         count(*) OVER (PARTITION BY key) AS n
  FROM s
),
rec AS (
  -- psi_1 = omega + alpha*mu0 + beta*mu0, mu0 = omega/(1-alpha-beta) — the
  -- kernel's uncond-mean init (psi.rs:403-427) and exact op order
  SELECT key, 1 AS i, n,
         0.2 + 0.2 * (0.2 / (1.0 - 0.2 - 0.3)) + 0.3 * (0.2 / (1.0 - 0.2 - 0.3)) AS psi
  FROM idx WHERE i = 1
  UNION ALL
  SELECT r.key, r.i + 1, r.n, 0.2 + 0.2 * x.v + 0.3 * r.psi
  FROM rec r JOIN idx x ON x.key = r.key AND x.i = r.i
  WHERE r.i < r.n
),
ll AS (
  SELECT rec.key, sum(-(x.v / rec.psi) - ln(rec.psi)) AS loglik0
  FROM rec JOIN idx x ON x.key = rec.key AND x.i = rec.i
  GROUP BY rec.key
)
SELECT key, printf('%.5e', loglik0) AS loglik0,
       TRUE AS converged, TRUE AS fit_improved
FROM ll
"""


def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = textops.with_quality_score(textops.with_token_counts(_documents(spark, sf_dir)))
    return d.select(
        "doc_id", "n_ws_tokens", "n_distinct_tokens", "ttr",
        "mean_word_len", "alpha_ratio", "dup_word_ratio", "quality_score",
    )


_SQL_TEXT_QUALITY = """
WITH w AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n_words,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       n_words AS n_ws_tokens,
       len(list_distinct(words)) AS n_distinct_tokens,
       CAST(len(list_distinct(words)) AS DOUBLE) / n_words AS ttr,
       CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio,
       1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / n_words AS dup_word_ratio,
       0.3 * (CASE WHEN CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words >= 2.0
                    AND CAST(n_chars - (n_words - 1) AS DOUBLE) / n_words <= 12.0 THEN 1.0 ELSE 0.0 END)
       + 0.3 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / greatest(n_chars, 1))
       + 0.2 * (CAST(len(list_intersect(words, ['the','and','of','to','a','in','is','it','that','for'])) AS DOUBLE) / 10)
       + 0.2 * (1.0 - (1.0 - CAST(len(list_distinct(words)) AS DOUBLE) / n_words)) AS quality_score
FROM w
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.with_lang_id(_documents(spark, sf_dir)).select("doc_id", "lang_pred", "lang_hits")


_SQL_LANG_ID = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
hits AS (
  SELECT doc_id, l.lang,
         len(list_filter(words, x -> list_contains(l.stop, x))) AS hits
  FROM w
  CROSS JOIN (
    SELECT * FROM (VALUES
      ('de', ['der','die','das','und','ist','nicht','ein','mit','für','auf']),
      ('en', ['the','and','of','to','a','in','is','it','that','for']),
      ('es', ['el','la','los','que','de','es','un','una','por','para']),
      ('fr', ['le','la','les','et','est','un','une','pour','dans','que'])
    ) t(lang, stop)
  ) l
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
  FROM hits
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS lang_pred,
       hits AS lang_hits
FROM best WHERE rn = 1
"""


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup fingerprints (md5 variants so DuckDB can mirror them)."""
    d = _documents(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    bag = F.array_join(F.array_sort(F.array_distinct(F.split(norm, " "))), " ")
    return d.select(
        "doc_id", "source",
        F.md5(norm).alias("fp_exact_md5"),
        F.md5(bag).alias("fp_bag_md5"),
    )


_SQL_FINGERPRINTS = """
SELECT doc_id, source,
       md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_exact_md5,
       md5(array_to_string(list_sort(list_distinct(string_split(
            regexp_replace(lower(text), '\s+', ' ', 'g'), ' '))), ' ')) AS fp_bag_md5
FROM documents
"""


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries."""
    emb = _embeddings(spark, sf_dir)
    qs = emb.where(F.col("vec_id") < 10)
    out = sim_ops.cosine_topk_bruteforce(emb, qs, k=5)
    return out.select("query_id", "corpus_id", "rank", _sci(F.col("cosine")).alias("cosine"))


_SQL_KNN = """
WITH v AS (
  SELECT vec_id, embedding,
         sqrt((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM unnest(embedding) AS t(x))) AS nrm
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, embedding AS qe, nrm AS qn FROM v WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, v.vec_id AS corpus_id,
         list_dot_product(CAST(q.qe AS DOUBLE[]), CAST(v.embedding AS DOUBLE[])) / (q.qn * v.nrm) AS cosine
  FROM q JOIN v ON v.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, corpus_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, corpus_id, CAST(rank AS INTEGER) AS rank, printf('%.5e', cosine) AS cosine
FROM ranked WHERE rank <= 5
"""


def _q_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (signatures/banding are engine-native
    xxhash64 — rows-only; semantics tested in tests/test_dataops.py)."""
    return dedup_ops.minhash_dedup_pairs(
        _documents(spark, sf_dir), shingle_k=3, num_perm=32, bands=8,
        rows_per_band=4, threshold=0.5,
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at the guaranteed-recall radius: 8×8-bit
    chunk buckets cover Hamming distance ≤ 7 by pigeonhole, so the
    engine output equals the exact all-pairs result — which the frozen
    oracle recomputes independently (pure-Python xxhash64 + bit-vote,
    tools/gen_frozen_oracles.py) and pins as a VALUES literal."""
    return dedup_ops.simhash_near_pairs(_documents(spark, sf_dir), max_hamming=7, n_chunks=8)


def _q_compression_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla/delta-of-delta round-trip: the 1h tier is packed into
    per-(key, day) binary blocks and decoded back; the oracle is the
    plain 1h rollup — exact equality proves decode∘encode = identity.
    tok_sum is scaled to integer centi-units for the int64 codec."""
    t1h = rollup.rollup_raw(_events(spark, sf_dir), "1h", ["event_type"], "ts", "value", epoch=True)
    t1h = t1h.select(
        F.col("event_type").alias("source"), "bucket_ts",
        F.round(F.col("tok_sum") * 100).cast("long").alias("tok_sum"),
        "tok_count",
        F.round(F.col("tok_min") * 100).cast("long").alias("tok_min"),
        F.round(F.col("tok_max") * 100).cast("long").alias("tok_max"),
    )
    blocks = compress_ops.compress_tier(t1h, "1d")
    back = compress_ops.decompress_blocks(blocks)
    return back.select(
        F.col("source").alias("event_type"), "bucket_ts",
        "tok_sum", "tok_count", "tok_min", "tok_max",
    )


_SQL_COMPRESSION_ROUNDTRIP = """
WITH e AS (
  SELECT event_type, es - es % 3600 AS bucket_ts, value
  FROM (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es, value FROM events)
)
SELECT event_type, bucket_ts,
       CAST(round(sum(value) * 100) AS BIGINT) AS tok_sum,
       count(value) AS tok_count,
       CAST(round(min(value) * 100) AS BIGINT) AS tok_min,
       CAST(round(max(value) * 100) AS BIGINT) AS tok_max
FROM e GROUP BY event_type, bucket_ts
"""


#: synthetic media fixture sizes for the multimodal driver queries —
#: deterministic and sf-independent (there is no binary testdata table;
#: payloads are generated from closed-form integer formulas so the
#: oracle recomputes features WITHOUT the binary containers, proving
#: decode∘encode = identity + the feature math end-to-end)
_N_MEDIA = 240
_N_AUDIO = 60


def _q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real BMP/PPM decode: per-source means of per-image resized
    channel means. The oracle derives the same numbers from the pixel
    formula (multimodal.media_pixel_formula) in pure SQL."""
    media = multimodal.synthetic_media_table(spark, _N_MEDIA)
    feats = multimodal.image_features(media, resize_to=8)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("width").alias("sum_width"),
        F.sum("height").alias("sum_height"),
        _sci(F.avg(F.element_at("feat", 1))).alias("mean_r"),
        _sci(F.avg(F.element_at("feat", 2))).alias("mean_g"),
        _sci(F.avg(F.element_at("feat", 3))).alias("mean_b"),
    )


_SQL_IMAGE_FEATURES = f"""
WITH ids AS (SELECT unnest(range({_N_MEDIA})) AS id),
dims AS (
  SELECT id, 32 + (id * 13) % 97 AS w, 32 + (id * 17) % 61 AS h,
         (['web', 'books', 'video'])[(id % 3) + 1] AS source
  FROM ids
),
grid AS (
  SELECT d.id, d.w, d.h, d.source,
         (gy.i * (d.h - 1)) // 7 AS y, (gx.i * (d.w - 1)) // 7 AS x
  FROM dims d, (SELECT unnest(range(8)) AS i) gy, (SELECT unnest(range(8)) AS i) gx
),
px AS (
  SELECT g.id, g.source, g.w, g.h, ch.c,
         (7 * g.id + 3 * g.y + 5 * g.x + 11 * ch.c) % 256 AS v
  FROM grid g, (SELECT unnest(range(3)) AS c) ch
),
per_media AS (
  SELECT id, source, c, max(w) AS w, max(h) AS h, sum(v) / 64.0 AS chan_mean
  FROM px GROUP BY id, source, c
),
wide AS (
  SELECT id, source, max(w) AS w, max(h) AS h,
         max(CASE WHEN c = 0 THEN chan_mean END) AS m_r,
         max(CASE WHEN c = 1 THEN chan_mean END) AS m_g,
         max(CASE WHEN c = 2 THEN chan_mean END) AS m_b
  FROM per_media GROUP BY id, source
)
SELECT source, count(*) AS n_media,
       sum(w) AS sum_width, sum(h) AS sum_height,
       printf('%.5e', avg(m_r)) AS mean_r,
       printf('%.5e', avg(m_g)) AS mean_g,
       printf('%.5e', avg(m_b)) AS mean_b
FROM wide GROUP BY source
"""


def _q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV PCM16 decode: per-source clip counts, exact total
    samples / zero-crossings (int), mean RMS. Oracle recomputes the
    integer sawtooth (multimodal.audio_wave_formula) in SQL."""
    audio = multimodal.synthetic_audio_table(spark, _N_AUDIO)
    feats = multimodal.audio_features(audio)
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.sum("n_samples").alias("total_samples"),
        F.sum("zero_crossings").alias("total_zero_crossings"),
        _sci(F.avg("rms")).alias("mean_rms"),
    )


_SQL_AUDIO_FEATURES = f"""
WITH ids AS (SELECT unnest(range({_N_AUDIO})) AS id),
clips AS (
  SELECT id, 8000 * (1 + id % 3) AS n,
         (['web', 'books', 'video'])[(id % 3) + 1] AS source
  FROM ids
),
samples AS (
  SELECT c.id, c.n, c.source, s.i,
         ((s.i * (3 + c.id % 5) + c.id * 7) % 2001) - 1000 AS v
  FROM clips c, LATERAL (SELECT unnest(range(c.n)) AS i) s
),
lagged AS (
  SELECT id, n, source, v,
         lag(v) OVER (PARTITION BY id ORDER BY i) AS pv
  FROM samples
),
per_clip AS (
  SELECT id, source, max(n) AS n,
         sqrt(sum(CAST(v AS BIGINT) * v) / max(n)) AS rms,
         sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) != (pv >= 0)) THEN 1 ELSE 0 END) AS zc
  FROM lagged GROUP BY id, source
)
SELECT source, count(*) AS n_clips,
       sum(n) AS total_samples,
       sum(zc) AS total_zero_crossings,
       printf('%.5e', avg(rms)) AS mean_rms
FROM per_clip GROUP BY source
"""


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem — exercises the
    general multi-aggregate path (means via round2(sum)/count)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("2025-09-01").cast("timestamp_ntz")
    )
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        _r2(F.sum("l_quantity")).alias("sum_qty"),
        _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        F.count(F.lit(1)).alias("count_order"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )
    return g.withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))


_SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       count(*) AS count_order,
       min(l_quantity) AS min_qty,
       max(l_extendedprice) AS max_price,
       round(sum(l_quantity), 2) / count(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2025-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q_orders_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order rollup joined with the (broadcast) customer→nation→
    region dimension chain — the engine's J3 dimension-join pattern."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    dim = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("nation")
    )
    enriched = o.join(F.broadcast(dim), o.o_custkey == dim.c_custkey)
    day = rollup.bucket_col("o_orderdate", "1d", epoch=True, dtype=dict(o.dtypes)["o_orderdate"])
    return (
        enriched.groupBy("nation", day.alias("order_day"))
        .agg(
            _r2(F.sum("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_SQL_ORDERS_DIM_JOIN = """
SELECT n.n_name AS nation,
       es - es % 86400 AS order_day,
       round(sum(o.o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM (SELECT o_custkey, o_totalprice, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS es FROM orders) o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY nation, order_day
"""


def _q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate distinct users per (event_type, day): exact
    is oracle-checked; the HLL sketch column is engine-side only and
    therefore emitted as a bounded relative-error flag. The sketch runs
    at rsd=1% so the 5% assertion is a ≥5σ bound — deterministic-in-
    practice at every scale factor (the r1 default-rsd=5% sketch made
    1σ excursions past the 5% flag routine once sf0.1 cardinalities
    left HLL's exact small-range regime)."""
    ev = _events(spark, sf_dir)
    day = rollup.bucket_col("ts", "1d", epoch=True, dtype=dict(ev.dtypes)["ts"])
    g = ev.groupBy("event_type", day.alias("bucket_ts")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("_approx"),
    )
    return g.select(
        "event_type", "bucket_ts", "n_users",
        (F.abs(F.col("_approx") - F.col("n_users")) <= 0.05 * F.col("n_users") + 5).alias("hll_within_5pct"),
    )


_SQL_DISTINCT_USERS = """
SELECT event_type,
       es - es % 86400 AS bucket_ts,
       count(DISTINCT user_id) AS n_users,
       TRUE AS hll_within_5pct
FROM (SELECT event_type, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
GROUP BY event_type, bucket_ts
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "rollup_1m": _q_rollup_1m,
        "rollup_1h_fold": _q_rollup_1h,
        "rollup_1d_fold": _q_rollup_1d,
        "rollup_grouping_sets": _q_grouping_sets,
        "topk_sources": _q_topk,
        "rolling_stats_3h": _q_rolling,
        "gapfill_locf_1h": _q_gapfill_locf,
        "gapfill_linear_1h": _q_gapfill_linear,
        "lag_moments": _q_lag_moments,
        "dedup_exact": _q_dedup_exact,
        "doc_token_stats": _q_doc_tokens,
        "ngram_jaccard": _q_jaccard,
        "embedding_norms": _q_embedding_norms,
        "ewma_1h": _q_ewma,
        "acd_forecast_1h": _q_forecast,
        "el_test": _q_el_test,
        "hac_covariance": _q_hac,
        "acd_fit_durations": _q_acd_fit,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "dedup_fingerprints": _q_fingerprints,
        "embedding_knn": _q_knn,
        "dedup_minhash_lsh": _q_minhash_dedup,
        "dedup_simhash": _q_simhash,
        "image_features": _q_image_features,
        "audio_features": _q_audio_features,
        "compression_roundtrip": _q_compression_roundtrip,
        "pricing_summary": _q_pricing_summary,
        "orders_dim_join": _q_orders_dim_join,
        "distinct_users_1d": _q_distinct_users,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rollup_1m": _SQL_ROLLUP_1M,
        "rollup_1h_fold": _SQL_ROLLUP_1H,
        "rollup_1d_fold": _SQL_ROLLUP_1D,
        "rollup_grouping_sets": _SQL_GROUPING_SETS,
        "topk_sources": _SQL_TOPK,
        "rolling_stats_3h": _SQL_ROLLING,
        "gapfill_locf_1h": _SQL_GAPFILL_LOCF,
        "gapfill_linear_1h": _SQL_GAPFILL_LINEAR,
        "lag_moments": _SQL_LAG_MOMENTS,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "doc_token_stats": _SQL_DOC_TOKENS,
        "ngram_jaccard": _SQL_JACCARD,
        "embedding_norms": _SQL_EMBEDDING_NORMS,
        "el_test": _SQL_EL_TEST,
        "hac_covariance": _SQL_HAC,
        "ewma_1h": _SQL_EWMA,
        "acd_forecast_1h": _SQL_FORECAST,
        "text_quality": _SQL_TEXT_QUALITY,
        "lang_id": _SQL_LANG_ID,
        "dedup_fingerprints": _SQL_FINGERPRINTS,
        "embedding_knn": _SQL_KNN,
        "image_features": _SQL_IMAGE_FEATURES,
        "audio_features": _SQL_AUDIO_FEATURES,
        "compression_roundtrip": _SQL_COMPRESSION_ROUNDTRIP,
        "pricing_summary": _SQL_PRICING_SUMMARY,
        "orders_dim_join": _SQL_ORDERS_DIM_JOIN,
        "distinct_users_1d": _SQL_DISTINCT_USERS,
        "acd_fit_durations": _SQL_ACD_FIT,
        # dedup_minhash_lsh / dedup_simhash hash with Spark-native
        # xxhash64, which DuckDB cannot recompute live. Their oracles are
        # FROZEN VALUES literals produced by an INDEPENDENT pure-Python
        # recompute of each pipeline (tools/gen_frozen_oracles.py —
        # xxh64 reimplementation pinned against F.xxhash64 by pytest),
        # verified equal to the engine output before freezing. Valid at
        # the driver's correctness scale (sf0.01, deterministic seed-42
        # testdata).
        **_frozen_oracles(),
    }


#: queries whose oracle is a frozen literal (skip at other scale factors)
FROZEN_ORACLE_QUERIES = frozenset({"dedup_minhash_lsh", "dedup_simhash"})

#: largest scale factor at which an oracle is practical to RUN — the
#: durations-fit oracle is a RECURSIVE CTE whose iteration count equals
#: the series length (~20k at sf0.1); DuckDB re-scans the join input
#: per iteration, so past sf0.01 the oracle (not the engine) is the
#: bottleneck. The driver's correctness gate runs at sf0.01, where it
#: completes in seconds.
ORACLE_SF_LIMITS = {"acd_fit_durations": 0.01}


def _frozen_oracles() -> dict[str, str]:
    try:
        import oracle_frozen
    except ImportError:
        return {}
    return {
        "dedup_minhash_lsh": oracle_frozen.MINHASH_LSH_SQL,
        "dedup_simhash": oracle_frozen.SIMHASH_SQL,
    }
