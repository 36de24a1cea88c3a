import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_timeseries_spark.operators import asof


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_basic(spark):
    left = _df(spark, [("a", 10, "x1"), ("a", 25, "x2"), ("a", 5, "x0"), ("b", 10, "y")],
               "k string, t long, payload string")
    right = _df(spark, [("a", 8, 1.0), ("a", 20, 2.0), ("b", 30, 9.0)],
                "k string, t long, v double")
    got = {(r["k"], r["t"]): (r["matched_ts"], r["v"])
           for r in asof.asof_join(left, right, ["k"]).collect()}
    assert got[("a", 5)] == (None, None)      # nothing at or before 5
    assert got[("a", 10)] == (8, 1.0)
    assert got[("a", 25)] == (20, 2.0)
    assert got[("b", 10)] == (None, None)     # right exists only later


def test_asof_inclusive_at_equality_and_tolerance(spark):
    left = _df(spark, [("a", 20, 0)], "k string, t long, z int")
    right = _df(spark, [("a", 20, 7.0)], "k string, t long, v double")
    r = asof.asof_join(left, right, ["k"]).collect()[0]
    assert r["matched_ts"] == 20 and r["v"] == 7.0  # inclusive boundary

    left2 = _df(spark, [("a", 100, 0), ("a", 131, 0)], "k string, t long, z int")
    right2 = _df(spark, [("a", 90, 1.0)], "k string, t long, v double")
    got = {r["t"]: (r["matched_ts"], r["v"])
           for r in asof.asof_join(left2, right2, ["k"], tolerance=30).collect()}
    assert got[100] == (90, 1.0)      # gap 10 <= 30
    assert got[131] == (None, None)   # gap 41 > 30: latest match filtered


def test_asof_forward(spark):
    left = _df(spark, [("a", 10, 0), ("a", 50, 0)], "k string, t long, z int")
    right = _df(spark, [("a", 15, 1.0), ("a", 40, 2.0)], "k string, t long, v double")
    got = {r["t"]: (r["matched_ts"], r["v"])
           for r in asof.asof_join(left, right, ["k"], direction="forward").collect()}
    assert got[10] == (15, 1.0)
    assert got[50] == (None, None)


def test_asof_matches_pandas_merge_asof(spark):
    # cross-check against pandas' public merge_asof on random data
    import pandas as pd

    rng = np.random.default_rng(11)
    lt = np.sort(rng.integers(0, 1000, 300))
    rt = np.sort(rng.choice(1000, size=80, replace=False))
    lpdf = pd.DataFrame({"k": ["a"] * 300, "t": lt, "i": range(300)})
    rpdf = pd.DataFrame({"k": ["a"] * 80, "t": rt, "v": rt * 1.5})
    exp = pd.merge_asof(lpdf, rpdf.rename(columns={"t": "rt"}),
                        left_on="t", right_on="rt", by="k")
    got = asof.asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), ["k"]
    ).orderBy("i").toPandas()
    exp_v = exp.sort_values("i")["v"].to_numpy()
    got_v = got["v"].to_numpy()
    assert ((exp_v == got_v) | (np.isnan(exp_v) & np.isnan(got_v))).all()


def test_asof_plan_single_shuffle_no_bnl(spark):
    left = _df(spark, [("a", 10, 0)], "k string, t long, z int")
    right = _df(spark, [("a", 8, 1.0)], "k string, t long, v double")
    plan = asof.asof_join(left, right, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_vs_bruteforce(spark):
    rng = np.random.default_rng(3)
    pts = [("k%d" % (i % 3), int(t), i) for i, t in
           enumerate(rng.integers(0, 5000, 400))]
    ivls = []
    for j in range(60):  # overlapping, varied lengths incl. zero-length
        s = int(rng.integers(0, 5000))
        ivls.append(("k%d" % (j % 3), s, s + int(rng.integers(0, 400)), j))
    p = _df(spark, pts, "k string, t long, pid long")
    iv = _df(spark, ivls, "k string, start long, end long, iid long")
    for width in (None, 37, 5000):
        got = {(r["pid"], r["iid"]) for r in
               asof.interval_join(p, iv, ["k"], bucket_width=width).collect()}
        exp = {(pid, iid) for (pk, t, pid) in pts for (ik, s, e, iid) in ivls
               if pk == ik and s <= t < e}
        assert got == exp, width
    # end_inclusive variant
    got = {(r["pid"], r["iid"]) for r in
           asof.interval_join(p, iv, ["k"], end_inclusive=True).collect()}
    exp = {(pid, iid) for (pk, t, pid) in pts for (ik, s, e, iid) in ivls
           if pk == ik and s <= t <= e}
    assert got == exp


def test_interval_join_no_cartesian_plan(spark):
    p = _df(spark, [("a", 5, 0)], "k string, t long, pid long")
    iv = _df(spark, [("a", 0, 10, 0)], "k string, start long, end long, iid long")
    plan = asof.interval_join(p, iv, ["k"], bucket_width=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_rejects_column_clash(spark):
    p = _df(spark, [("a", 5, 1)], "k string, t long, start long")
    iv = _df(spark, [("a", 0, 10)], "k string, start long, end long")
    with pytest.raises(ValueError, match="clash"):
        asof.interval_join(p, iv, ["k"])


def test_asof_null_right_value_not_stale(spark):
    # review r5 (CONFIRMED bug): the matched right row's NULL value must
    # NOT fall through to a stale earlier row's value — the right row is
    # carried as one struct
    left = _df(spark, [("a", 25, 0)], "k string, t long, z int")
    right = _df(spark, [("a", 10, 5.0), ("a", 20, None)], "k string, t long, v double")
    r = asof.asof_join(left, right, ["k"]).collect()[0]
    assert r["matched_ts"] == 20 and r["v"] is None, r
    # and a null right TIMESTAMP row is dropped, not carried
    right2 = _df(spark, [("a", None, 9.0), ("a", 10, 5.0)], "k string, t long, v double")
    r2 = asof.asof_join(left, right2, ["k"]).collect()[0]
    assert r2["matched_ts"] == 10 and r2["v"] == 5.0, r2


def test_asof_chaining_two_joins(spark):
    # review r5 (CONFIRMED bug): chained enrichment joins must not
    # produce an ambiguous matched_ts
    left = _df(spark, [("a", 25, 0)], "k string, t long, z int")
    r1 = _df(spark, [("a", 10, 1.0)], "k string, t long, v double")
    r2 = _df(spark, [("a", 20, 2.0)], "k string, t long, w double")
    out = asof.asof_join(asof.asof_join(left, r1, ["k"]), r2, ["k"])
    row = out.collect()[0]
    assert row["matched_ts"] == 10 and row["v"] == 1.0        # first join
    assert row["matched_ts_r"] == 20 and row["w"] == 2.0      # second join
    # internal-name collision fails loudly
    bad = _df(spark, [("a", 1, 2)], "k string, t long, _is_right int")
    with pytest.raises(ValueError, match="internals"):
        asof.asof_join(bad, r1, ["k"])


def test_interval_join_degenerate_intervals_bounded(spark):
    # review r5: zero-length (exclusive) and inverted intervals must not
    # explode descending sequences; output is empty, replication bounded
    p = _df(spark, [("a", 5, 0)], "k string, t long, pid long")
    iv = _df(spark, [("a", 5, 5, 0), ("a", 100, 3, 1)],
             "k string, istart long, iend long, iid long")
    out = asof.interval_join(p, iv, ["k"], start_col="istart", end_col="iend",
                             bucket_width=2)
    assert out.count() == 0
