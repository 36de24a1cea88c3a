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
