import pytest

from rust_timeseries_spark.operators import journeys


def _ev(spark, rows):
    # rows: (event_id, user_id, event_type, epoch_seconds)
    return spark.createDataFrame(rows, ["event_id", "user_id", "event_type", "ts"])


def test_funnel_strict_order_and_window(spark):
    rows = [
        (1, 1, "click", 0), (2, 1, "purchase", 100),        # converts
        (3, 2, "click", 0), (4, 2, "purchase", 0),          # same time: NOT after
        (5, 3, "purchase", 50), (6, 3, "click", 60),        # wrong order, no later purchase
        (7, 4, "click", 0), (8, 4, "purchase", 90000),      # outside 86400 budget
        (9, 5, "click", 86400 * 3 + 5), (10, 5, "purchase", 86400 * 3 + 6),  # day-3 cohort
    ]
    out = {r["bucket_ts"]: r for r in journeys.funnel_conversion(
        _ev(spark, rows), ["click", "purchase"], within=86400).collect()}
    d0 = out[0]
    assert d0["n_step1"] == 4 and d0["n_step2"] == 1 and abs(d0["conv_rate"] - 0.25) < 1e-12
    d3 = out[86400 * 3]
    assert d3["n_step1"] == 1 and d3["n_step2"] == 1 and d3["conv_rate"] == 1.0


def test_funnel_three_steps_anchor_budget(spark):
    # step times must each be strictly later than the previous CHOSEN
    # time and within the ANCHOR's budget
    rows = [
        (1, 1, "a", 0), (2, 1, "b", 10), (3, 1, "c", 20),      # full funnel
        (4, 2, "a", 0), (5, 2, "c", 10), (6, 2, "b", 20),      # c before b: no c AFTER b within budget... but (6,b=20) then no c later
        (7, 3, "a", 0), (8, 3, "b", 50), (9, 3, "c", 200),     # c outside within=100 of anchor
    ]
    out = journeys.funnel_conversion(_ev(spark, rows), ["a", "b", "c"], within=100).collect()[0]
    assert out["n_step1"] == 3 and out["n_step2"] == 3 and out["n_step3"] == 1


def test_funnel_validation():
    with pytest.raises(ValueError, match="at least 2 steps"):
        journeys.funnel_conversion(None, ["a"], within=10)
    with pytest.raises(ValueError, match="within must be"):
        journeys.funnel_conversion(None, ["a", "b"], within=0)


def test_cohort_retention_offsets(spark):
    d = 86400
    rows = [
        (1, 1, "x", 0), (2, 1, "x", 2 * d), (3, 1, "x", 2 * d + 5),  # offsets 0,2
        (4, 2, "x", d), (5, 2, "x", 2 * d),                           # cohort d: 0,1
        (6, 3, "x", 0),                                               # cohort 0: 0
    ]
    got = {(r["cohort_ts"], r["offset"]): r["n_users"]
           for r in journeys.cohort_retention(_ev(spark, rows)).collect()}
    assert got == {(0, 0): 2, (0, 2): 1, (d, 0): 1, (d, 1): 1}


def test_event_transitions_tie_break_and_shares(spark):
    rows = [
        (1, 1, "a", 0), (2, 1, "b", 0),   # same ts: event_id orders a->b
        (3, 1, "c", 5),                   # b->c
        (4, 2, "a", 0), (5, 2, "c", 1),   # a->c
    ]
    got = {(r["from_event"], r["to_event"]): r for r in
           journeys.event_transitions(_ev(spark, rows)).collect()}
    assert got[("a", "b")]["n"] == 1 and got[("a", "c")]["n"] == 1
    assert got[("b", "c")]["n"] == 1
    assert abs(got[("a", "b")]["share"] - 0.5) < 1e-12


def test_ab_test_zstat_closed_form(spark):
    # 4 users -> arms by stable hash; verify against the closed form
    import math
    from rust_timeseries_spark.operators.sampling import stable_hash32
    from pyspark.sql import functions as F

    rows = [(u, int(c)) for u, c in [(1, 1), (2, 0), (3, 1), (4, 1), (5, 0), (6, 1)]]
    uc = spark.createDataFrame(rows, ["user_id", "conv"])
    out = journeys.ab_test_zstat(uc, n_variants=2).collect()[0]
    arms = {r["variant"]: r for r in uc.select(
        F.pmod(stable_hash32("user_id"), F.lit(2)).alias("variant"), "conv"
    ).groupBy("variant").agg(F.count("*").alias("n"), F.sum("conv").alias("c")).collect()}
    na, ca = arms[0]["n"], arms[0]["c"]
    nb, cb = arms[1]["n"], arms[1]["c"]
    assert (out["n_a"], out["conv_a"], out["n_b"], out["conv_b"]) == (na, ca, nb, cb)
    pool = (ca + cb) / (na + nb)
    want = (ca / na - cb / nb) / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb))
    assert abs(out["z_stat"] - want) < 1e-15


def test_ab_test_degenerate_pool_gives_null(spark):
    uc = spark.createDataFrame([(u, 1) for u in range(1, 9)], ["user_id", "conv"])
    out = journeys.ab_test_zstat(uc, n_variants=2).collect()[0]
    assert out["z_stat"] is None  # everyone converted -> se = 0
