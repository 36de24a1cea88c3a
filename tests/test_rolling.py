import numpy as np

from rust_timeseries_spark import datagen
from rust_timeseries_spark.operators import rolling


def _gamma_tau_np(x, j):
    # exact reference formulas: escanciano_lobato.rs:369-378 / 322-331
    n = len(x)
    ybar = x.mean()
    dev = x - ybar
    g = float(np.sum(dev[j:] * dev[:-j])) / (n - j)
    tau = float(np.sum((dev[j:] ** 2) * (dev[:-j] ** 2))) / (n - j)
    return g, tau


def test_lag_moments_match_reference_formulas(spark):
    arrays = {f"k{i}": datagen.normal_residuals(200, seed=12345 + i) for i in range(4)}
    df = datagen.series_df(spark, arrays)
    got = rolling.lag_moments(df, "v", max_lag=3).orderBy("key", "lag").toPandas()
    for k, x in arrays.items():
        for j in (1, 2, 3):
            row = got[(got["key"] == k) & (got["lag"] == j)].iloc[0]
            g, tau = _gamma_tau_np(x, j)
            np.testing.assert_allclose(row["gamma_j"], g, rtol=1e-12)
            np.testing.assert_allclose(row["tau_j"], tau, rtol=1e-12)
            np.testing.assert_allclose(row["rho_tilde_sq"], g * g / tau, rtol=1e-12)


def test_rolling_stats_trailing_window(spark):
    x = np.arange(1.0, 11.0)
    df = datagen.series_df(spark, {"a": x}).withColumnRenamed("t", "bucket_ts")
    got = rolling.rolling_stats(df, "v", k=3, keys=["key"], order_col="bucket_ts").orderBy("bucket_ts").toPandas()
    # trailing-3 mean of 1..10
    exp_mean = [1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    np.testing.assert_allclose(got["roll_mean"].to_numpy(), exp_mean, rtol=1e-12)
    assert got["roll_min"].tolist() == [1, 1, 1, 2, 3, 4, 5, 6, 7, 8]
    assert got["roll_max"].tolist() == list(range(1, 11))
    assert got["roll_count"].tolist() == [1, 2, 3, 3, 3, 3, 3, 3, 3, 3]


def test_cross_correlation_self_is_one_and_shift_detects(spark):
    import pyspark.sql.functions as F

    vals = [(i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8])]
    a = spark.createDataFrame(vals, ["bucket_ts", "tok_sum"])
    # self-correlation at lag 0 is exactly 1 (pop-std normalization)
    cc = rolling.cross_correlation(a, a, max_lag=2, keys=[], order_col="bucket_ts")
    r0 = {r["lag"]: r for r in cc.collect()}
    assert abs(r0[0]["ccf"] - 1.0) < 1e-12
    assert r0[0]["n_pairs"] == 12 and r0[1]["n_pairs"] == 11
    # positive j correlates a_t with b_{t-j}: shift b one bucket EARLIER
    # (b leads) and the lag-1 ccf pairs av_t with bv_{t-1} = a_t -> ~1
    b = a.withColumn("bucket_ts", F.col("bucket_ts") - 1)
    cc2 = {r["lag"]: r["ccf"] for r in rolling.cross_correlation(
        a, b, max_lag=2, keys=[], order_col="bucket_ts").collect()}
    assert cc2[1] == max(cc2.values()) and cc2[1] > 0.9


def test_cross_correlation_matches_numpy(spark):
    rng = np.random.default_rng(7)
    av = rng.normal(size=40)
    bv = rng.normal(size=40)
    a = spark.createDataFrame([(i, float(v)) for i, v in enumerate(av)], ["bucket_ts", "tok_sum"])
    b = spark.createDataFrame([(i, float(v)) for i, v in enumerate(bv)], ["bucket_ts", "tok_sum"])
    got = {r["lag"]: r["ccf"] for r in rolling.cross_correlation(
        a, b, max_lag=3, keys=[], order_col="bucket_ts").collect()}
    n, abar, bbar = len(av), av.mean(), bv.mean()
    sa, sb = av.std(), bv.std()  # population
    for j in range(4):
        want = float(((av[j:] - abar) * (bv[: n - j] - bbar)).sum() / ((n - j) * sa * sb))
        assert abs(got[j] - want) < 1e-12, (j, got[j], want)


def test_cusum_finds_planted_step(spark):
    # 20 zeros then 20 tens: |S_k| peaks exactly at the step boundary
    vals = [(i, 0.0) for i in range(20)] + [(i, 10.0) for i in range(20, 40)]
    df = spark.createDataFrame([("k", t, v) for t, v in vals], ["key", "bucket_ts", "tok_sum"])
    out = rolling.cusum_changepoint(df, value_col="tok_sum", keys=["key"],
                                    order_col="bucket_ts").collect()[0]
    assert out["n"] == 40
    assert out["cp_pos"] == 20 and out["cp_bucket_ts"] == 19
    # stat = max|S|/(sd*sqrt(n)) = (20*5)/(5*sqrt(40))
    assert abs(out["cusum_stat"] - 100.0 / (5.0 * np.sqrt(40.0))) < 1e-12


def test_cusum_tie_breaks_earliest(spark):
    # symmetric +1/-1 square wave: several positions share max |S|; the
    # earliest must win
    vals = [1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
    df = spark.createDataFrame([("k", i, v) for i, v in enumerate(vals)],
                               ["key", "bucket_ts", "tok_sum"])
    out = rolling.cusum_changepoint(df, value_col="tok_sum", keys=["key"],
                                    order_col="bucket_ts").collect()[0]
    assert out["cp_pos"] == 1  # S = 1,0,1,0,1,0 -> first |S|=1 at pos 1


def test_trend_ols_matches_numpy_polyfit(spark):
    rng = np.random.default_rng(11)
    t = np.arange(60, dtype=np.float64) * 3600.0
    v = 3.5 + 0.002 * t + rng.normal(scale=5.0, size=60)
    df = spark.createDataFrame(
        [("k", float(tt), float(vv)) for tt, vv in zip(t, v)],
        ["key", "bucket_ts", "tok_sum"],
    )
    out = rolling.trend_ols(df, value_col="tok_sum", keys=["key"],
                            order_col="bucket_ts").collect()[0]
    slope, intercept = np.polyfit(t, v, 1)
    assert out["n"] == 60
    assert abs(out["slope"] - slope) < 1e-12
    assert abs(out["intercept"] - intercept) < 1e-8
    r = np.corrcoef(t, v)[0, 1]
    assert abs(out["r2"] - r * r) < 1e-12


def test_trend_ols_constant_series_r2_null(spark):
    df = spark.createDataFrame(
        [("k", float(i), 7.0) for i in range(10)], ["key", "bucket_ts", "tok_sum"]
    )
    out = rolling.trend_ols(df, value_col="tok_sum", keys=["key"],
                            order_col="bucket_ts").collect()[0]
    assert abs(out["slope"]) < 1e-15 and out["r2"] is None


def test_degenerate_series_yield_null_not_abort(spark):
    """Review r5s4: constant/short series must produce NULL statistics,
    never an ANSI DIVIDE_BY_ZERO job abort."""
    const = spark.createDataFrame(
        [("k", i, 5.0) for i in range(6)], ["key", "bucket_ts", "tok_sum"]
    )
    cp = rolling.cusum_changepoint(const, "tok_sum", ["key"], "bucket_ts").collect()[0]
    assert cp["cusum_stat"] is None and cp["cp_pos"] == 1
    single = spark.createDataFrame([("k", 7.0, 3.0)], ["key", "bucket_ts", "tok_sum"])
    tr = rolling.trend_ols(single, "tok_sum", ["key"], "bucket_ts").collect()[0]
    assert tr["slope"] is None and tr["intercept"] is None and tr["r2"] is None
    cc = rolling.cross_correlation(const, const, value_col="tok_sum",
                                   max_lag=2, keys=["key"],
                                   order_col="bucket_ts").collect()
    assert all(r["ccf"] is None for r in cc)  # sa = sb = 0
