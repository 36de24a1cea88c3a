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
