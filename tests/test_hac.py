import numpy as np
import pytest

from rust_timeseries_spark import datagen
from rust_timeseries_spark.functions import scalar as S
from rust_timeseries_spark.stats import hac


def test_kernel_weights_reference_values():
    # kernel.rs:189-227
    assert S.kernel_weight("iid", 0.0) == 1.0
    assert S.kernel_weight("iid", 0.3) == 0.0
    assert S.kernel_weight("bartlett", 0.25) == 0.75
    assert S.kernel_weight("bartlett", 1.5) == 0.0
    # parzen two-piece cubic
    assert abs(S.kernel_weight("parzen", 0.25) - (1 - 6 * 0.0625 + 6 * 0.25**3)) < 1e-15
    assert abs(S.kernel_weight("parzen", 0.75) - 2 * (1 - 0.75) ** 3) < 1e-15
    assert S.kernel_weight("quadratic_spectral", 0.0) == 1.0
    x = 0.4
    pix = np.pi * x
    trig = 6 * pix / 5
    expected = (25 / (12 * pix**2)) * (np.sin(trig) / trig - np.cos(trig))
    assert abs(S.kernel_weight("quadratic_spectral", x) - expected) < 1e-15


def test_kernel_aliases():
    assert hac.normalize_kernel("newey_west") == "bartlett"
    assert hac.normalize_kernel("QS") == "quadratic_spectral"
    with pytest.raises(ValueError):
        hac.normalize_kernel("nope")


def test_hac_iid_equals_gram():
    sc = datagen.iid_scores(300, 4)
    got = hac.hac_covariance_np(sc, kernel="iid")
    np.testing.assert_allclose(got, sc.T @ sc / 300, rtol=1e-15)


def test_hac_bandwidth_zero_equals_gamma0():
    sc = datagen.iid_scores(200, 3)
    got = hac.hac_covariance_np(sc, kernel="bartlett", bandwidth=0)
    np.testing.assert_allclose(got, sc.T @ sc / 200, rtol=1e-15)


def test_hac_manual_lag1():
    # bw=1 bartlett: S = Γ0 + w1(Γ1+Γ1ᵀ), w1 = 1 − 1/2 = 0.5
    sc = datagen.iid_scores(50, 2)
    n = 50
    g0 = sc.T @ sc / n
    g1 = sc[1:].T @ sc[:-1] / (n - 1)  # small-sample corrected
    exp = g0 + 0.5 * (g1 + g1.T)
    np.testing.assert_allclose(hac.hac_covariance_np(sc, "bartlett", 1), exp, rtol=1e-14)
    # without small-sample correction: 1/n instead of 1/(n−1)
    g1b = sc[1:].T @ sc[:-1] / n
    exp2 = g0 + 0.5 * (g1b + g1b.T)
    np.testing.assert_allclose(
        hac.hac_covariance_np(sc, "bartlett", 1, small_sample_correction=False), exp2, rtol=1e-14
    )


def test_hac_centering():
    sc = datagen.iid_scores(100, 3) + 5.0  # shifted columns
    c = hac.hac_covariance_np(sc, "bartlett", 0, center=True)
    nc = hac.hac_covariance_np(sc, "bartlett", 0, center=False)
    assert np.all(np.diag(nc) > np.diag(c))  # demeaning shrinks the Gram
    centered = sc - sc.mean(axis=0)
    np.testing.assert_allclose(c, centered.T @ centered / 100, rtol=1e-13)


def test_andrews_bandwidth_paths():
    rng = np.random.default_rng(3)
    # AR(1)-correlated columns → plug-in produces a positive bandwidth
    n = 500
    base = datagen.ar1_residuals(n, phi=0.6, seed=5)
    mat = np.column_stack([base, datagen.ar1_residuals(n, phi=0.5, seed=6)])
    for k in ("bartlett", "parzen", "quadratic_spectral"):
        bw = S.optimal_bandwidth(k, mat)
        assert 1 <= bw < n
    assert S.optimal_bandwidth("iid", mat) == 0
    # exact unit root (φ=1) → StationarityViolated → fallback round(n^(1/4))
    ramp = np.arange(n, dtype=np.float64).reshape(-1, 1)
    assert S.optimal_bandwidth("bartlett", ramp) == round(n**0.25)
    del rng


def test_hac_spark_matches_numpy(spark):
    import pandas as pd
    mats = {f"k{i}": datagen.iid_scores(300, 4, seed=100 + i) for i in range(3)}
    rows = [
        (k, t, mat[t].tolist())
        for k, mat in mats.items()
        for t in range(mat.shape[0])
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["key", "t", "s"]))
    got = {r["key"]: r for r in hac.hac_covariance(df, ["key"], kernel="bartlett", bandwidth=5).collect()}
    for k, mat in mats.items():
        exp = hac.hac_covariance_np(mat, "bartlett", 5)
        np.testing.assert_array_equal(np.array(got[k]["cov"]).reshape(4, 4), exp)
        assert got[k]["bandwidth_used"] == 5
