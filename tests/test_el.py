import math

import numpy as np

from rust_timeseries_spark import datagen
from rust_timeseries_spark.functions.scalar import chi2_sf1
from rust_timeseries_spark.stats import el


def test_chi2_sf1_known_values():
    # χ²(1) critical values
    assert abs(chi2_sf1(3.8414588206941236) - 0.05) < 1e-9
    assert abs(chi2_sf1(6.634896601021211) - 0.01) < 1e-9
    assert chi2_sf1(0.0) == 1.0


def test_el_reference_doc_example():
    # escanciano_lobato.rs doc example (lines ~203-210)
    out = el.escanciano_lobato_np(np.array([0.1, -0.2, 0.3, -0.4, 0.5]), q=3.0, d=4)
    assert 1 <= out["p_tilde"] <= 4
    assert math.isfinite(out["stat"])
    assert 0.0 <= out["p_value"] <= 1.0


def test_el_default_d():
    assert el.default_d(200) == int(200**0.2)  # = 2
    assert el.default_d(100000) == int(100000**0.2)  # = 10


def test_el_gamma_tau_denominators():
    # manual lag-1 check with the reference's exact 1/(n-j) convention
    x = np.array([1.0, 2.0, 4.0, 8.0])
    m = x.sum() / 4
    dev = x - m
    g1 = (dev[1:] * dev[:-1]).sum() / 3
    t1 = ((dev[1:] ** 2) * (dev[:-1] ** 2)).sum() / 3
    out = el.escanciano_lobato_np(x, d=2)
    assert abs(out["rho_tilde_sq"][0] - g1 * g1 / t1) < 1e-15


def test_el_penalty_switch_branches():
    # white noise → max|ρ̃| small → BIC branch p·ln n; strong AR(1) →
    # AIC branch 2p. Both must select a valid lag and a sane p-value.
    wn = datagen.normal_residuals(400, seed=2)
    out_wn = el.escanciano_lobato_np(wn)
    assert out_wn["p_value"] > 0.05  # size: white noise not rejected
    ar = datagen.ar1_residuals(400, phi=0.7, seed=2)
    out_ar = el.escanciano_lobato_np(ar)
    assert out_ar["p_value"] < 0.01  # power: strong AR(1) rejected
    assert out_ar["stat"] > out_wn["stat"]


def test_el_validation_errors():
    import pytest
    with pytest.raises(ValueError, match="DataTooShort"):
        el.escanciano_lobato_np(np.array([1.0]))
    with pytest.raises(ValueError, match="NonFiniteData"):
        el.escanciano_lobato_np(np.array([1.0, np.nan, 2.0]))
    with pytest.raises(ValueError, match="InvalidD"):
        el.escanciano_lobato_np(np.array([1.0, 2.0, 3.0]), d=3)
    with pytest.raises(ValueError, match="ZeroTau"):
        el.escanciano_lobato_np(np.full(10, 5.0))  # constant → τ=0


def test_el_spark_matches_numpy(spark):
    arrays = {f"k{i}": datagen.normal_residuals(200, seed=12345 + i) for i in range(6)}
    df = datagen.series_df(spark, arrays)
    got = {r["key"]: r for r in el.escanciano_lobato(df, ["key"]).collect()}
    for k, x in arrays.items():
        exp = el.escanciano_lobato_np(x)
        assert got[k]["p_tilde"] == exp["p_tilde"]
        assert got[k]["stat"] == exp["stat"]
        assert got[k]["p_value"] == exp["p_value"]
        assert got[k]["error"] is None


def test_el_spark_error_rows(spark):
    df = datagen.series_df(spark, {"bad": np.full(10, 1.0), "good": datagen.normal_residuals(50)})
    rows = {r["key"]: r for r in el.escanciano_lobato(df, ["key"]).collect()}
    assert rows["bad"]["error"] is not None and "ZeroTau" in rows["bad"]["error"]
    assert rows["good"]["error"] is None


# --- GoF: Ljung–Box + excess dispersion (stats/gof.py) ------------------------

def test_ljung_box_np_iid_vs_autocorrelated():
    from rust_timeseries_spark.stats import gof

    rng = np.random.default_rng(7)
    iid = rng.exponential(size=4000)
    out = gof.ljung_box_np(iid, m=4)
    # iid → Q small, p not tiny; unit-mean exponential → dispersion ~ 0
    assert out["p_value"] > 1e-3
    assert abs(out["excess_dispersion"]) < 5.0
    ar = np.empty(4000)
    ar[0] = iid[0]
    for t in range(1, 4000):
        ar[t] = 0.6 * ar[t - 1] + 0.4 * iid[t]
    out_ar = gof.ljung_box_np(ar, m=4)
    assert out_ar["stat"] > 100.0 and out_ar["p_value"] < 1e-10

    # χ²(4) SF closed form vs the series definition at a known point:
    # SF(x;4) = e^{-x/2}(1 + x/2); SF(9.488;4) ≈ 0.05 (the 95% critical value)
    sf = math.exp(-9.488 / 2) * (1 + 9.488 / 2)
    assert abs(sf - 0.05) < 1e-3

    import pytest
    with pytest.raises(ValueError):
        gof.ljung_box_np(iid, m=3)  # odd m has no elementary chi2 SF
    with pytest.raises(ValueError):
        gof.ljung_box_np(iid[:3], m=4)


def test_ljung_box_spark_matches_numpy(spark):
    from rust_timeseries_spark.stats import gof

    arrays = {f"k{i}": datagen.normal_residuals(300, seed=99 + i) + 2.0 for i in range(4)}
    df = datagen.series_df(spark, arrays)
    got = {r["key"]: r for r in
           gof.ljung_box_excess_dispersion(df.withColumnRenamed("v", "eps"), ["key"], m=4).collect()}
    for k, x in arrays.items():
        exp = gof.ljung_box_np(x, m=4)
        assert got[k]["n"] == exp["n"]
        # numpy pairwise sums vs Spark unordered agg: equal to float tolerance
        np.testing.assert_allclose(got[k]["lb_stat"], exp["stat"], rtol=1e-9)
        np.testing.assert_allclose(got[k]["lb_pvalue"], exp["p_value"], rtol=1e-9)
        np.testing.assert_allclose(
            got[k]["excess_dispersion"], exp["excess_dispersion"], rtol=1e-9
        )


def test_ljung_box_api_class():
    from rust_timeseries_spark.statistical_tests import LjungBox

    rng = np.random.default_rng(11)
    r = LjungBox(rng.exponential(size=2000), m=4)
    assert r.m == 4 and r.statistic >= 0.0 and 0.0 <= r.pvalue <= 1.0
    import pytest
    with pytest.raises(ValueError):
        LjungBox([])
    with pytest.raises(ValueError):
        LjungBox([1.0, float("nan"), 2.0])


def test_acd_residuals_match_kernel(spark):
    from rust_timeseries_spark.stats import gof
    from rust_timeseries_spark.stats.acd import AcdSpec
    from rust_timeseries_spark.operators.recursion import psi_recursion_np

    arrays = {"a": datagen.noisy_durations(200, seed=5), "b": datagen.noisy_durations(150, seed=6)}
    df = datagen.series_df(spark, arrays)
    got = {}
    for r in gof.acd_residuals(df, ["key"], AcdSpec(p=1, q=1), 0.2, [0.2], [0.3]).collect():
        got.setdefault(r["key"], []).append((r["t"], r["eps"]))
    for k, x in arrays.items():
        uncond = 0.2 / (1.0 - 0.2 - 0.3)
        psi = psi_recursion_np(x, 0.2, np.array([0.2]), np.array([0.3]),
                               np.array([uncond]), np.array([uncond]))
        exp = x / psi
        eps = np.array([e for _, e in sorted(got[k])])
        np.testing.assert_array_equal(eps, exp)  # bit-identical
