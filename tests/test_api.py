"""The drop-in reference-shaped Python surface (rust_timeseries_spark/
api.py ↔ reference src/lib.rs:140-720): same class names, signatures,
defaults, getters, and error classifications."""

import numpy as np
import pytest

from rust_timeseries_spark.api import (
    ACD,
    EscancianoLobato,
    estimate_hac_covariance_matrix,
)
from rust_timeseries_spark.datagen import iid_scores, simulate_acd
from rust_timeseries_spark.stats import acd as acd_stats
from rust_timeseries_spark.stats import el as el_stats
from rust_timeseries_spark.stats import hac as hac_stats


@pytest.fixture(scope="module")
def sim():
    return simulate_acd(n=500, omega=0.2, alpha=[0.15], beta=[0.6], seed=11)["x"]


def test_acd_fit_results_and_fitted_params(sim):
    model = ACD(len(sim), p=1, q=1)
    model.fit(sim, np.zeros(3))
    r = model.results
    assert r.converged and r.status in ("GradientConverged", "CostConverged")
    assert r.iterations > 0 and r.grad_norm is not None
    assert dict(r.fn_evals)["cost_count"] > 0
    assert dict(r.fn_evals)["gradient_count"] > 0
    fp = model.fitted_params
    assert fp.omega > 0 and 0 <= fp.alpha[0] and 0 <= fp.beta[0]
    assert fp.slack >= 0 and len(fp.psi_lags) == 1
    # identical numerics to the engine-level fit (same kernels)
    ref = acd_stats.fit_series(np.asarray(sim), np.zeros(3), acd_stats.AcdSpec(p=1, q=1))
    assert fp.omega == ref["omega"]
    assert r.value == -ref["loglik"]


def test_acd_forecast_matches_kernel(sim):
    model = ACD(len(sim), p=1, q=1)
    model.fit(sim, np.zeros(3))
    psi_h = model.forecast(sim, horizon=5)
    path = model.forecast_result
    assert len(path) == 5 and psi_h == path[-1]
    assert all(v > 0 for v in path)
    with pytest.raises(ValueError, match="ZeroSimulationHorizon"):
        model.forecast(sim, horizon=0)


def test_acd_forecast_result_getter_call_order_parity(sim):
    # Mirrors the reference's getter semantics (lib.rs:466-529):
    # forecast() returns the terminal psi-hat; forecast_result holds the
    # full path of the MOST RECENT forecast call; before any forecast it
    # is empty (NOT a ModelNotFitted error — unlike results/
    # fitted_params); repeated calls with different horizons replace it.
    model = ACD(len(sim), p=1, q=1)
    model.fit(sim, np.zeros(3))
    assert model.forecast_result == []  # fitted but never forecast
    psi5 = model.forecast(sim, horizon=5)
    path5 = model.forecast_result
    assert len(path5) == 5 and psi5 == path5[-1]
    psi12 = model.forecast(sim, horizon=12)
    path12 = model.forecast_result
    assert len(path12) == 12 and psi12 == path12[-1]
    # same lags, same recursion → the longer path extends the shorter
    assert path12[:5] == path5
    # the getter returns a copy: mutating it cannot corrupt model state
    path12.append(-1.0)
    assert len(model.forecast_result) == 12
    # a failed forecast call must not clobber the cached result
    with pytest.raises(ValueError, match="ZeroSimulationHorizon"):
        model.forecast(sim, horizon=0)
    assert len(model.forecast_result) == 12


def test_acd_covariance_matrix_shapes(sim):
    model = ACD(len(sim), p=1, q=1)
    model.fit(sim, np.zeros(3))
    cov = model.covariance_matrix(sim)                      # classical (robust=False default)
    rob = model.covariance_matrix(sim, robust=True, kernel="bartlett")
    for m in (cov, rob):
        assert len(m) == 3 and all(len(row) == 3 for row in m)
        assert all(m[i][i] >= 0 for i in range(3))          # PSD diagonal


def test_acd_errors_mirror_reference(sim):
    with pytest.raises(ValueError, match="ModelNotFitted"):
        ACD(len(sim)).results
    with pytest.raises(ValueError, match="ModelNotFitted"):
        ACD(len(sim)).forecast(sim, 3)
    with pytest.raises(ValueError, match="InvalidModelShape"):
        ACD(100, p=0, q=0)
    with pytest.raises(ValueError, match="init_fixed must be provided"):
        ACD(100, init="fixed")
    with pytest.raises(ValueError, match="MoreThuente"):
        ACD(100, line_searcher="newton")
    with pytest.raises(ValueError, match="InvalidPsiGuards"):
        ACD(100, psi_guards=(2.0, 1.0))
    with pytest.raises(ValueError, match="invalid unit"):
        ACD(len(sim)).fit(sim, np.zeros(3), unit="fortnights")
    m = ACD(100)
    with pytest.raises(ValueError, match="InvalidModelShape"):
        m.fit(sim, np.zeros(3))  # length mismatch vs data_length
    with pytest.raises(ValueError, match="NonPositiveData"):
        ACD(3).fit([1.0, -1.0, 2.0], np.zeros(3))


def test_wacd_gacd_constructors(sim):
    w = ACD.wacd(len(sim), k=1.3, p=1, q=1)
    w.fit(sim, np.zeros(3))
    assert w.results.iterations > 0
    g = ACD.gacd(len(sim), p_shape=1.2, d_shape=1.5, p=1, q=1)
    assert g.spec.law == "generalized_gamma"
    with pytest.raises(ValueError, match="InvalidWeibullParam"):
        ACD.wacd(100, k=-1.0)
    with pytest.raises(ValueError, match="InvalidGenGammaParam"):
        ACD.gacd(100, p_shape=0.0, d_shape=1.0)


def test_escanciano_lobato_class(sim):
    el = EscancianoLobato(sim)
    ref = el_stats.escanciano_lobato_np(np.asarray(sim))
    assert el.p_tilde == ref["p_tilde"]
    assert el.statistic == ref["stat"]
    assert el.pvalue == ref["p_value"]
    assert EscancianoLobato(sim, q=2.4, d=5).p_tilde >= 1
    with pytest.raises(ValueError, match="q must be positive"):
        EscancianoLobato(sim, q=-1.0)
    with pytest.raises(ValueError, match="must not be empty"):
        EscancianoLobato([])
    with pytest.raises(ValueError, match="NaN"):
        EscancianoLobato([1.0, float("nan")])


def test_estimate_hac_covariance_matrix():
    scores = iid_scores(n=200, k=3)
    got = np.asarray(estimate_hac_covariance_matrix(scores, kernel="parzen", bandwidth=3))
    ref = hac_stats.hac_covariance_np(scores, kernel="parzen", bandwidth=3)
    assert np.array_equal(got, ref)
    with pytest.raises(ValueError, match="2-D"):
        estimate_hac_covariance_matrix(np.ones(5))


def test_fit_grouped_spark_path(spark, sim):
    rows = [("k1", int(t), float(v)) for t, v in enumerate(sim[:300])]
    rows += [("k2", int(t), float(v)) for t, v in enumerate(sim[200:])]
    df = spark.createDataFrame(rows, "key string, t long, v double")
    model = ACD(300, p=1, q=1)  # data_length unused on the grouped path
    out = {r["key"]: r for r in model.fit_grouped(df, ["key"]).collect()}
    assert set(out) == {"k1", "k2"}
    for r in out.values():
        assert r["error"] is None and r["omega"] > 0
        assert r["unit"] == "seconds" and r["diurnal_adjusted"] is False


def test_reference_module_paths_are_drop_in():
    # the reference package exposes three submodules (rust_timeseries/
    # __init__.py); code importing through those paths must port by
    # changing only the top-level package name
    from rust_timeseries_spark import duration_models, hac_estimation, statistical_tests

    assert duration_models.__all__ == ["ACD", "ACDOptimOutcome", "ACDFittedParams"]
    # statistical_tests: the reference's exact __all__ is a PREFIX; the
    # extras are this engine landing the reference's own roadmap
    # ("further GoF/residual tests under statistical_tests",
    # README.md:406-409) — a strict superset stays drop-in
    assert statistical_tests.__all__[:1] == ["EscancianoLobato"]
    assert statistical_tests.__all__ == ["EscancianoLobato", "LjungBox"]
    assert hac_estimation.__all__ == ["estimate_hac_covariance_matrix"]
    assert duration_models.ACD is ACD
    from rust_timeseries_spark.duration_models import ACD as ACD2  # import-path smoke
    assert ACD2 is ACD
