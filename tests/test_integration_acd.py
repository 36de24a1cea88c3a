"""API-level integration sweep mirroring the reference's own
integration suite (tests/integration_acd_pipline.rs): fit → classical +
HAC covariance → forecast across model shapes, data scales, and
innovation laws, plus the trending-series HAC-vs-classical contrast and
the t0-offset pipeline. The reference asserts shape/finiteness/sign
invariants (not point values) — same here, through the drop-in
``api.ACD`` surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_timeseries_spark.api import ACD


def make_trending_data(n: int, base: float, slope: float) -> np.ndarray:
    # integration_acd_pipline.rs:83-91 — positive trending durations,
    # clamped back to `base` if the trend ever dips non-positive
    x = base + slope * np.arange(n, dtype=np.float64)
    x[x <= 0.0] = base
    return x


def _model(p: int, q: int, n: int, innovation: str) -> ACD:
    kwargs = dict(
        p=p, q=q, init="uncond_mean", line_searcher="MoreThuente",
        psi_guards=(1e-6, 1e6), tol_cost=1e-6, max_iter=200,
    )
    if innovation == "weibull":
        return ACD.wacd(n, 1.5, **kwargs)
    return ACD(n, **kwargs)


# the reference sweeps shapes × scales × innovations
# (integration_acd_pipline.rs:257-315); bases pruned to two to keep the
# suite fast — the scale axis is otherwise identical
@pytest.mark.parametrize("p,q", [(1, 0), (0, 1), (1, 1), (2, 1)])
@pytest.mark.parametrize("base", [0.5, 5.0])
@pytest.mark.parametrize("innovation", ["exponential", "weibull"])
def test_acd_api_multiple_shapes_scales_innovations(p, q, base, innovation):
    n = 128
    data = make_trending_data(n, base, 0.01 * base)
    theta_dim = 1 + p + q
    model = _model(p, q, n, innovation)
    model.fit(data, np.zeros(theta_dim), unit="seconds")
    assert model.results.converged or model.results.iterations > 0
    assert np.isfinite(model.fitted_params.omega)

    cov = np.asarray(model.covariance_matrix(data))
    assert cov.shape == (theta_dim, theta_dim)
    assert np.all(np.isfinite(cov))
    assert np.all(np.diag(cov) >= 0.0)

    cov_hac = np.asarray(model.covariance_matrix(data, robust=True, kernel="bartlett"))
    assert cov_hac.shape == (theta_dim, theta_dim)
    assert np.all(np.isfinite(cov_hac))

    h = model.forecast(data, horizon=5)
    assert np.isfinite(h) and h > 0.0
    assert len(model.forecast_result) == 5


def test_hac_differs_from_classical_on_trending_series():
    # integration_acd_pipline.rs:345-416: on a trending series the HAC
    # path must be numerically active — at least one diagonal variance
    # differs materially from the classical one
    n = 512
    data = make_trending_data(n, 1.0, 0.01)
    model = _model(1, 1, n, "exponential")
    model.fit(data, np.zeros(3), unit="seconds")
    cov = np.asarray(model.covariance_matrix(data))
    cov_hac = np.asarray(
        model.covariance_matrix(
            data, robust=True, kernel="bartlett", center=True,
            small_sample_correction=True,
        )
    )
    assert np.all(np.isfinite(cov)) and np.all(np.isfinite(cov_hac))
    assert np.any(np.abs(np.diag(cov_hac) - np.diag(cov)) > 1e-10), (
        "HAC must not silently return the classical covariance on trending data"
    )


def test_acd_model_handles_t0_offset():
    # integration_acd_pipline.rs:477-508: the whole pipeline with a
    # burn-in offset — fit, covariance, forecast all succeed and stay
    # finite/positive
    n = 256
    data = make_trending_data(n, 1.0, 0.005)
    model = ACD(n, p=1, q=1, init="uncond_mean", psi_guards=(1e-6, 1e6), max_iter=200)
    model.fit(data, np.zeros(3), unit="seconds", t0=16)
    cov = np.asarray(model.covariance_matrix(data, t0=16))
    assert cov.shape == (3, 3)
    assert np.all(np.isfinite(cov)) and np.all(np.diag(cov) >= 0.0)
    h = model.forecast(data, horizon=5, t0=16)
    assert np.isfinite(h) and h > 0.0
