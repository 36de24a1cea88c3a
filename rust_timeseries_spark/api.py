"""Drop-in reference-shaped Python API.

A user of the reference library (``rust_timeseries``) drives it through
the PyO3 surface in src/lib.rs:258-720: an ``ACD`` class with
``ACD(...)`` / ``ACD.wacd(...)`` / ``ACD.gacd(...)`` constructors,
``fit`` / ``forecast`` / ``covariance_matrix`` methods and
``results`` / ``fitted_params`` / ``forecast_result`` getters; an
``EscancianoLobato`` result class; and a free
``estimate_hac_covariance_matrix`` function. This module reproduces
that surface — same names, same signatures, same defaults, same error
classifications — over the engine's numpy kernels, so single-series
code ports by changing only the import.

Beyond the reference, ``ACD.fit_grouped`` / ``forecast_grouped`` /
``covariance_grouped`` run the same model per key over a Spark
DataFrame — the distributed path the reference does not have.

Signature sources (cited per method): constructors lib.rs:267-430,
fit lib.rs:431-455, forecast lib.rs:456-474, covariance_matrix
lib.rs:475-514, getters lib.rs:506-530 + 579-676,
EscancianoLobato lib.rs:140-195, HAC function lib.rs:692-720,
data/unit extraction utils.rs:224-252, init parsing utils.rs:144-176.
"""

from __future__ import annotations

import numpy as np

from . import validation as V
from .constants import DEFAULT_LBFGS_MEM, DEFAULT_PSI_GUARDS
from .operators.recursion import forecast_np, psi_recursion_np, seed_init
from .stats import acd as _acd
from .stats import el as _el
from .stats import hac as _hac
from .stats.optim import parse_line_searcher


class ACDOptimOutcome:
    """Optimizer outcome getters (lib.rs:579-625): ``theta_hat``,
    ``value``, ``converged``, ``status``, ``iterations``,
    ``grad_norm``, ``fn_evals`` (named counters, argmin-style)."""

    def __init__(self, theta_hat, value, converged, status, iterations, grad_norm, fn_evals):
        self.theta_hat = list(theta_hat)
        self.value = float(value)
        self.converged = bool(converged)
        self.status = str(status)
        self.iterations = int(iterations)
        self.grad_norm = float(grad_norm) if grad_norm is not None else None
        self.fn_evals = list(fn_evals)  # [(name, count), ...]


class ACDFittedParams:
    """Model-space parameters at the optimum (lib.rs:626-676):
    ``omega``, ``slack``, ``alpha``, ``beta``, ``psi_lags``."""

    def __init__(self, omega, slack, alpha, beta, psi_lags):
        self.omega = float(omega)
        self.slack = float(slack)
        self.alpha = [float(v) for v in alpha]
        self.beta = [float(v) for v in beta]
        self.psi_lags = [float(v) for v in psi_lags]


def _convert_durations(durations, unit, t0, diurnal_adjusted):
    """extract_acd_data (utils.rs:224-252): 1-D float64, validated unit
    string, metadata flags; ingest validation per data.rs:167-188."""
    x = np.asarray(durations, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("durations must be a 1-D contiguous float64 array or sequence")
    unit_name = V.parse_unit(unit)
    V.validate_series(x, t0)
    return x, unit_name, bool(diurnal_adjusted or False)


class ACD:
    """ACD(p, q) duration model — the reference's Python class
    (lib.rs:267-530), exponential innovations by default; Weibull /
    generalized-gamma via :meth:`wacd` / :meth:`gacd`."""

    def __init__(
        self,
        data_length: int,
        p: int | None = None,
        q: int | None = None,
        init: str | None = None,
        init_fixed: float | None = None,
        init_psi_lags=None,
        init_durations_lags=None,
        tol_grad: float | None = None,
        tol_cost: float | None = None,
        max_iter: int | None = None,
        line_searcher: str | None = None,
        lbfgs_mem: int | None = None,
        psi_guards: tuple[float, float] | None = None,
        verbose: bool | None = None,
        _law: str = "exponential",
        _law_params: dict | None = None,
    ) -> None:
        p = 1 if p is None else int(p)
        q = 1 if q is None else int(q)
        V.validate_model_shape(p, q)
        if data_length <= 0:
            raise ValueError("InvalidModelShape: param=0 reason=data_length must be positive")
        init_name = init if init is not None else "uncond_mean"
        if init_name == "fixed":
            if init_fixed is None:
                raise ValueError("init_fixed must be provided when init='fixed'")
            V.validate_init_fixed(init_fixed)
        if init_name == "fixed_vector":
            if init_psi_lags is None:
                raise ValueError("init_psi_lags must be provided when init='fixed_vector'")
            if init_durations_lags is None:
                raise ValueError("init_durations_lags must be provided when init='fixed_vector'")
            V.validate_psi_lags(np.asarray(init_psi_lags, dtype=np.float64), p)
            V.validate_duration_lags(np.asarray(init_durations_lags, dtype=np.float64), q)
        guards = tuple(psi_guards) if psi_guards is not None else DEFAULT_PSI_GUARDS
        V.validate_psi_guards(guards)
        if line_searcher is not None:
            parse_line_searcher(line_searcher)  # raises like traits.rs:179-189

        self.data_length = int(data_length)
        self._init_psi_lags = (
            np.asarray(init_psi_lags, dtype=np.float64) if init_psi_lags is not None else None
        )
        self._init_durations_lags = (
            np.asarray(init_durations_lags, dtype=np.float64)
            if init_durations_lags is not None
            else None
        )
        self.spec = _acd.AcdSpec(
            p=p,
            q=q,
            law=_law,
            law_params=dict(_law_params or {}),
            init=init_name,
            init_value=init_fixed,
            psi_guards=guards,
            tol_grad=tol_grad if tol_grad is not None else 1e-6,
            tol_cost=tol_cost,
            max_iter=max_iter if max_iter is not None else 300,
            line_searcher=line_searcher if line_searcher is not None else "more_thuente",
            lbfgs_mem=lbfgs_mem,
            verbose=bool(verbose or False),
        )
        self._results: ACDOptimOutcome | None = None
        self._fitted: ACDFittedParams | None = None
        self._forecast_result: list[float] = []

    # -- constructors (lib.rs:321-430) --------------------------------------

    @staticmethod
    def wacd(data_length: int, k: float, **kwargs) -> "ACD":
        """Weibull-innovation ACD with shape ``k`` (lib.rs:321-374)."""
        V.validate_weibull_param(k)
        return ACD(data_length, _law="weibull", _law_params={"k": float(k)}, **kwargs)

    @staticmethod
    def gacd(data_length: int, p_shape: float, d_shape: float, **kwargs) -> "ACD":
        """Generalized-gamma-innovation ACD with shapes (p, d)
        (lib.rs:375-430)."""
        V.validate_gamma_param(p_shape)
        V.validate_gamma_param(d_shape)
        return ACD(
            data_length,
            _law="generalized_gamma",
            _law_params={"p": float(p_shape), "d": float(d_shape)},
            **kwargs,
        )

    # -- internals ----------------------------------------------------------

    def _spec_for(self, t0, diurnal_adjusted, unit_name):
        from dataclasses import replace

        return replace(
            self.spec, t0=t0, unit=unit_name, diurnal_adjusted=diurnal_adjusted
        )

    def _check_length(self, x: np.ndarray) -> None:
        if len(x) != self.data_length:
            raise ValueError(
                f"InvalidModelShape: param={len(x)} reason=durations length "
                f"does not match data_length={self.data_length}"
            )

    # -- fit (lib.rs:431-455) -----------------------------------------------

    def fit(self, durations, theta0, unit: str | None = None, t0: int | None = None,
            diurnal_adjusted: bool | None = None) -> None:
        x, unit_name, diurnal = _convert_durations(durations, unit, t0, diurnal_adjusted)
        self._check_length(x)
        theta0_a = np.asarray(theta0, dtype=np.float64)
        spec = self._spec_for(t0, diurnal, unit_name)
        # named evaluation counters (argmin CountingProblem parity,
        # lib.rs fn_evals getter): cost/gradient wrappers injected into
        # fit_series — no module state is touched (thread-safe)
        counts = {"cost_count": 0, "gradient_count": 0}

        def counting_loglik(xx, tt, sp):
            counts["cost_count"] += 1
            return _acd.loglik(xx, tt, sp)

        def counting_grad(xx, tt, sp):
            counts["gradient_count"] += 1
            return _acd.grad(xx, tt, sp)

        r = _acd.fit_series(
            x, theta0_a, spec, loglik_fn=counting_loglik, grad_fn=counting_grad
        )
        self._results = ACDOptimOutcome(
            theta_hat=r["theta_hat"],
            value=-r["loglik"],  # optimizer cost = −ℓ (adapter.rs:216-222)
            converged=r["converged"],
            status=r["term_status"],
            iterations=r["iterations"],
            grad_norm=r["grad_norm"],
            fn_evals=sorted(counts.items()),
        )
        self._fitted = ACDFittedParams(
            omega=r["omega"], slack=r["slack"], alpha=r["alpha"], beta=r["beta"],
            psi_lags=r["psi_lags"],
        )

    # -- forecast (lib.rs:456-474) -------------------------------------------

    def forecast(self, durations, horizon: int, unit: str | None = None,
                 t0: int | None = None, diurnal_adjusted: bool | None = None) -> float:
        """H-step ψ̂ forecast from the FITTED parameters; returns
        ψ̂_{T+horizon} (the reference returns the terminal value; the
        full path is the ``forecast_result`` getter)."""
        if self._fitted is None:
            raise ValueError("ModelNotFitted: call fit() before forecast()")
        V.validate_horizon(horizon)
        x, _unit_name, _diurnal = _convert_durations(durations, unit, t0, diurnal_adjusted)
        self._check_length(x)
        fp = self._fitted
        alpha = np.asarray(fp.alpha)
        beta = np.asarray(fp.beta)
        p, q = self.spec.p, self.spec.q
        # in-sample recursion at θ̂ → last p ψ-lags + last q durations
        # (tail-q projection, acd.rs:374-376)
        pi, di = seed_init(
            self.spec.init, fp.omega, alpha, beta, float(x.mean()), p, q,
            fixed_value=self.spec.init_value,
            psi_lags=self._init_psi_lags, duration_lags=self._init_durations_lags,
        )
        psi = psi_recursion_np(x, fp.omega, alpha, beta, pi, di, self.spec.psi_guards)
        psi_buf = np.concatenate([pi, psi])
        psi_lags = psi_buf[len(psi_buf) - p:] if p > 0 else np.empty(0)
        dur_lags = x[len(x) - q:] if q > 0 else np.empty(0)
        path = forecast_np(
            fp.omega, alpha, beta, psi_lags, dur_lags, horizon, self.spec.psi_guards
        )
        self._forecast_result = [float(v) for v in path]
        return float(path[-1])

    # -- covariance (lib.rs:475-514) ------------------------------------------

    def covariance_matrix(self, durations, unit: str | None = None, t0: int | None = None,
                          diurnal_adjusted: bool | None = None, robust: bool | None = None,
                          kernel: str | None = None, bandwidth: int | None = None,
                          center: bool | None = None,
                          small_sample_correction: bool | None = None) -> list[list[float]]:
        if self._results is None:
            raise ValueError("ModelNotFitted: call fit() before covariance_matrix()")
        x, unit_name, diurnal = _convert_durations(durations, unit, t0, diurnal_adjusted)
        self._check_length(x)
        spec = self._spec_for(t0, diurnal, unit_name)
        cov = _acd.covariance_series(
            x,
            np.asarray(self._results.theta_hat, dtype=np.float64),
            spec,
            robust=bool(robust or False),  # reference default robust=False
            kernel=kernel if kernel is not None else "bartlett",
            bandwidth=bandwidth,
            center=bool(center or False),
            small_sample_correction=(
                True if small_sample_correction is None else bool(small_sample_correction)
            ),
        )
        return [[float(v) for v in row] for row in cov]

    # -- getters (lib.rs:506-530) ---------------------------------------------

    @property
    def results(self) -> ACDOptimOutcome:
        if self._results is None:
            raise ValueError("ModelNotFitted")
        return self._results

    @property
    def fitted_params(self) -> ACDFittedParams:
        if self._fitted is None:
            raise ValueError("ModelNotFitted")
        return self._fitted

    @property
    def forecast_result(self) -> list[float]:
        return list(self._forecast_result)

    # -- Spark-native extensions (not in the reference) -----------------------

    def fit_grouped(self, df, keys, value_col="v", order_col="t", theta0=None):
        """Per-key distributed fit — `stats.acd.acd_fit` with this
        model's spec. One result row per key."""
        return _acd.acd_fit(df, keys, self.spec, theta0=theta0,
                            value_col=value_col, order_col=order_col)

    def covariance_grouped(self, df, keys, value_col="v", order_col="t", theta0=None,
                           robust=False, kernel="bartlett", bandwidth=None, center=False,
                           small_sample_correction=True):
        return _acd.acd_covariance(
            df, keys, self.spec, theta0=theta0, robust=robust, kernel=kernel,
            bandwidth=bandwidth, center=center,
            small_sample_correction=small_sample_correction,
            value_col=value_col, order_col=order_col,
        )


class EscancianoLobato:
    """EL test result (lib.rs:140-195): construct from a series, read
    ``p_tilde`` / ``statistic`` / ``pvalue``."""

    def __init__(self, raw_data, q: float = 2.4, d: int | None = None) -> None:
        if q is not None and q <= 0.0:
            raise ValueError("q must be positive")
        data = np.asarray(raw_data, dtype=np.float64)
        if data.size == 0:
            raise ValueError("data must not be empty")
        if np.isnan(data).any():
            raise ValueError("data must not contain NaN values")
        if d is not None and d <= 0:
            raise ValueError("d must be positive")
        out = _el.escanciano_lobato_np(data, q=q, d=d)
        self.p_tilde = int(out["p_tilde"])
        self.statistic = float(out["stat"])
        self.pvalue = float(out["p_value"])


class LjungBox:
    """Ljung–Box residual diagnostic + excess dispersion — the first
    reference-roadmap extension landed ('further goodness-of-fit and
    residual tests under ``statistical_tests``', reference
    README.md:406-409), surfaced with the same result-object pattern as
    ``EscancianoLobato``: construct from a residual series, read
    ``statistic`` / ``pvalue`` / ``excess_dispersion``.

    Pass standardized ACD residuals ε̂_t = x_t/ψ̂_t (e.g. from a fitted
    ``ACD``); under correct specification they are iid, so the Q
    statistic is asymptotically χ²(m) and excess dispersion
    √(n/8)·(σ̂²−1) is N(0,1) for the exponential law."""

    def __init__(self, raw_data, m: int = 4) -> None:
        data = np.asarray(raw_data, dtype=np.float64)
        if data.size == 0:
            raise ValueError("data must not be empty")
        if np.isnan(data).any():
            raise ValueError("data must not contain NaN values")
        from .stats import gof as _gof

        out = _gof.ljung_box_np(data, m=m)
        self.m = int(m)
        self.statistic = float(out["stat"])
        self.pvalue = float(out["p_value"])
        self.excess_dispersion = float(out["excess_dispersion"])


def estimate_hac_covariance_matrix(
    raw_data,
    kernel: str | None = None,
    bandwidth: int | None = None,
    center: bool | None = None,
    small_sample_correction: bool | None = None,
) -> list[list[float]]:
    """HAC long-run covariance of a 2-D score matrix (lib.rs:692-720)."""
    data = np.asarray(raw_data, dtype=np.float64)
    if data.ndim != 2:
        raise ValueError("data must be a 2-D float64 array (n_obs × n_cols)")
    cov = _hac.hac_covariance_np(
        data,
        kernel=kernel if kernel is not None else "bartlett",
        bandwidth=bandwidth,
        center=bool(center or False),
        small_sample_correction=(
            True if small_sample_correction is None else bool(small_sample_correction)
        ),
    )
    return [[float(v) for v in row] for row in cov]
