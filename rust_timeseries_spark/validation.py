"""Parameter/data validators mirroring the reference's taxonomy.

One Python function per reference validator
(src/duration/core/validation.rs:109-726 — 11 validators), raising
``ValueError`` whose message leads with the reference error-variant name
(``ACDError``/``ParamError`` variants, src/duration/errors.rs:172-289),
so engine callers fail with the same classification the Rust API uses.
"""

from __future__ import annotations

import math

import numpy as np

from .constants import STATIONARITY_MARGIN

SUM_TOL = 1e-10  # validation.rs:607


def validate_weibull_param(param: float) -> float:
    """validation.rs:109-121."""
    if not math.isfinite(param) or param <= 0.0:
        raise ValueError(f"InvalidWeibullParam: value={param} must be finite and > 0")
    return param


def validate_gamma_param(param: float) -> float:
    """validation.rs:167-179."""
    if not math.isfinite(param) or param <= 0.0:
        raise ValueError(f"InvalidGenGammaParam: value={param} must be finite and > 0")
    return param


def validate_duration_lags(duration_lags: np.ndarray, q: int) -> None:
    """validation.rs:234-244."""
    if len(duration_lags) != q:
        raise ValueError(f"InvalidDurationLength: expected={q} actual={len(duration_lags)}")
    for index, value in enumerate(duration_lags):
        if not math.isfinite(value) or value <= 0.0:
            raise ValueError(f"InvalidDurationLags: index={index} value={value}")


def validate_psi_lags(psi_lags: np.ndarray, p: int) -> None:
    """validation.rs:297-307."""
    if len(psi_lags) != p:
        raise ValueError(f"InvalidPsiLength: expected={p} actual={len(psi_lags)}")
    for index, value in enumerate(psi_lags):
        if not math.isfinite(value) or value <= 0.0:
            raise ValueError(f"InvalidPsiLags: index={index} value={value}")


def validate_omega(omega: float) -> None:
    """validation.rs:345-349."""
    if not math.isfinite(omega) or omega <= 0.0:
        raise ValueError(f"InvalidOmega: value={omega}")


def validate_alpha(alpha: np.ndarray, q: int) -> None:
    """validation.rs:400-410."""
    if len(alpha) != q:
        raise ValueError(f"AlphaLengthMismatch: expected={q} actual={len(alpha)}")
    for index, value in enumerate(alpha):
        if value < 0.0 or not math.isfinite(value):
            raise ValueError(f"InvalidAlpha: index={index} value={value}")


def validate_beta(beta: np.ndarray, p: int) -> None:
    """validation.rs:460-470."""
    if len(beta) != p:
        raise ValueError(f"BetaLengthMismatch: expected={p} actual={len(beta)}")
    for index, value in enumerate(beta):
        if value < 0.0 or not math.isfinite(value):
            raise ValueError(f"InvalidBeta: index={index} value={value}")


def validate_alpha_beta_lengths(alpha: np.ndarray, beta: np.ndarray, q: int, p: int) -> None:
    """validation.rs:522-532."""
    if len(alpha) != q:
        raise ValueError(f"AlphaLengthMismatch: expected={q} actual={len(alpha)}")
    if len(beta) != p:
        raise ValueError(f"BetaLengthMismatch: expected={p} actual={len(beta)}")


def validate_stationarity_and_slack(alpha: np.ndarray, beta: np.ndarray, slack: float) -> None:
    """validation.rs:596-612: slack ≥ 0 finite and
    ∑α+∑β+slack = 1−STATIONARITY_MARGIN within 1e-10."""
    if not (slack >= 0.0 and math.isfinite(slack)):
        raise ValueError(f"InvalidSlack: value={slack}")
    total = float(alpha.sum()) + float(beta.sum()) + slack
    if abs(total - (1.0 - STATIONARITY_MARGIN)) > SUM_TOL:
        raise ValueError(f"StationarityViolated: coeff_sum={float(alpha.sum()) + float(beta.sum())}")


def validate_loglik_params(x: float, psi: float) -> None:
    """validation.rs:663-671."""
    if not math.isfinite(x) or x <= 0.0:
        raise ValueError(f"InvalidLogLikInput: value={x}")
    if not math.isfinite(psi) or psi <= 0.0:
        raise ValueError(f"InvalidPsiLogLik: value={psi}")


def validate_theta(theta: np.ndarray, p: int, q: int) -> None:
    """validation.rs:726-742."""
    expected = 1 + p + q
    if len(theta) != expected:
        raise ValueError(f"ThetaLengthMismatch: expected={expected} actual={len(theta)}")
    for index, value in enumerate(theta):
        if not math.isfinite(value):
            raise ValueError(f"InvalidThetaInput: index={index} value={value}")


def validate_series(data: np.ndarray, t0: int | None = None) -> None:
    """ACDData::new ingest validation (data.rs:167-188): non-empty,
    finite, strictly positive, t0 < len."""
    if len(data) == 0:
        raise ValueError("EmptyData: duration series must be non-empty")
    if not np.all(np.isfinite(data)):
        raise ValueError("NonFiniteData: durations must be finite")
    if np.any(data <= 0.0):
        raise ValueError("NonPositiveData: durations must be strictly positive")
    if t0 is not None and not (0 <= t0 < len(data)):
        raise ValueError(f"InvalidT0: t0={t0} must satisfy 0 <= t0 < {len(data)}")
