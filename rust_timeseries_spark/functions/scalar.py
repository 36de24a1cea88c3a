"""Numerical kernels pinned to the reference, in numpy/stdlib (no scipy
in this environment).

Every function cites the reference implementation it replicates; the
branch structure and operation order are kept so deterministic paths
reproduce the reference bit-for-bit (SURVEY.md §2.8).
"""

from __future__ import annotations

import math

import numpy as np

from ..constants import EIGEN_EPS, LOGIT_EPS, SOFTPLUS_THRESHOLD, STATIONARITY_MARGIN

# ---------------------------------------------------------------------------
# stable scalar transforms (numerical_stability/transformations.rs)
# ---------------------------------------------------------------------------

def safe_softplus(x: float) -> float:
    """ln(1+e^x), linear above 20 (transformations.rs:150-152)."""
    return x if x > SOFTPLUS_THRESHOLD else math.log1p(math.exp(x))


def safe_softplus_inv(x: float) -> float:
    """ln(e^x − 1), linear above 20 (transformations.rs:203-205)."""
    return x if x > SOFTPLUS_THRESHOLD else math.log(math.expm1(x))


def safe_logistic(x: float) -> float:
    """Branchwise-stable sigmoid (transformations.rs:438-448)."""
    if x > SOFTPLUS_THRESHOLD:
        return 1.0
    if x >= 0.0:
        return 1.0 / (1.0 + math.exp(-x))
    ex = math.exp(x)
    return ex / (1.0 + ex)


def safe_softmax(theta_tail: np.ndarray, q: int, p: int) -> tuple[np.ndarray, np.ndarray, float]:
    """Max-shift softmax over (q+p) logits plus an implicit 0-logit,
    scaled by 1−STATIONARITY_MARGIN. Returns (alpha, beta, slack)
    (transformations.rs:279-296). The implicit-0 term e^{−max} is added
    FIRST in the sum, matching the reference's accumulation order."""
    t = np.asarray(theta_tail, dtype=np.float64)
    max_x = float(np.max(t)) if len(t) else float("-inf")
    max_x = max(max_x, float("-inf"))
    if len(t) == 0:
        raise ValueError("empty theta tail")
    sum_exp = math.exp(-max_x) + float(np.sum(np.exp(t - max_x)))
    scale = 1.0 - STATIONARITY_MARGIN
    probs = np.exp(t - max_x) / sum_exp * scale
    alpha = probs[:q].copy()
    beta = probs[q : q + p].copy()
    slack = scale * math.exp(-max_x) / sum_exp
    return alpha, beta, slack


def safe_softmax_deriv(alpha: np.ndarray, beta: np.ndarray, vec: np.ndarray) -> None:
    """In-place Jᵀ·vec for the scaled softmax (transformations.rs:376-392):
    vec[i] ← (α_i/scale)·(vec[i] − c), c = (α·vec_α + β·vec_β)/scale."""
    q, p = len(alpha), len(beta)
    numerator = float(alpha @ vec[:q]) + float(beta @ vec[q : q + p])
    scale = 1.0 - STATIONARITY_MARGIN
    c = numerator / scale
    for i in range(q):
        vec[i] = alpha[i] / scale * (vec[i] - c)
    for j in range(p):
        vec[q + j] = beta[j] / scale * (vec[q + j] - c)


def apply_jt(theta_hat: np.ndarray, alpha: np.ndarray, beta: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Jᵀ·u for the θ→(ω,α,β) map (transformations.rs apply_jt)."""
    out = np.zeros_like(u)
    out[0] = u[0] * safe_logistic(float(theta_hat[0]))
    tmp = u[1:].copy()
    safe_softmax_deriv(alpha, beta, tmp)
    out[1:] = tmp
    return out


def delta_method(theta_cov: np.ndarray, theta_hat: np.ndarray, alpha: np.ndarray, beta: np.ndarray) -> np.ndarray:
    """Σ_param = Jᵀᵀ Σ_θ Jᵀ, Jᵀ built column-wise from basis vectors
    (transformations.rs:495-513)."""
    n = len(theta_hat)
    jt = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        jt[:, i] = apply_jt(theta_hat, alpha, beta, e)
    return jt.T @ (theta_cov @ jt)


def theta_to_params(theta: np.ndarray, p: int, q: int) -> tuple[float, np.ndarray, np.ndarray, float]:
    """θ → (ω, α, β, slack) (workspace.rs update / params.rs from_theta)."""
    omega = safe_softplus(float(theta[0]))
    alpha, beta, slack = safe_softmax(np.asarray(theta[1:]), q, p)
    return omega, alpha, beta, slack


def params_to_theta(omega: float, alpha: np.ndarray, beta: np.ndarray, slack: float) -> np.ndarray:
    """(ω,α,β,slack) → θ with LOGIT_EPS clamping (params.rs to_theta)."""
    q, p = len(alpha), len(beta)
    denom_inv = 1.0 / (1.0 - STATIONARITY_MARGIN)
    theta = np.zeros(1 + q + p)
    theta[1 : 1 + q] = alpha * denom_inv
    theta[1 + q :] = beta * denom_inv
    theta[theta < LOGIT_EPS] = LOGIT_EPS
    log_slack = math.log(slack * denom_inv)
    theta[0] = safe_softplus_inv(omega)
    theta[1:] = np.log(theta[1:]) - log_slack
    return theta


# ---------------------------------------------------------------------------
# innovation laws (duration/core/innovations.rs)
# ---------------------------------------------------------------------------

def weibull_lambda(k: float) -> float:
    """Unit-mean λ = exp(−lnΓ(1+1/k)) (innovations.rs:243-247);
    raises InvalidUnitMeanWeibull when the normalizer degenerates
    (errors.rs:193-195)."""
    from ..validation import validate_unit_mean

    lam = math.exp(-math.lgamma(1.0 + 1.0 / k))
    validate_unit_mean(lam, "weibull")
    return lam


def gengamma_a(p: float, d: float) -> float:
    """Unit-mean a = exp(lnΓ(d/p) − lnΓ((d+1)/p)) (innovations.rs:360-365);
    raises InvalidUnitMeanGenGamma on a degenerate normalizer
    (errors.rs:200-202)."""
    from ..validation import validate_unit_mean

    a = math.exp(math.lgamma(d / p) - math.lgamma((d + 1.0) / p))
    validate_unit_mean(a, "generalized_gamma")
    return a


def log_pdf_duration(x: float, psi: float, law: str, params: dict) -> float:
    """log f_X(x|ψ) = log f_ε(x/ψ) − ln ψ (innovations.rs:483-499)."""
    ln_psi = math.log(psi)
    eps = x / psi
    if law == "exponential":
        # statrs Exp(1).ln_pdf(eps) = −eps
        return -eps - ln_psi
    if law == "weibull":
        lam, k = params["lambda"], params["k"]
        # statrs Weibull(k, λ).ln_pdf: ln k − ln λ + (k−1)(ln x − ln λ) − (x/λ)^k
        return (
            math.log(k) - math.log(lam)
            + (k - 1.0) * (math.log(eps) - math.log(lam))
            - (eps / lam) ** k
            - ln_psi
        )
    if law == "generalized_gamma":
        a, d, p = params["a"], params["d"], params["p"]
        return (
            math.log(p) - d * math.log(a) + (d - 1.0) * math.log(eps)
            - (eps / a) ** p
            - math.lgamma(d / p)
            - ln_psi
        )
    raise ValueError(f"unknown innovation law {law!r}")


def one_d_loglik_grad(x: float, psi: float, law: str, params: dict) -> float:
    """∂logpdf/∂ψ closed forms (innovations.rs:546-558)."""
    eps = x / psi
    if law == "exponential":
        return eps / psi - 1.0 / psi
    if law == "weibull":
        lam, k = params["lambda"], params["k"]
        return (k * (math.exp(k * (math.log(eps) - math.log(lam))) - 1.0)) / psi
    if law == "generalized_gamma":
        a, d, p = params["a"], params["d"], params["p"]
        return (p * math.exp(p * (math.log(eps) - math.log(a))) - d) / psi
    raise ValueError(f"unknown innovation law {law!r}")


def logpdf_vec(x: np.ndarray, psi: np.ndarray, law: str, params: dict) -> np.ndarray:
    """Vectorized log_pdf_duration (identical math, element order kept by
    the caller's ordered summation)."""
    ln_psi = np.log(psi)
    eps = x / psi
    if law == "exponential":
        return -eps - ln_psi
    if law == "weibull":
        lam, k = params["lambda"], params["k"]
        return (
            math.log(k) - math.log(lam)
            + (k - 1.0) * (np.log(eps) - math.log(lam))
            - (eps / lam) ** k
            - ln_psi
        )
    if law == "generalized_gamma":
        a, d, p = params["a"], params["d"], params["p"]
        return (
            math.log(p) - d * math.log(a) + (d - 1.0) * np.log(eps)
            - (eps / a) ** p
            - math.lgamma(d / p)
            - ln_psi
        )
    raise ValueError(f"unknown innovation law {law!r}")


def loglik_grad_vec(x: np.ndarray, psi: np.ndarray, law: str, params: dict) -> np.ndarray:
    eps = x / psi
    if law == "exponential":
        return eps / psi - 1.0 / psi
    if law == "weibull":
        lam, k = params["lambda"], params["k"]
        return (k * (np.exp(k * (np.log(eps) - math.log(lam))) - 1.0)) / psi
    if law == "generalized_gamma":
        a, d, p = params["a"], params["d"], params["p"]
        return (p * np.exp(p * (np.log(eps) - math.log(a))) - d) / psi
    raise ValueError(f"unknown innovation law {law!r}")


# ---------------------------------------------------------------------------
# special functions
# ---------------------------------------------------------------------------

def chi2_sf1(x: float) -> float:
    """Survival function of χ²(1): 1 − CDF = erfc(√(x/2))
    (escanciano_lobato.rs:225 uses statrs ChiSquared(1))."""
    return math.erfc(math.sqrt(x / 2.0))


# ---------------------------------------------------------------------------
# HAC kernels & bandwidth (inference/kernel.rs)
# ---------------------------------------------------------------------------

def kernel_weight(kernel: str, x: float) -> float:
    """Taper weights (kernel.rs:189-227)."""
    ax = abs(x)
    if kernel == "iid":
        return 1.0 if x == 0.0 else 0.0
    if kernel == "bartlett":
        return 1.0 - ax if ax <= 1.0 else 0.0
    if kernel == "parzen":
        if ax <= 0.5:
            ax2 = ax * ax
            return 1.0 - 6.0 * ax2 + 6.0 * ax * ax2
        if ax <= 1.0:
            return 2.0 * (1.0 - ax) ** 3
        return 0.0
    if kernel == "quadratic_spectral":
        if x == 0.0:
            return 1.0
        pi_x = math.pi * x
        trig = 6.0 * pi_x / 5.0
        return (25.0 / (12.0 * pi_x * pi_x)) * (math.sin(trig) / trig - math.cos(trig))
    raise ValueError(f"unknown kernel {kernel!r}")


def _ar1_fit(col: np.ndarray) -> tuple[float, float, np.ndarray]:
    """Conditional least squares AR(1) fit x_t = c + φ x_{t−1} + e_t.

    The reference delegates to the external ``arima`` crate
    (kernel.rs:462); this OLS equivalent is tolerance-parity — the
    plug-in bandwidth is integer-rounded, so small estimator differences
    rarely change L. Fixed-bandwidth HAC is the bit-parity path.
    """
    y = col[1:]
    x = col[:-1]
    xm, ym = x.mean(), y.mean()
    denom = float(((x - xm) ** 2).sum())
    phi = float(((x - xm) * (y - ym)).sum()) / denom if denom > 0 else 0.0
    c = ym - phi * xm
    resid = y - c - phi * x
    return c, phi, resid


def andrews_alpha(series_mat: np.ndarray, ord_: int) -> float:
    """Andrews plug-in α(q) from per-column AR(1) fits
    (kernel.rs:435-476). Raises on the reference's error conditions so
    the caller can take the n^{1/4} fallback."""
    n = series_mat.shape[0]
    if n < 2:
        raise ValueError("DenominatorTooSmall")
    numerator = denominator = 0.0
    for j in range(series_mat.shape[1]):
        col = series_mat[:, j]
        _, phi, resid = _ar1_fit(col)
        if abs(phi) >= 1.0 - STATIONARITY_MARGIN:
            raise ValueError("StationarityViolated")
        phi2 = phi * phi
        sigma2 = float((resid**2).sum()) / (len(resid) - 1)
        sigma4 = sigma2 * sigma2
        denominator += sigma4 / (1.0 - phi2) ** 4
        nn = 4.0 * phi2 * sigma4
        if ord_ == 1:
            numerator += nn / ((1.0 - phi) ** 6 * (1.0 + phi) * (1.0 + phi))
        elif ord_ == 2:
            numerator += nn / (1.0 - phi) ** 8
        else:
            raise ValueError("OrderNotSupported")
    if denominator < 1e-10:
        raise ValueError("DenominatorTooSmall")
    return numerator / denominator


def optimal_bandwidth(kernel: str, series_mat: np.ndarray) -> int:
    """Andrews bandwidths (kernel.rs:308-337): Bartlett
    1.1447(nα(1))^{1/3}; Parzen 2.6614(nα(2))^{1/5}; QS
    1.3221(nα(2))^{1/5}; fallback round(n^{1/4})."""
    n = float(series_mat.shape[0])
    if kernel == "iid":
        return 0
    try:
        if kernel == "bartlett":
            alpha = andrews_alpha(series_mat, 1)
            return int(round(1.1447 * (n * alpha) ** (1.0 / 3.0)))
        if kernel == "parzen":
            alpha = andrews_alpha(series_mat, 2)
            return int(round(2.6614 * (n * alpha) ** (1.0 / 5.0)))
        if kernel == "quadratic_spectral":
            alpha = andrews_alpha(series_mat, 2)
            return int(round(1.3221 * (n * alpha) ** (1.0 / 5.0)))
    except ValueError:
        return int(round(n ** (1.0 / 4.0)))
    raise ValueError(f"unknown kernel {kernel!r}")


# ---------------------------------------------------------------------------
# linear algebra (inference/hessian.rs)
# ---------------------------------------------------------------------------

def pseudo_inverse(m: np.ndarray) -> np.ndarray:
    """Symmetric-eigendecomposition pseudo-inverse dropping λ ≤ 1e-10
    (hessian.rs:325-344)."""
    vals, vecs = np.linalg.eigh(m)
    out = np.zeros_like(m)
    for k in range(len(vals)):
        lam = vals[k]
        if lam > EIGEN_EPS:
            out += (1.0 / lam) * np.outer(vecs[:, k], vecs[:, k])
    return out


def sandwich_covariance(obs_info: np.ndarray, hac_cov: np.ndarray | None) -> np.ndarray:
    """J⁺ (classical) or J⁺ S J⁺ (robust) (hessian.rs:238-298)."""
    pinv = pseudo_inverse(obs_info)
    if hac_cov is None:
        return pinv
    return pinv @ hac_cov @ pinv


def fd_hessian(grad_fn, theta: np.ndarray) -> np.ndarray:
    """Central-difference Hessian of a gradient function, symmetrized
    (finite_diff.rs:239-254 via the finitediff crate; tolerance parity).
    Falls back to forward differences if the central result is
    non-finite."""
    n = len(theta)
    h = np.cbrt(np.finfo(float).eps)

    def central():
        hess = np.zeros((n, n))
        for i in range(n):
            step = h * max(1.0, abs(theta[i]))
            tp = theta.copy()
            tp[i] += step
            tm = theta.copy()
            tm[i] -= step
            hess[:, i] = (grad_fn(tp) - grad_fn(tm)) / (2.0 * step)
        return hess

    def forward():
        g0 = grad_fn(theta)
        hess = np.zeros((n, n))
        for i in range(n):
            step = math.sqrt(np.finfo(float).eps) * max(1.0, abs(theta[i]))
            tp = theta.copy()
            tp[i] += step
            hess[:, i] = (grad_fn(tp) - g0) / step
        return hess

    hess = central()
    if not np.all(np.isfinite(hess)):
        hess = forward()
    return (hess + hess.T) / 2.0
