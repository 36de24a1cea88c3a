"""INDEPENDENT recompute of the fixed-θ ACD(1,1) covariance pipeline —
the oracle source for the ``acd_covariance_durations`` driver query.

This file deliberately imports NOTHING from ``rust_timeseries_spark``:
it is a second implementation of the published pipeline semantics
(reference hessian.rs:139-149; scores model_internals.rs:276-310;
HAC hac.rs:337-361; transforms transformations.rs; ψ/∂ψ recursions
psi.rs:576-604, 687-723), written from those semantics in plain
Python floats + numpy for the matrix steps. ``np.linalg.eigh`` is the
one shared public-library component (like the xxh64 reimplementation
shared by the dedup oracles); everything pipeline-shaped — recursions,
finite differences, sandwich, delta method — is re-derived here.

``tools/gen_frozen_oracles.py`` runs this recompute and the engine's
actual driver query side by side, aborts on ANY formatted-value
mismatch, and freezes the verified rows as DuckDB VALUES literals.

The input series replicates ``_duration_series`` (epoch gaps per
event_type, unit-mean normalized) via the same SQL the loglik oracles
already use, so the doubles are IEEE-identical to what Spark feeds the
engine kernel.
"""

from __future__ import annotations

import math

import numpy as np

# constants from the reference (transformations.rs:84-101, utils.rs:135)
SM = 1e-6           # STATIONARITY_MARGIN
EIGEN_EPS = 1e-10   # pseudo-inverse eigenvalue cutoff
SPT = 20.0          # softplus linearization threshold
GMIN, GMAX = 1e-6, 1e6  # psi guards

DURATION_SERIES_SQL = """
WITH e AS (
  SELECT DISTINCT event_type AS key, CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM read_parquet('{sf_dir}/events.parquet')
),
d AS (
  SELECT key, t, t - lag(t) OVER (PARTITION BY key ORDER BY t) AS dur FROM e
)
SELECT key, t,
       CAST(dur AS DOUBLE) / (CAST(sum(dur) OVER (PARTITION BY key) AS DOUBLE)
                              / count(dur) OVER (PARTITION BY key)) AS v
FROM d WHERE dur IS NOT NULL
ORDER BY key, t
"""


def softplus(x: float) -> float:
    return x if x > SPT else math.log1p(math.exp(x))


def logistic(x: float) -> float:
    if x > SPT:
        return 1.0
    if x >= 0.0:
        return 1.0 / (1.0 + math.exp(-x))
    ex = math.exp(x)
    return ex / (1.0 + ex)


def transform(theta):
    """θ → (ω, α, β, slack): softplus + max-shift softmax with an
    implicit 0 logit, scaled by 1−SM (transformations.rs:150-152,
    279-296; implicit-0 term added first in the sum)."""
    om = softplus(theta[0])
    t1, t2 = theta[1], theta[2]
    mx = max(t1, t2)
    sum_exp = math.exp(-mx) + (math.exp(t1 - mx) + math.exp(t2 - mx))
    scale = 1.0 - SM
    a = math.exp(t1 - mx) / sum_exp * scale
    b = math.exp(t2 - mx) / sum_exp * scale
    slack = scale * math.exp(-mx) / sum_exp
    return om, a, b, slack


def psi_rec(x, om, a, b, psi0, di0):
    """ψ recursion, uncond-mean seeded (psi.rs:576-604 op order)."""
    n = len(x)
    out = np.empty(n, dtype=np.float64)
    prev = psi0
    xl = list(map(float, x))
    for t in range(n):
        sa = a * di0 + 0.0 if t == 0 else 0.0 + a * xl[t - 1]
        cur = om + sa + b * prev
        if cur < GMIN:
            cur = GMIN
        elif cur > GMAX:
            cur = GMAX
        out[t] = cur
        prev = cur
    return out


def deriv_rec(x, psi_buf, om, a, b, denom, di0):
    """∂ψ/∂θ_raw sensitivity recursion for (1,1), uncond-mean init
    corrections included (psi.rs:687-723, 440-456, 783-793)."""
    n = len(x)
    deriv = np.zeros((1 + n, 3), dtype=np.float64)
    deriv[0, 0] = 1.0 / denom
    deriv[0, 1] = om / (denom * denom)
    deriv[0, 2] = om / (denom * denom)
    d0, d1, d2 = float(deriv[0, 0]), float(deriv[0, 1]), float(deriv[0, 2])
    xl = list(map(float, x))
    pb = list(map(float, psi_buf))
    for t in range(n):
        if t == 0:
            alpha_sum = a
            pdd = (alpha_sum * om) / (denom * denom)
            r0 = 1.0 + alpha_sum / denom
            r1 = di0 + pdd
            r2 = pb[t] + pdd
        else:
            r0 = 1.0
            r1 = xl[t - 1] + 0.0
            r2 = pb[t] + 0.0
        r0 = r0 + b * d0
        r1 = r1 + b * d1
        r2 = r2 + b * d2
        deriv[1 + t, 0] = r0
        deriv[1 + t, 1] = r1
        deriv[1 + t, 2] = r2
        d0, d1, d2 = r0, r1, r2
    return deriv


def _psi_and_deriv(x, theta):
    om, a, b, slack = transform(theta)
    uncond = om / (1.0 - a - b)
    psi = psi_rec(x, om, a, b, uncond, uncond)
    if not np.all(np.isfinite(psi)):
        raise ValueError("non-finite psi")
    psi_buf = np.concatenate([[uncond], psi])
    denom = slack + SM
    deriv = deriv_rec(x, psi_buf, om, a, b, denom, uncond)
    return psi_buf, deriv, om, a, b, slack


def _innov_grad(x, psi):
    """∂logpdf/∂ψ for the exponential law: ε/ψ − 1/ψ, ε = x/ψ
    (innovations.rs:546-558)."""
    eps = x / psi
    return eps / psi - 1.0 / psi


def _softmax_deriv_inplace(a, b, v1, v2):
    """Jᵀ·vec for the scaled softmax tail (transformations.rs:376-392).
    Returns the transformed (v1, v2); elementwise, so it accepts either
    scalars or numpy arrays."""
    scale = 1.0 - SM
    numerator = a * v1 + b * v2
    c = numerator / scale
    return a / scale * (v1 - c), b / scale * (v2 - c)


def grad(x, theta):
    """∇ℓ(θ) — per-obs innovation gradient × sensitivity rows, then the
    θ-space chain rule (acd.rs:590-619)."""
    psi_buf, deriv, om, a, b, slack = _psi_and_deriv(x, theta)
    ig = _innov_grad(x, psi_buf[1:])
    state = deriv[1:].T @ ig
    state = np.asarray(state, dtype=np.float64)
    state[0] *= logistic(float(theta[0]))
    state[1], state[2] = _softmax_deriv_inplace(a, b, float(state[1]), float(state[2]))
    return state


def scores(x, theta):
    """Per-observation score matrix (model_internals.rs:276-310)."""
    psi_buf, deriv, om, a, b, slack = _psi_and_deriv(x, theta)
    ig = _innov_grad(x, psi_buf[1:])
    mat = deriv[1:] * ig[:, None]
    logistic0 = logistic(float(theta[0]))
    c1, c2 = _softmax_deriv_inplace(a, b, mat[:, 1], mat[:, 2])
    mat[:, 1] = c1
    mat[:, 2] = c2
    mat[:, 0] *= logistic0
    return mat


def hac(score_mat, bw):
    """S = Γ₀ + Σ w_k (Γ_k + Γ_kᵀ), Bartlett taper w = 1 − k/(L+1),
    small-sample c_k = 1/(n−k) (hac.rs:337-361, 425-457)."""
    n = score_mat.shape[0]
    bw = min(int(bw), n - 1)
    acc = np.zeros((3, 3), dtype=np.float64)
    for lag in range(0, bw + 1):
        w = 1.0 - lag / (bw + 1)
        if lag == 0:
            acc += (1.0 / n) * (score_mat.T @ score_mat)
        else:
            c = 1.0 / (n - lag)
            g = c * (score_mat[lag:].T @ score_mat[: n - lag])
            acc += w * g
            acc += w * g.T
    return acc


def fd_hessian(x, theta):
    """Central-difference Hessian of the gradient, symmetrized
    (finite_diff.rs:239-254 step convention)."""
    h = float(np.cbrt(np.finfo(float).eps))
    hess = np.zeros((3, 3), dtype=np.float64)
    for i in range(3):
        step = h * max(1.0, abs(theta[i]))
        tp = np.array(theta, dtype=np.float64)
        tp[i] += step
        tm = np.array(theta, dtype=np.float64)
        tm[i] -= step
        hess[:, i] = (grad(x, tp) - grad(x, tm)) / (2.0 * step)
    return (hess + hess.T) / 2.0


def pinv_sym(m):
    """Eigen pseudo-inverse keeping λ > EIGEN_EPS (hessian.rs:325-344),
    ascending-eigenvalue accumulation order."""
    vals, vecs = np.linalg.eigh(m)
    out = np.zeros_like(m)
    for k in range(len(vals)):
        lam = vals[k]
        if lam > EIGEN_EPS:
            out += (1.0 / lam) * np.outer(vecs[:, k], vecs[:, k])
    return out


def delta_method(theta_cov, theta, a, b):
    """Σ_param = Jᵀᵀ Σ_θ Jᵀ with Jᵀ built column-wise from basis
    vectors (transformations.rs:495-513)."""
    jt = np.zeros((3, 3), dtype=np.float64)
    l0 = logistic(float(theta[0]))
    for i in range(3):
        e = [0.0, 0.0, 0.0]
        e[i] = 1.0
        out0 = e[0] * l0
        out1, out2 = _softmax_deriv_inplace(a, b, e[1], e[2])
        jt[:, i] = (out0, out1, out2)
    return jt.T @ (theta_cov @ jt)


def covariance(x, theta, robust, bandwidth):
    """classical J⁺ or robust J⁺SJ⁺, delta-mapped to (ω,α,β) space —
    the full hessian.rs:139-149 pipeline at fixed θ. obs_info = −H(ℓ)
    (the engine's documented deviation: the reference's own unit tests
    feed positive-definite maps)."""
    x = np.asarray(x, dtype=np.float64)
    theta = np.asarray(theta, dtype=np.float64)
    hac_cov = None
    if robust:
        hac_cov = hac(scores(x, theta), bandwidth)
    obs_info = -fd_hessian(x, theta)
    if not np.all(np.isfinite(obs_info)):
        raise ValueError("non-finite hessian")
    p = pinv_sym(obs_info)
    theta_cov = p if hac_cov is None else p @ hac_cov @ p
    _, a, b, _ = transform(theta)
    return delta_method(theta_cov, theta, a, b)


def covariance_rows(con, sf_dir, theta, bandwidth):
    """All (key, i, j, cov_classical, cov_robust) rows for one sf dir,
    formatted %.5e — the exact shape of the driver query output."""
    rows = []
    data = con.execute(DURATION_SERIES_SQL.format(sf_dir=sf_dir)).fetchall()
    by_key: dict[str, list[float]] = {}
    for key, t, v in data:  # already ordered by key, t
        by_key.setdefault(key, []).append(v)
    for key in sorted(by_key):
        x = np.array(by_key[key], dtype=np.float64)
        classical = covariance(x, theta, robust=False, bandwidth=bandwidth)
        robust = covariance(x, theta, robust=True, bandwidth=bandwidth)
        for pos in range(9):
            i, j = pos // 3, pos % 3
            rows.append(
                (key, i, j, "%.5e" % classical[i, j], "%.5e" % robust[i, j])
            )
    return rows
