"""Minimal L-BFGS with strong-Wolfe line search, pure numpy.

Stands in for the reference's argmin L-BFGS + More–Thuente
(src/optimization/loglik_optimizer/{run.rs,builders.rs}, memory m=7
types.rs:91, tolerances traits.rs:368-377). scipy is unavailable in
this environment. Parity with the reference optimizer is
tolerance-level by design (SURVEY.md §7.2.3): golden tests pin the
deterministic stages (ψ paths, likelihood at fixed θ, covariance given
scores) exactly and θ̂ within tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import DEFAULT_LBFGS_MEM, DEFAULT_MAX_ITER, DEFAULT_TOL_GRAD


@dataclass
class OptimOutcome:
    theta_hat: np.ndarray
    value: float  # final cost (minimization) — callers flip sign for ℓ
    iterations: int
    fn_evals: int
    grad_norm: float
    converged: bool
    message: str


def _wolfe_line_search(f, g, x, p, fx, gx, c1=1e-4, c2=0.9, max_iter=25):
    """Strong-Wolfe bracketing line search (Nocedal & Wright alg. 3.5/3.6)."""
    evals = 0

    def phi(a):
        nonlocal evals
        evals += 1
        return f(x + a * p)

    def dphi(a):
        return float(g(x + a * p) @ p)

    phi0, dphi0 = fx, float(gx @ p)
    if dphi0 >= 0:
        return None, evals
    a_prev, phi_prev = 0.0, phi0
    a = 1.0
    for i in range(max_iter):
        phi_a = phi(a)
        if not np.isfinite(phi_a):
            a = 0.5 * (a_prev + a)
            continue
        if phi_a > phi0 + c1 * a * dphi0 or (i > 0 and phi_a >= phi_prev):
            return _zoom(phi, dphi, a_prev, a, phi0, dphi0, phi_prev, c1, c2), evals
        d = dphi(a)
        if abs(d) <= -c2 * dphi0:
            return a, evals
        if d >= 0:
            return _zoom(phi, dphi, a, a_prev, phi0, dphi0, phi_a, c1, c2), evals
        a_prev, phi_prev = a, phi_a
        a *= 2.0
    return a, evals


def _zoom(phi, dphi, lo, hi, phi0, dphi0, phi_lo, c1, c2, max_iter=25):
    for _ in range(max_iter):
        a = 0.5 * (lo + hi)
        phi_a = phi(a)
        if not np.isfinite(phi_a) or phi_a > phi0 + c1 * a * dphi0 or phi_a >= phi_lo:
            hi = a
        else:
            d = dphi(a)
            if abs(d) <= -c2 * dphi0:
                return a
            if d * (hi - lo) >= 0:
                hi = lo
            lo, phi_lo = a, phi_a
    return 0.5 * (lo + hi)


def lbfgs_minimize(
    f,
    g,
    theta0: np.ndarray,
    m: int = DEFAULT_LBFGS_MEM,
    tol_grad: float = DEFAULT_TOL_GRAD,
    tol_cost: float = 0.0,
    max_iter: int = DEFAULT_MAX_ITER,
) -> OptimOutcome:
    x = np.asarray(theta0, dtype=np.float64).copy()
    fx = f(x)
    gx = g(x)
    evals = 1
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    it = 0
    msg = "MaxIterReached"
    for it in range(1, max_iter + 1):
        gnorm = float(np.linalg.norm(gx))
        if gnorm <= tol_grad:
            msg = "GradientConverged"
            break
        # two-loop recursion
        q = gx.copy()
        alphas = []
        for s, y in zip(reversed(s_hist), reversed(y_hist)):
            rho = 1.0 / float(y @ s)
            a = rho * float(s @ q)
            alphas.append((a, rho, s, y))
            q -= a * y
        if y_hist:
            y_last, s_last = y_hist[-1], s_hist[-1]
            q *= float(s_last @ y_last) / float(y_last @ y_last)
        for a, rho, s, y in reversed(alphas):
            b = rho * float(y @ q)
            q += (a - b) * s
        p = -q
        step, ls_evals = _wolfe_line_search(f, g, x, p, fx, gx)
        evals += ls_evals
        if step is None or step <= 0:
            msg = "LineSearchFailed"
            break
        x_new = x + step * p
        f_new = f(x_new)
        g_new = g(x_new)
        evals += 1
        if tol_cost > 0 and abs(fx - f_new) <= tol_cost * max(1.0, abs(fx)):
            x, fx, gx = x_new, f_new, g_new
            msg = "CostConverged"
            break
        s_vec = x_new - x
        y_vec = g_new - gx
        if float(s_vec @ y_vec) > 1e-10 * float(np.linalg.norm(s_vec)) * float(np.linalg.norm(y_vec)):
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > m:
                s_hist.pop(0)
                y_hist.pop(0)
        x, fx, gx = x_new, f_new, g_new
    gnorm = float(np.linalg.norm(gx))
    return OptimOutcome(
        theta_hat=x,
        value=fx,
        iterations=it,
        fn_evals=evals,
        grad_norm=gnorm,
        converged=msg in ("GradientConverged", "CostConverged"),
        message=msg,
    )
