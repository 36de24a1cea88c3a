"""L-BFGS with selectable line searches, pure numpy.

Re-expresses the reference's optimizer stack
(src/optimization/loglik_optimizer/{run.rs,builders.rs,traits.rs,
adapter.rs}) without scipy (unavailable in this environment):

* **L-BFGS** two-loop recursion, memory m=7 (types.rs:91).
* **Line searchers by name**, case-insensitive, exactly the reference's
  surface (traits.rs:179-189: ``"MoreThuente"`` / ``"HagerZhang"`` any
  case; anything else is an error):
  - More–Thuente (builders.rs:191-196, the default) — the MINPACK
    cvsrch/cstep algorithm (Moré & Thuente 1994, public domain), strong
    Wolfe termination;
  - Hager–Zhang (builders.rs:131-141) — CG_DESCENT bracket/secant²
    (Hager & Zhang 2005), approximate-Wolfe termination.
* **FD gradient fallback** (adapter.rs:311-349, finite_diff.rs:154-165):
  when no analytic gradient is supplied, central differences; if the
  central-difference pass hits a non-finite cost, retry with forward
  differences.
* **Termination parity** (traits.rs:368-377 + argmin's LBFGS): converge
  on ‖g‖ ≤ tol_grad, or on cost stagnation |f_k − f_{k+1}| < tol_cost
  (argmin defaults tol_cost to machine ε — a fully stalled line search
  is SolverConverged there, not an error), or stop at max_iter.
* **Full outcome** (traits.rs:593-602): θ̂, value, iterations, fn_evals,
  grad_norm, converged, term_status.

Parity with the reference optimizer is tolerance-level by design
(SURVEY.md §7.2.3): golden tests pin the deterministic stages exactly
and θ̂ within tolerance.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import DEFAULT_LBFGS_MEM, DEFAULT_MAX_ITER, DEFAULT_TOL_GRAD

#: |f_k − f_{k+1}| < this ⇒ SolverConverged (argmin LBFGS default ε)
DEFAULT_TOL_COST = float(np.finfo(np.float64).eps)

_LINE_SEARCHERS = ("more_thuente", "hager_zhang")


def parse_line_searcher(name: str) -> str:
    """Case-insensitive line-searcher name parsing — the reference's
    ``LineSearcher::from_str`` (traits.rs:179-189). Separators (_ -) are
    ignored so ``"MoreThuente"``, ``"morethuente"`` and
    ``"more_thuente"`` all resolve."""
    key = name.lower().replace("_", "").replace("-", "")
    if key == "morethuente":
        return "more_thuente"
    if key == "hagerzhang":
        return "hager_zhang"
    raise ValueError(
        f"invalid line searcher {name!r}: valid options are case insensitive "
        "'MoreThuente' or 'HagerZhang'"
    )


@dataclass
class OptimOutcome:
    theta_hat: np.ndarray
    value: float  # final cost (minimization) — callers flip sign for ℓ
    iterations: int
    fn_evals: int
    grad_norm: float
    converged: bool
    term_status: str

    @property
    def message(self) -> str:  # backwards-compatible alias
        return self.term_status


# ---------------------------------------------------------------------------
# finite-difference gradient fallback (adapter.rs:311-349)
# ---------------------------------------------------------------------------

def fd_gradient(f, x: np.ndarray, fx: float | None = None) -> np.ndarray:
    """Central-difference gradient; if any probe is non-finite, redo the
    whole gradient with forward differences (finite_diff.rs:154-165 —
    forward probes stay closer to the feasible point)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    h = np.sqrt(np.finfo(np.float64).eps) * np.maximum(1.0, np.abs(x))
    g = np.empty(n)
    ok = True
    for i in range(n):
        e = np.zeros(n)
        e[i] = h[i]
        fp, fm = f(x + e), f(x - e)
        if not (np.isfinite(fp) and np.isfinite(fm)):
            ok = False
            break
        g[i] = (fp - fm) / (2.0 * h[i])
    if ok and np.all(np.isfinite(g)):
        return g
    f0 = f(x) if fx is None else fx
    for i in range(n):
        e = np.zeros(n)
        e[i] = h[i]
        g[i] = (f(x + e) - f0) / h[i]
    if not np.all(np.isfinite(g)):
        # both passes hit a non-finite cost region — erroring beats
        # returning an inf/NaN gradient that poisons L-BFGS state
        # (adapter.rs validate_grad rejects non-finite gradients)
        bad = int(np.argmin(np.isfinite(g)))
        raise ValueError(f"NonFiniteGradient: component={bad} value={g[bad]}")
    return g


# ---------------------------------------------------------------------------
# More–Thuente line search (MINPACK cvsrch/cstep; Moré & Thuente 1994)
# ---------------------------------------------------------------------------

def _mt_cstep(stx, fx_, dx_, sty, fy, dy, stp, fp_, dp_, brackt, stmin, stmax):
    """MINPACK ``cstep``: trial-step update by cubic/quadratic
    interpolation with the four MT cases. Returns the updated
    (stx, fx, dx, sty, fy, dy, stp, brackt)."""
    sgnd = dp_ * np.sign(dx_)
    if fp_ > fx_:
        # case 1: higher function value — minimum bracketed
        theta = 3.0 * (fx_ - fp_) / (stp - stx) + dx_ + dp_
        s = max(abs(theta), abs(dx_), abs(dp_))
        # discriminant is analytically >= 0 here; clamp absorbs rounding
        gamma = s * np.sqrt(max(0.0, (theta / s) ** 2 - (dx_ / s) * (dp_ / s)))
        if stp < stx:
            gamma = -gamma
        p = (gamma - dx_) + theta
        q = ((gamma - dx_) + gamma) + dp_
        r = p / q
        stpc = stx + r * (stp - stx)
        stpq = stx + ((dx_ / ((fx_ - fp_) / (stp - stx) + dx_)) / 2.0) * (stp - stx)
        stpf = stpc if abs(stpc - stx) < abs(stpq - stx) else stpc + (stpq - stpc) / 2.0
        brackt = True
    elif sgnd < 0.0:
        # case 2: lower value, opposite derivative signs
        theta = 3.0 * (fx_ - fp_) / (stp - stx) + dx_ + dp_
        s = max(abs(theta), abs(dx_), abs(dp_))
        gamma = s * np.sqrt(max(0.0, (theta / s) ** 2 - (dx_ / s) * (dp_ / s)))
        if stp > stx:
            gamma = -gamma
        p = (gamma - dp_) + theta
        q = ((gamma - dp_) + gamma) + dx_
        r = p / q
        stpc = stp + r * (stx - stp)
        stpq = stp + (dp_ / (dp_ - dx_)) * (stx - stp)
        stpf = stpc if abs(stpc - stp) > abs(stpq - stp) else stpq
        brackt = True
    elif abs(dp_) < abs(dx_):
        # case 3: lower value, same sign, decreasing magnitude
        theta = 3.0 * (fx_ - fp_) / (stp - stx) + dx_ + dp_
        s = max(abs(theta), abs(dx_), abs(dp_))
        arg = (theta / s) ** 2 - (dx_ / s) * (dp_ / s)
        gamma = s * np.sqrt(max(0.0, arg))
        if stp > stx:
            gamma = -gamma
        p = (gamma - dp_) + theta
        q = (gamma + (dx_ - dp_)) + gamma
        r = p / q
        if r < 0.0 and gamma != 0.0:
            stpc = stp + r * (stx - stp)
        elif stp > stx:
            stpc = stmax
        else:
            stpc = stmin
        stpq = stp + (dp_ / (dp_ - dx_)) * (stx - stp)
        if brackt:
            stpf = stpc if abs(stp - stpc) < abs(stp - stpq) else stpq
            # MINPACK dcstep p66 safeguard: keep the bracketed trial
            # step at least 0.34 of the interval away from sty so the
            # bracket cannot collapse onto its far end
            if stp > stx:
                stpf = min(stp + 0.66 * (sty - stp), stpf)
            else:
                stpf = max(stp + 0.66 * (sty - stp), stpf)
        else:
            stpf = stpc if abs(stp - stpc) > abs(stp - stpq) else stpq
    else:
        # case 4: lower value, same sign, not decreasing
        if brackt:
            theta = 3.0 * (fp_ - fy) / (sty - stp) + dy + dp_
            s = max(abs(theta), abs(dy), abs(dp_))
            gamma = s * np.sqrt(max(0.0, (theta / s) ** 2 - (dy / s) * (dp_ / s)))
            if stp > sty:
                gamma = -gamma
            p = (gamma - dp_) + theta
            q = ((gamma - dp_) + gamma) + dy
            r = p / q
            stpc = stp + r * (sty - stp)
            stpf = stpc
        elif stp > stx:
            stpf = stmax
        else:
            stpf = stmin

    # update the interval
    if fp_ > fx_:
        sty, fy, dy = stp, fp_, dp_
    else:
        if sgnd < 0.0:
            sty, fy, dy = stx, fx_, dx_
        stx, fx_, dx_ = stp, fp_, dp_
    stp = min(max(stpf, stmin), stmax)
    return stx, fx_, dx_, sty, fy, dy, stp, brackt


def _more_thuente(phi, dphi, phi0, dphi0, c1=1e-4, c2=0.9, xtol=1e-10,
                  step0=1.0, stpmin=1e-20, stpmax=1e20, max_iter=30):
    """MINPACK ``cvsrch``: returns (step, n_evals) with ``step=None`` on
    failure. Stage 1 works on ψ(α)=φ(α)−φ(0)−c1·α·φ'(0); once ψ ≤ 0 and
    φ' ≥ 0, switches to φ itself. Strong-Wolfe termination."""
    evals = 0
    if dphi0 >= 0.0:
        return None, evals
    brackt = False
    stage1 = True
    stp = step0
    width = stpmax - stpmin
    width1 = 2.0 * width
    stx = sty = 0.0
    fx_ = fy = phi0
    dx_ = dy = dphi0
    dgtest = c1 * dphi0
    for _ in range(max_iter):
        if brackt:
            stmin, stmax = min(stx, sty), max(stx, sty)
        else:
            stmin, stmax = stx, stp + 4.0 * (stp - stx)
        stp = min(max(stp, stpmin), stpmax)
        if (brackt and (stp <= stmin or stp >= stmax)) or (
            brackt and stmax - stmin <= xtol * stmax
        ):
            stp = stx
        f_ = phi(stp)
        evals += 1
        if not np.isfinite(f_):
            # shrink toward the good end — argmin's MT treats a
            # non-finite probe as "too far". The gradient is NOT
            # evaluated at a non-finite point (it may be garbage or
            # raise, and it costs a full O(n) recursion).
            stp = stx + 0.5 * (stp - stx)
            if abs(stp - stx) < 1e-18:
                return (stx if stx > 0 else None), evals
            continue
        d_ = dphi(stp)
        ftest = phi0 + stp * dgtest
        # convergence: strong Wolfe
        if f_ <= ftest and abs(d_) <= c2 * (-dphi0):
            return stp, evals
        # interval too small / step at bounds → accept best point so far
        if brackt and (stmax - stmin) <= xtol * stmax:
            return (stp if f_ <= fx_ else stx), evals
        if stp == stpmax and f_ <= ftest and d_ <= dgtest:
            return stp, evals
        if stp == stpmin and (f_ > ftest or d_ >= dgtest):
            return None, evals
        if stage1 and f_ <= ftest and d_ >= min(c1, c2) * dphi0:
            stage1 = False
        if stage1 and f_ <= fx_ and f_ > ftest:
            # modified function ψ
            fm = f_ - stp * dgtest
            fxm = fx_ - stx * dgtest
            fym = fy - sty * dgtest
            dm = d_ - dgtest
            dxm = dx_ - dgtest
            dym = dy - dgtest
            stx, fxm, dxm, sty, fym, dym, stp, brackt = _mt_cstep(
                stx, fxm, dxm, sty, fym, dym, stp, fm, dm, brackt, stmin, stmax
            )
            fx_ = fxm + stx * dgtest
            fy = fym + sty * dgtest
            dx_ = dxm + dgtest
            dy = dym + dgtest
        else:
            stx, fx_, dx_, sty, fy, dy, stp, brackt = _mt_cstep(
                stx, fx_, dx_, sty, fy, dy, stp, f_, d_, brackt, stmin, stmax
            )
        if brackt:
            if abs(sty - stx) >= 0.66 * width1:
                stp = stx + 0.5 * (sty - stx)
            width1 = width
            width = abs(sty - stx)
    return (stx if stx > 0.0 else None), evals


# ---------------------------------------------------------------------------
# Hager–Zhang line search (CG_DESCENT; Hager & Zhang 2005, SIAM J. Optim.)
# ---------------------------------------------------------------------------

def _hager_zhang(phi, dphi, phi0, dphi0, delta=0.1, sigma=0.9,
                 eps=1e-6, theta=0.5, gamma=0.66, step0=1.0, max_iter=30):
    """Bracket → secant² → bisection-safeguard loop with approximate
    Wolfe termination: σ·φ'(0) ≤ φ'(α) ≤ (2δ−1)·φ'(0) with
    φ(α) ≤ φ(0)+ε_k, or the original Wolfe pair."""
    evals = 0
    if dphi0 >= 0.0:
        return None, evals
    eps_k = eps * abs(phi0)

    def ok(a, fa, da):
        if fa <= phi0 + delta * a * dphi0 and abs(da) <= -sigma * dphi0:
            return True  # strong Wolfe
        return (2.0 * delta - 1.0) * dphi0 >= da >= sigma * dphi0 and fa <= phi0 + eps_k

    def eval_at(a):
        # cost first; the gradient is only evaluated at finite-cost
        # points (callers treat a non-finite fa as "too far" and never
        # read da)
        nonlocal evals
        evals += 1
        fa = phi(a)
        if not np.isfinite(fa):
            return fa, np.nan
        return fa, dphi(a)

    # ---- bracket [a, b] with: φ'(a) < 0, φ(a) ≤ φ0+ε_k, φ'(b) ≥ 0 (or φ(b) > φ0+ε_k)
    a, fa, da = 0.0, phi0, dphi0
    c = step0
    for _ in range(max_iter):
        fc, dc = eval_at(c)
        if not np.isfinite(fc):
            c = a + 0.5 * (c - a)
            continue
        if ok(c, fc, dc):
            return c, evals
        if dc >= 0.0:
            b, fb, db = c, fc, dc
            break
        if fc > phi0 + eps_k:
            # U3: high point with negative slope — shrink into [a, c]
            b, fb, db = c, fc, dc
            for _ in range(max_iter):
                d = (1.0 - theta) * a + theta * b
                fd, dd = eval_at(d)
                if not np.isfinite(fd):
                    b, fb, db = d, fd, dd
                    continue
                if ok(d, fd, dd):
                    return d, evals
                if dd >= 0.0:
                    b, fb, db = d, fd, dd
                    break
                if fd <= phi0 + eps_k:
                    a, fa, da = d, fd, dd
                else:
                    b, fb, db = d, fd, dd
            else:
                return None, evals
            break
        a, fa, da = c, fc, dc
        c *= 5.0
    else:
        return None, evals

    # ---- secant² + safeguard on [a, b]
    def secant(p, dp_, q, dq):
        denom = dq - dp_
        if denom == 0.0:
            return 0.5 * (p + q)
        return (p * dq - q * dp_) / denom

    for _ in range(max_iter):
        if b - a < 1e-18:
            return (a if a > 0.0 else None), evals
        c = secant(a, da, b, db)
        if not (a < c < b):
            c = 0.5 * (a + b)
        fc, dc = eval_at(c)
        if not np.isfinite(fc):
            b, fb, db = c, np.inf, 1.0
            continue
        if ok(c, fc, dc):
            return c, evals
        a_old, b_old = a, b
        if dc >= 0.0:
            b, fb, db = c, fc, dc
        elif fc <= phi0 + eps_k:
            a, fa, da = c, fc, dc
        else:
            b, fb, db = c, fc, dc
        if b - a > gamma * (b_old - a_old):
            m = 0.5 * (a + b)
            fm, dm = eval_at(m)
            if np.isfinite(fm) and ok(m, fm, dm):
                return m, evals
            if np.isfinite(fm):
                if dm >= 0.0 or fm > phi0 + eps_k:
                    b, fb, db = m, fm, dm
                else:
                    a, fa, da = m, fm, dm
            else:
                b, fb, db = m, np.inf, 1.0
    return (a if a > 0.0 else None), evals


# ---------------------------------------------------------------------------
# L-BFGS driver
# ---------------------------------------------------------------------------

def lbfgs_minimize(
    f,
    g=None,
    theta0: np.ndarray | None = None,
    m: int = DEFAULT_LBFGS_MEM,
    tol_grad: float = DEFAULT_TOL_GRAD,
    tol_cost: float = DEFAULT_TOL_COST,
    max_iter: int = DEFAULT_MAX_ITER,
    line_searcher: str = "more_thuente",
    verbose: bool = False,
) -> OptimOutcome:
    """Minimize ``f`` from ``theta0``. ``g=None`` engages the FD
    gradient fallback (central→forward, adapter.rs:311-349).

    ``tol_cost`` is an ABSOLUTE cost-stagnation threshold (argmin LBFGS
    semantics: default machine ε, SolverConverged when the cost stops
    moving); pass 0 to disable."""
    searcher = parse_line_searcher(line_searcher)
    x = np.asarray(theta0, dtype=np.float64).copy()
    evals = 0

    if g is None:
        def g(t, _f=f):  # noqa: ANN001
            return fd_gradient(_f, t)

    fx = f(x)
    gx = np.asarray(g(x), dtype=np.float64)
    evals += 1
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    it = 0
    status = "MaxIterReached"
    for it in range(1, max_iter + 1):
        gnorm = float(np.linalg.norm(gx))
        if gnorm <= tol_grad:
            status = "GradientConverged"
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

        # memoize the line search's own evaluations: both searchers end
        # on a step whose phi AND dphi they just computed, so the driver
        # would otherwise pay one redundant f and one redundant g per
        # iteration (review r4 — ~2 full ψ recursions per L-BFGS step in
        # the ACD fit hot path). f(x + a·p) here and f(x_new) below are
        # the same float expression, so reuse is bit-identical.
        f_cache: dict[float, float] = {}
        g_cache: dict[float, np.ndarray] = {}

        def phi(a, _x=x, _p=p):
            nonlocal evals
            if a in f_cache:
                return f_cache[a]
            evals += 1
            val = f(_x + a * _p)
            f_cache[a] = val
            return val

        def dphi(a, _x=x, _p=p):
            if a not in g_cache:
                g_cache[a] = np.asarray(g(_x + a * _p), dtype=np.float64)
            return float(g_cache[a] @ _p)

        dphi0 = float(gx @ p)
        if searcher == "hager_zhang":
            step, ls_evals = _hager_zhang(phi, dphi, fx, dphi0)
        else:
            step, ls_evals = _more_thuente(phi, dphi, fx, dphi0)
        if step is None or step <= 0:
            status = "LineSearchFailed"
            break
        x_new = x + step * p
        if step in f_cache:
            f_new = f_cache[step]
        else:
            f_new = f(x_new)
            evals += 1
        if step in g_cache:
            g_new = g_cache[step]
        else:
            g_new = np.asarray(g(x_new), dtype=np.float64)
        if verbose:
            print(f"[lbfgs it={it}] f={f_new:.10g} step={step:.3g} "
                  f"|g|={float(np.linalg.norm(g_new)):.3g} evals={evals}")
        cost_moved = abs(fx - f_new)
        s_vec = x_new - x
        y_vec = g_new - gx
        if float(s_vec @ y_vec) > 1e-10 * float(np.linalg.norm(s_vec)) * float(np.linalg.norm(y_vec)):
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > m:
                s_hist.pop(0)
                y_hist.pop(0)
        x, fx, gx = x_new, f_new, g_new
        if tol_cost > 0 and cost_moved < tol_cost:
            status = "CostConverged"
            break
    gnorm = float(np.linalg.norm(gx))
    if status == "MaxIterReached" and gnorm <= tol_grad:
        status = "GradientConverged"
    return OptimOutcome(
        theta_hat=x,
        value=fx,
        iterations=it,
        fn_evals=evals,
        grad_norm=gnorm,
        converged=status in ("GradientConverged", "CostConverged"),
        term_status=status,
    )
