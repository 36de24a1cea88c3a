"""Optimizer surface parity with the reference
(src/optimization/loglik_optimizer/): named line searchers
(traits.rs:179-189, builders.rs:131-196), FD-gradient fallback
(adapter.rs:311-349, finite_diff.rs:154-165), full outcome fields
(traits.rs:593-602)."""

import numpy as np
import pytest

from rust_timeseries_spark.stats.optim import (
    OptimOutcome,
    fd_gradient,
    lbfgs_minimize,
    parse_line_searcher,
)


def rosenbrock(x):
    return float(100.0 * (x[1] - x[0] ** 2) ** 2 + (1.0 - x[0]) ** 2)


def rosenbrock_grad(x):
    return np.array(
        [
            -400.0 * x[0] * (x[1] - x[0] ** 2) - 2.0 * (1.0 - x[0]),
            200.0 * (x[1] - x[0] ** 2),
        ]
    )


def test_line_searcher_name_parsing():
    # traits.rs:179-189: case-insensitive, only the two names
    for s in ["MoreThuente", "morethuente", "MORETHUENTE", "more_thuente", "More-Thuente"]:
        assert parse_line_searcher(s) == "more_thuente"
    for s in ["HagerZhang", "hagerzhang", "HAGERZHANG", "hager_zhang"]:
        assert parse_line_searcher(s) == "hager_zhang"
    with pytest.raises(ValueError, match="MoreThuente.*HagerZhang"):
        parse_line_searcher("wolfe")


@pytest.mark.parametrize("ls", ["MoreThuente", "HagerZhang"])
def test_lbfgs_rosenbrock_both_searchers(ls):
    out = lbfgs_minimize(rosenbrock, rosenbrock_grad, np.array([-1.2, 1.0]),
                         tol_grad=1e-8, max_iter=200, line_searcher=ls)
    assert out.converged, out.term_status
    assert np.allclose(out.theta_hat, [1.0, 1.0], atol=1e-6)
    assert out.value < 1e-12
    # full outcome surface (traits.rs:593-602); near f*=0 the absolute
    # ε cost-stagnation check may fire before ‖g‖ ≤ 1e-8 — both are
    # SolverConverged in argmin
    assert isinstance(out, OptimOutcome)
    assert out.fn_evals > out.iterations
    assert out.term_status in ("GradientConverged", "CostConverged")
    assert out.message == out.term_status  # legacy alias


def test_lbfgs_quadratic_exact_both_searchers():
    A = np.array([[3.0, 1.0], [1.0, 2.0]])
    b = np.array([1.0, -4.0])
    f = lambda x: float(0.5 * x @ A @ x - b @ x)  # noqa: E731
    g = lambda x: A @ x - b  # noqa: E731
    x_star = np.linalg.solve(A, b)
    for ls in ("more_thuente", "hager_zhang"):
        out = lbfgs_minimize(f, g, np.zeros(2), tol_grad=1e-10, line_searcher=ls)
        assert out.converged
        assert np.allclose(out.theta_hat, x_star, atol=1e-8), ls


def test_fd_gradient_central_matches_analytic():
    x = np.array([0.3, -0.7])
    assert np.allclose(fd_gradient(rosenbrock, x), rosenbrock_grad(x), rtol=1e-6)


def test_fd_gradient_forward_fallback_on_nonfinite():
    # f is +inf below x[0] = 0.3 — the central pass probes x[0] − h and
    # blows up; the forward pass (upward probes only) must take over
    def f(x):
        if x[0] < 0.3:
            return float("inf")
        return float((x[0] - 0.3) ** 2 + x[1] ** 2)

    g = fd_gradient(f, np.array([0.3, 0.5]))
    assert np.all(np.isfinite(g))
    assert abs(g[1] - 1.0) < 1e-4  # ∂/∂x1 = 2*0.5


def test_lbfgs_without_gradient_uses_fd_fallback():
    # adapter.rs:311-349: no analytic gradient → FD, optimization still converges
    out = lbfgs_minimize(rosenbrock, None, np.array([-1.2, 1.0]),
                         tol_grad=1e-5, max_iter=300)
    assert out.converged, (out.term_status, out.grad_norm)
    assert np.allclose(out.theta_hat, [1.0, 1.0], atol=1e-4)


def test_cost_stagnation_terminates_as_converged():
    # argmin LBFGS semantics: a cost that stops moving is SolverConverged
    f = lambda x: float(x[0] ** 2)  # noqa: E731
    g = lambda x: np.array([2.0 * x[0]])  # noqa: E731
    out = lbfgs_minimize(f, g, np.array([1.0]), tol_grad=0.0, max_iter=500)
    assert out.converged
    assert out.term_status == "CostConverged"


def test_acd_spec_line_searcher_passthrough():
    # both searchers recover simulated ACD parameters (CI smoke shape:
    # .github/workflows/ci.yml:74-124 — small n, exponential law)
    from rust_timeseries_spark.datagen import simulate_acd
    from rust_timeseries_spark.stats import acd as acd_stats

    x = simulate_acd(n=400, omega=0.2, alpha=[0.15], beta=[0.6], seed=7)["x"]
    results = {}
    for ls in ("MoreThuente", "HagerZhang"):
        spec = acd_stats.AcdSpec(p=1, q=1, line_searcher=ls)
        r = acd_stats.fit_series(x, np.zeros(3), spec)
        assert r["converged"], (ls, r["term_status"])
        assert r["term_status"] in ("GradientConverged", "CostConverged")
        assert r["fn_evals"] > 0
        results[ls] = (r["omega"], float(r["alpha"][0]), float(r["beta"][0]))
    # tolerance-level agreement between the two searchers (same optimum)
    a, b = results["MoreThuente"], results["HagerZhang"]
    assert np.allclose(a, b, atol=1e-3), (a, b)
    with pytest.raises(ValueError, match="MoreThuente"):
        acd_stats.fit_series(x, np.zeros(3), acd_stats.AcdSpec(line_searcher="nope"))
