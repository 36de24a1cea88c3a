import numpy as np
import pytest

from rust_timeseries_spark import datagen
from rust_timeseries_spark.functions import scalar as S
from rust_timeseries_spark.stats import acd
from rust_timeseries_spark.stats.acd import AcdSpec


def test_theta_params_roundtrip():
    # params → θ → params must be identity (to_theta/from_theta pair)
    omega, alpha, beta = 0.4, np.array([0.15, 0.1]), np.array([0.3])
    slack = (1 - 1e-6) - alpha.sum() - beta.sum()
    theta = S.params_to_theta(omega, alpha, beta, slack)
    o2, a2, b2, s2 = S.theta_to_params(theta, p=1, q=2)
    assert abs(o2 - omega) < 1e-12
    np.testing.assert_allclose(a2, alpha, rtol=1e-10)
    np.testing.assert_allclose(b2, beta, rtol=1e-10)
    assert abs(s2 - slack) < 1e-10


def test_softmax_sums_to_scale():
    a, b, slack = S.safe_softmax(np.array([0.3, -0.5, 1.2]), q=2, p=1)
    total = a.sum() + b.sum() + slack
    assert abs(total - (1 - 1e-6)) < 1e-14


@pytest.mark.parametrize("spec", [
    AcdSpec(p=1, q=1),
    AcdSpec(p=1, q=2),
    AcdSpec(p=2, q=1),
    AcdSpec(p=1, q=1, init="sample_mean"),
    AcdSpec(p=1, q=1, law="weibull", law_params={"k": 1.5}),
    AcdSpec(p=1, q=1, t0=10),
])
def test_grad_matches_fd(spec):
    # the reference's own cross-check discipline (psi.rs:71-74, acd.rs:80-82)
    x = datagen.noisy_durations(80)
    theta = np.array([0.1, -0.2, 0.3, 0.05][: 1 + spec.q + spec.p])
    g = acd.grad(x, theta, spec)
    h = 1e-6
    for i in range(len(theta)):
        tp, tm = theta.copy(), theta.copy()
        tp[i] += h
        tm[i] -= h
        fd = (acd.loglik(x, tp, spec) - acd.loglik(x, tm, spec)) / (2 * h)
        assert abs(g[i] - fd) < 1e-4 * max(1.0, abs(fd)), (i, g[i], fd)


def test_loglik_exponential_manual():
    # Exp(1): ℓ = Σ −x/ψ − ln ψ
    spec = AcdSpec(p=1, q=1, init="fixed", init_value=1.0)
    x = np.array([1.0, 2.0, 1.5])
    theta = np.array([0.2, -0.1, 0.4])
    from rust_timeseries_spark.operators.recursion import psi_recursion_np
    omega, alpha, beta, _ = S.theta_to_params(theta, 1, 1)
    psi = psi_recursion_np(x, omega, alpha, beta, np.array([1.0]), np.array([1.0]))
    exp_ll = float(np.sum(-x / psi - np.log(psi)))
    assert abs(acd.loglik(x, theta, spec) - exp_ll) < 1e-12


def test_fit_ci_smoke_fixture():
    # .github/workflows/ci.yml:86-106: ACD(1,1) on 1+|N(1,0.2)|, n=200
    x = datagen.noisy_durations(200)
    r = acd.fit_series(x, np.zeros(3), AcdSpec(p=1, q=1))
    assert r["converged"] or r["grad_norm"] < 1e-3
    assert r["omega"] > 0
    assert np.all(r["alpha"] >= 0) and np.all(r["beta"] >= 0)
    assert r["alpha"].sum() + r["beta"].sum() < 1.0
    assert np.isfinite(r["loglik"])
    assert len(r["psi_lags"]) == 1 and r["psi_lags"][0] > 0


def test_fit_with_t0_offset():
    # integration_acd_pipline.rs:477-509
    x = datagen.trending_durations(256, 1.0)
    r = acd.fit_series(x, np.zeros(3), AcdSpec(p=1, q=1, t0=50))
    assert np.isfinite(r["loglik"])
    assert r["omega"] > 0


def test_fit_rejects_bad_data():
    with pytest.raises(ValueError, match="NonPositiveData"):
        acd.fit_series(np.array([1.0, -2.0, 3.0]), np.zeros(3), AcdSpec())


def test_covariance_shapes_and_robust_differs():
    # integration_acd_pipline.rs:345-386: HAC ≠ classical on trending n=512
    x = datagen.trending_durations(512, 1.0, slope=0.002)
    spec = AcdSpec(p=1, q=1)
    r = acd.fit_series(x, np.zeros(3), spec)
    cov_c = acd.covariance_series(x, r["theta_hat"], spec, robust=False)
    cov_r = acd.covariance_series(x, r["theta_hat"], spec, robust=True, kernel="bartlett")
    for c in (cov_c, cov_r):
        assert c.shape == (3, 3)
        assert np.all(np.isfinite(c))
        assert np.all(np.diag(c) >= 0)
    assert not np.allclose(cov_c, cov_r)


def test_spark_acd_fit_multi_key(spark):
    arrays = {
        f"k{i}": datagen.trending_durations(128, base)
        for i, base in enumerate([0.5, 1.0, 5.0])
    }
    arrays["noisy"] = datagen.noisy_durations(200)
    df = datagen.series_df(spark, arrays)
    rows = {r["key"]: r for r in acd.acd_fit(df, ["key"], AcdSpec(p=1, q=1)).collect()}
    assert set(rows) == set(arrays)
    for k, r in rows.items():
        assert r["error"] is None, (k, r["error"])
        assert r["omega"] > 0
        assert np.isfinite(r["loglik"])
    # numpy equivalence for one key
    exp = acd.fit_series(arrays["noisy"], np.zeros(3), AcdSpec(p=1, q=1))
    assert rows["noisy"]["loglik"] == exp["loglik"]
    assert rows["noisy"]["omega"] == exp["omega"]


def test_spark_acd_covariance(spark):
    df = datagen.series_df(spark, {"a": datagen.noisy_durations(200)})
    rows = acd.acd_covariance(df, ["key"], AcdSpec(p=1, q=1), robust=True).collect()
    assert rows[0]["error"] is None
    cov = np.array(rows[0]["cov"]).reshape(3, 3)
    assert np.all(np.isfinite(cov)) and np.all(np.diag(cov) >= 0)


def test_acd_loglik_fixed_spark_matches_numpy(spark):
    # the per-key fixed-theta loglik operator (the oracle-able companion
    # of acd_fit) must equal the single-series kernel exactly
    import numpy as np

    sim = datagen.simulate_acd(n=200, omega=0.2, alpha=[0.15], beta=[0.6], seed=3)["x"]
    rows = [("a", int(t), float(v)) for t, v in enumerate(sim)]
    rows += [("b", int(t), float(v)) for t, v in enumerate(sim[::-1])]
    df = spark.createDataFrame(rows, "key string, t long, v double")
    spec = AcdSpec(p=1, q=1)
    got = {r["key"]: r["loglik"] for r in
           acd.acd_loglik_fixed(df, ["key"], spec, omega=0.2, alpha=[0.2], beta=[0.3]).collect()}
    assert got["a"] == acd.loglik_at_params(np.asarray(sim), 0.2, [0.2], [0.3], spec)
    assert got["b"] == acd.loglik_at_params(np.asarray(sim[::-1]).copy(), 0.2, [0.2], [0.3], spec)


def test_native_dpsi11_bit_identical_to_python_loop():
    import pytest as _pytest

    native = _pytest.importorskip("rust_timeseries_spark.native")
    if not native.HAVE_NATIVE:
        _pytest.skip("no C compiler in environment")
    import numpy as np

    from rust_timeseries_spark.constants import STATIONARITY_MARGIN
    from rust_timeseries_spark.functions import scalar as S
    from rust_timeseries_spark.stats import acd as A

    rng = np.random.default_rng(22)
    x = np.abs(rng.normal(size=5003)) + 0.01
    x /= x.mean()
    spec = A.AcdSpec(p=1, q=1)
    for om, a0, b0 in [(0.2, 0.2, 0.3), (0.1, 0.05, 0.8)]:
        theta = S.params_to_theta(
            om, np.array([a0]), np.array([b0]),
            1.0 - STATIONARITY_MARGIN - a0 - b0,
        )
        saved = A._native
        A._native = None
        try:
            psi_py, deriv_py, *_ = A._deriv_and_psi(x, theta, spec)
        finally:
            A._native = saved
        psi_ct, deriv_ct, *_ = A._deriv_and_psi(x, theta, spec)
        np.testing.assert_array_equal(psi_py.view(np.uint64), psi_ct.view(np.uint64))
        np.testing.assert_array_equal(deriv_py.view(np.uint64), deriv_ct.view(np.uint64))
