import numpy as np

from rust_timeseries_spark import datagen
from rust_timeseries_spark.stats import acd
from rust_timeseries_spark.stats.acd import AcdSpec


def test_innovation_draws_unit_mean():
    for law, params in [
        ("exponential", {}),
        ("weibull", {"k": 1.5}),
        ("generalized_gamma", {"p": 2.0, "d": 3.0}),
    ]:
        eps = datagen.draw_innovations(200_000, law, params, seed=42)
        assert abs(eps.mean() - 1.0) < 0.02, (law, eps.mean())
        assert np.all(eps > 0)


def test_simulate_acd_stationary_mean():
    omega, alpha, beta = 0.2, [0.3], [0.5]
    sim = datagen.simulate_acd(100_000, omega, alpha, beta, seed=7)
    mu = omega / (1 - 0.3 - 0.5)
    assert abs(sim["x"].mean() - mu) / mu < 0.05
    assert np.all(sim["psi"] > 0)


def test_fit_recovers_simulated_params():
    # end-to-end MLE validation: simulate ACD(1,1), fit, recover params
    # (n kept modest: the recursion kernels are per-t Python loops)
    omega, alpha, beta = 0.4, [0.25], [0.45]
    sim = datagen.simulate_acd(4_000, omega, alpha, beta, seed=11)
    r = acd.fit_series(sim["x"], np.zeros(3), AcdSpec(p=1, q=1, max_iter=120))
    assert abs(r["omega"] - omega) < 0.15, r["omega"]
    assert abs(r["alpha"][0] - alpha[0]) < 0.08, r["alpha"]
    assert abs(r["beta"][0] - beta[0]) < 0.15, r["beta"]


def test_simulate_cold_start_deterministic():
    a = datagen.simulate_acd(100, 0.2, [0.3], [0.5], psi_init=[1.0], seed=3)
    b = datagen.simulate_acd(100, 0.2, [0.3], [0.5], psi_init=[1.0], seed=3)
    np.testing.assert_array_equal(a["x"], b["x"])
