import numpy as np
import pytest

from rust_timeseries_spark import validation as V


def test_scalar_param_validators():
    assert V.validate_weibull_param(1.5) == 1.5
    for bad in (0.0, -1.0, float("nan"), float("inf")):
        with pytest.raises(ValueError, match="InvalidWeibullParam"):
            V.validate_weibull_param(bad)
        with pytest.raises(ValueError, match="InvalidGenGammaParam"):
            V.validate_gamma_param(bad)
    with pytest.raises(ValueError, match="InvalidOmega"):
        V.validate_omega(0.0)


def test_vector_validators():
    with pytest.raises(ValueError, match="InvalidDurationLength"):
        V.validate_duration_lags(np.array([1.0]), 2)
    with pytest.raises(ValueError, match="InvalidDurationLags: index=1"):
        V.validate_duration_lags(np.array([1.0, -1.0]), 2)
    with pytest.raises(ValueError, match="InvalidPsiLags"):
        V.validate_psi_lags(np.array([0.0]), 1)
    with pytest.raises(ValueError, match="AlphaLengthMismatch"):
        V.validate_alpha(np.array([0.1]), 2)
    with pytest.raises(ValueError, match="InvalidBeta: index=0"):
        V.validate_beta(np.array([-0.1]), 1)
    with pytest.raises(ValueError, match="ThetaLengthMismatch: expected=3 actual=2"):
        V.validate_theta(np.array([0.1, 0.2]), 1, 1)
    with pytest.raises(ValueError, match="InvalidThetaInput"):
        V.validate_theta(np.array([0.1, np.nan, 0.2]), 1, 1)


def test_stationarity_and_slack():
    a, b = np.array([0.2]), np.array([0.3])
    V.validate_stationarity_and_slack(a, b, (1 - 1e-6) - 0.5)  # ok
    with pytest.raises(ValueError, match="StationarityViolated"):
        V.validate_stationarity_and_slack(a, b, 0.6)
    with pytest.raises(ValueError, match="InvalidSlack"):
        V.validate_stationarity_and_slack(a, b, -0.1)


def test_loglik_and_series():
    with pytest.raises(ValueError, match="InvalidLogLikInput"):
        V.validate_loglik_params(-1.0, 1.0)
    with pytest.raises(ValueError, match="InvalidPsiLogLik"):
        V.validate_loglik_params(1.0, 0.0)
    with pytest.raises(ValueError, match="EmptySeries"):
        V.validate_series(np.array([]))
    with pytest.raises(ValueError, match="NonFiniteData"):
        V.validate_series(np.array([1.0, np.nan]))
    with pytest.raises(ValueError, match="NonPositiveData"):
        V.validate_series(np.array([1.0, 0.0]))
    with pytest.raises(ValueError, match="InvalidT0"):
        V.validate_series(np.array([1.0, 2.0]), t0=2)


def test_fit_series_uses_validators():
    from rust_timeseries_spark.stats import acd
    with pytest.raises(ValueError, match="NonPositiveData"):
        acd.fit_series(np.array([1.0, -2.0]), np.zeros(3), acd.AcdSpec())
    with pytest.raises(ValueError, match="ThetaLengthMismatch"):
        acd.fit_series(np.array([1.0, 2.0, 3.0]), np.zeros(2), acd.AcdSpec(p=1, q=1))


def test_error_taxonomy_completion():
    # the meta/options variants added in round 2 (errors.rs:172-289)
    with pytest.raises(ValueError, match="InvalidPsiGuards"):
        V.validate_psi_guards((1.0, 0.5))
    with pytest.raises(ValueError, match="InvalidPsiGuards"):
        V.validate_psi_guards((float("nan"), 1.0))
    with pytest.raises(ValueError, match="InvalidInitFixed"):
        V.validate_init_fixed(0.0)
    with pytest.raises(ValueError, match="InvalidModelShape"):
        V.validate_model_shape(0, 0)
    with pytest.raises(ValueError, match="InvalidModelShape"):
        V.validate_model_shape(-1, 1)
    with pytest.raises(ValueError, match="InvalidEpsilonFloor"):
        V.validate_epsilon_floor(-1e-9)
    with pytest.raises(ValueError, match="InvalidUnitMeanWeibull"):
        V.validate_unit_mean(float("inf"), "weibull")
    with pytest.raises(ValueError, match="InvalidUnitMeanGenGamma"):
        V.validate_unit_mean(0.0, "generalized_gamma")
    with pytest.raises(ValueError, match="NonFinitePsi"):
        V.validate_psi_finite(np.array([1.0, float("nan")]))
    with pytest.raises(ValueError, match="HessianDimMismatch"):
        V.validate_hessian(np.eye(2), 3)
    with pytest.raises(ValueError, match="InvalidHessian"):
        V.validate_hessian(np.array([[1.0, 0.0], [0.0, float("inf")]]), 2)
    with pytest.raises(ValueError, match="ZeroSimulationHorizon"):
        V.validate_horizon(0)
    with pytest.raises(ValueError, match="InsufficientPsiLength"):
        V.validate_psi_init_length(1, 2)


def test_unit_parsing_and_metadata_passthrough():
    # utils.rs:233-241 unit aliases, any case, default seconds
    assert V.parse_unit(None) == "seconds"
    assert V.parse_unit("S") == "seconds"
    assert V.parse_unit("Ms") == "milliseconds"
    assert V.parse_unit("US") == "microseconds"
    with pytest.raises(ValueError, match="invalid unit"):
        V.parse_unit("fortnights")
    from rust_timeseries_spark.stats import acd
    with pytest.raises(ValueError, match="invalid unit"):
        acd.AcdSpec(unit="hours").validated()
    with pytest.raises(ValueError, match="InvalidModelShape"):
        acd.AcdSpec(p=0, q=0).validated()
    ok = acd.AcdSpec(unit="MS", diurnal_adjusted=True).validated()
    assert ok.diurnal_adjusted


def test_forecast_and_simulate_horizon_guards():
    from rust_timeseries_spark.datagen import simulate_acd
    from rust_timeseries_spark.operators.recursion import forecast_np
    with pytest.raises(ValueError, match="ZeroSimulationHorizon"):
        simulate_acd(n=0, omega=0.2, alpha=[0.2], beta=[0.3])
    with pytest.raises(ValueError, match="ZeroSimulationHorizon"):
        forecast_np(0.2, [0.2], [0.3], [1.0], [1.0], horizon=0)
    with pytest.raises(ValueError, match="InsufficientPsiLength"):
        forecast_np(0.2, [0.2], [0.3, 0.3], [1.0], [1.0], horizon=2)
