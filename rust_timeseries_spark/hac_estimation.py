"""Drop-in module path parity with the reference package layout:
``rust_timeseries.hac_estimation`` (reference
rust_timeseries/hac_estimation.pyi — same ``__all__``)."""

from .api import estimate_hac_covariance_matrix

__all__ = ["estimate_hac_covariance_matrix"]
