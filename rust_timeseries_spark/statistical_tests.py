"""Drop-in module path parity with the reference package layout:
``rust_timeseries.statistical_tests`` (reference
rust_timeseries/statistical_tests.pyi — same ``__all__``)."""

from .api import EscancianoLobato

__all__ = ["EscancianoLobato"]
