"""Drop-in module path parity with the reference package layout:
``rust_timeseries.statistical_tests`` (reference
rust_timeseries/statistical_tests.pyi).

The reference's ``__all__`` is exactly ``["EscancianoLobato"]``;
``LjungBox`` is this engine landing the reference's own roadmap item
("further goodness-of-fit and residual tests under
``statistical_tests``", reference README.md:406-409) ahead of it — a
strict superset, placed where the reference says extensions go."""

from .api import EscancianoLobato, LjungBox

__all__ = ["EscancianoLobato", "LjungBox"]
