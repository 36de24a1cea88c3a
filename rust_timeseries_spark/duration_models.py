"""Drop-in module path parity with the reference package layout:
``rust_timeseries.duration_models`` → ``rust_timeseries_spark.duration_models``
(reference rust_timeseries/duration_models.pyi — same ``__all__``)."""

from .api import ACD, ACDFittedParams, ACDOptimOutcome

__all__ = ["ACD", "ACDOptimOutcome", "ACDFittedParams"]
