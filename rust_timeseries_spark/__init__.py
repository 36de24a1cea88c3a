"""rust_timeseries_spark — a PySpark-native time-series rollup,
downsample, and retention engine.

Capability parity with the reference library ``mickwise/rust_timeseries``
(ACD ψ/EWMA recursions, rolling/lagged moments, Escanciano–Lobato test,
HAC covariance, forecasting), re-expressed Spark-first over tables of
pre-tokenized training sequences, plus the rollup/gap-fill/compression/
continuous-aggregate machinery the north rule requires. See SURVEY.md.
"""

__version__ = "0.1.0"
