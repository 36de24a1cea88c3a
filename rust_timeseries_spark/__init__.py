"""rust_timeseries_spark — a PySpark-native time-series rollup,
downsample, and retention engine.

Capability parity with the reference library ``mickwise/rust_timeseries``
(ACD ψ/EWMA recursions, rolling/lagged moments, Escanciano–Lobato test,
HAC covariance, forecasting), re-expressed Spark-first over tables of
pre-tokenized training sequences, plus the rollup/gap-fill/compression/
continuous-aggregate machinery the north rule requires. See SURVEY.md.
"""

__version__ = "0.1.0"

# Convenience re-exports (the engine's primary public surface)
from .operators.gapfill import densify, interpolate_linear, locf  # noqa: F401,E402
from .operators.recursion import acd_forecast, acd_psi, ewma, ewma_distributed  # noqa: F401,E402
from .operators.rolling import lag_moments, rolling_stats  # noqa: F401,E402
from .operators.rollup import fold_up, rollup_raw, tier_cascade  # noqa: F401,E402
from .plans.pipeline import RollupPipeline  # noqa: F401,E402
from .plans.tiers import TierStore  # noqa: F401,E402
from .session import build_spark  # noqa: F401,E402
from .stats.acd import AcdSpec, acd_covariance, acd_fit  # noqa: F401,E402
from .stats.el import escanciano_lobato  # noqa: F401,E402
from .stats.hac import hac_covariance  # noqa: F401,E402

# Drop-in reference-shaped surface (api.py ↔ reference src/lib.rs):
# single-series code written against the reference ports by changing
# only the import.
from .api import ACD, EscancianoLobato, estimate_hac_covariance_matrix  # noqa: F401,E402
