"""Stateful streaming EWMA/ψ over micro-batches.

``applyInPandasWithState`` keeps the recursion state (last ψ, last
observation) per key in the state store, exactly the engine's
checkpoint-watermark vector (``Init::FixedVector`` semantics, reference
src/duration/core/init.rs:140-144): a row stream processed over any
micro-batch partitioning produces the same ψ path bit-for-bit as one
batch pass, provided rows arrive in event-time order per key (file
drops partitioned by time — the tier-maintenance arrival pattern; for
unordered arrivals use the batch path, which re-sorts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.recursion import psi_recursion_np

STATE_SCHEMA = T.StructType(
    [
        T.StructField("psi", T.DoubleType()),
        T.StructField("last_v", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def ewma_stateful(
    stream_df: DataFrame,
    alpha: float,
    init_value: float,
    keys: list[str] | None = None,
    order_col: str = "t",
    value_col: str = "v",
) -> DataFrame:
    """ψ_t = α·x_{t−1} + (1−α)·ψ_{t−1} across micro-batches, seeded with
    ``init_value`` (Init::Fixed) on each key's first-ever row."""
    keys = keys if keys is not None else ["key"]
    out_schema = T.StructType(
        [
            *[stream_df.schema[k] for k in keys],
            stream_df.schema[order_col],
            T.StructField(value_col, T.DoubleType()),
            T.StructField("psi", T.DoubleType()),
        ]
    )
    a = float(alpha)
    b = 1.0 - a

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            psi_prev, v_prev, n_seen = state.get
        else:
            psi_prev, v_prev, n_seen = float(init_value), float(init_value), 0
        # materialize the WHOLE group before sorting: a micro-batch group
        # larger than arrow.maxRecordsPerBatch arrives as several chunks,
        # and the groupBy shuffle orders by key only — sorting each chunk
        # independently would feed later timestamps into earlier recursion
        # steps (review r4). Group size per micro-batch is the same bound
        # grouped applyInPandas already assumes.
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(order_col, kind="mergesort")
            x = pdf[value_col].to_numpy(dtype=np.float64)
            psi = psi_recursion_np(
                x, 0.0, np.array([a]), np.array([b]),
                np.array([psi_prev]), np.array([v_prev]),
                guards=(float("-inf"), float("inf")),
            )
            psi_prev = float(psi[-1])
            v_prev = float(x[-1])
            n_seen += len(x)
            out = pdf[[*keys, order_col]].copy()
            out[value_col] = x
            out["psi"] = psi
            yield out
        state.update((psi_prev, v_prev, n_seen))

    return stream_df.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
