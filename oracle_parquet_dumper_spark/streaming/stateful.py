"""Custom stateful streaming operators (applyInPandasWithState).

The GroupState-backed shape for operators Structured Streaming lacks
natively: per-key running aggregates, custom session logic, CDC-style
last-value stores.  State is partitioned by group key across executors
and checkpointed; memory is O(keys), not O(events).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Ship the stateful kernels by value (see operators/multimodal.py): the
# Python workers must not need this package on their import path.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

RUNNING_TOTAL_STATE = T.StructType([T.StructField("total", T.DoubleType())])
RUNNING_TOTAL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
        T.StructField("n_batches", T.IntegerType()),
    ]
)


def running_total_kernel(key, pdfs, state):
    """Per-user running total of ``value`` across micro-batches; emits
    the updated total once per batch in which the key appears."""
    total = state.get[0] if state.exists else 0.0
    n = 0
    for pdf in pdfs:
        total += float(pdf["value"].sum())
        n += 1
    state.update((total,))
    yield pd.DataFrame(
        {"user_id": [key[0]], "running_total": [round(total, 2)], "n_batches": [n]}
    )


def running_totals(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming per-user running value totals via applyInPandasWithState."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            running_total_kernel,
            outputStructType=RUNNING_TOTAL_OUT,
            stateStructType=RUNNING_TOTAL_STATE,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
