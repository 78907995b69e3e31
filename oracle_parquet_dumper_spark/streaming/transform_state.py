"""transformWithState(InPandas) operators — Spark 4.x's successor to
applyInPandasWithState (SPARK-46815, "Arbitrary State API v2"): typed
composite state (value/list/map), timers, TTL, and schema evolution.

The engine's stateful-streaming surface is exercised end-to-end through
``stateful.py`` (applyInPandasWithState); this module carries the
v2-API form of the same running-total operator.  The API has a hard
runtime dependency this container lacks: the state-server protocol is
protobuf-encoded, so the Python driver worker needs ``google.protobuf``
(and the RocksDB state store provider must be configured).  The
builders probe both and raise one clear ``RuntimeError`` instead of a
crashed-worker py4j stack; ``tests/test_streaming_tws.py`` exercises
whichever path the environment supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

TWS_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("t", T.DoubleType())])


def tws_available() -> tuple[bool, str]:
    """(usable, reason-if-not).  transformWithStateInPandas needs the
    protobuf wire format for its state server."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        return False, "google.protobuf is not installed (state-server wire format)"
    return True, ""


def require_tws(spark: SparkSession) -> None:
    ok, why = tws_available()
    if not ok:
        raise RuntimeError(
            f"transformWithStateInPandas unavailable: {why}. "
            "Install protobuf and set spark.sql.streaming.stateStore.providerClass="
            + ROCKSDB_PROVIDER
        )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


def _make_processor():
    # Imported lazily: subclassing StatefulProcessor is cheap, but the
    # class only functions when the protobuf runtime exists.
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class RunningTotal(StatefulProcessor):
        """Per-user running total — the v2 twin of
        stateful.running_total_kernel, with state in a typed
        ValueState cell instead of a GroupState tuple."""

        def init(self, handle):
            self.state = handle.getValueState("total", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            total = self.state.get()[0] if self.state.exists() else 0.0
            for pdf in rows:
                total += float(pdf["value"].sum())
            self.state.update((total,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "running_total": [round(total, 2)]}
            )

        def close(self):
            pass

    return RunningTotal()


def running_totals_v2(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals via transformWithStateInPandas.
    State layout and output match stateful.running_totals, so the two
    APIs are drop-in replacements for each other (asserted when the
    environment can run both)."""
    require_tws(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        _make_processor(),
        outputStructType=TWS_OUT,
        outputMode="Update",
        timeMode="None",
    )
