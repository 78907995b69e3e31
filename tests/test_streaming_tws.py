"""transformWithStateInPandas (state API v2): runs the e2e equivalence
check when the environment supports it, else pins the clear capability
error (this container lacks google.protobuf, which the TWS state
server's wire format needs)."""

from __future__ import annotations

import pytest

from oracle_parquet_dumper_spark.streaming import ops
from oracle_parquet_dumper_spark.streaming.transform_state import (
    running_totals_v2,
    tws_available,
)


def test_tws_or_clear_gate(spark, smoke_sf_dir):
    events = ops.read_events_stream(spark, smoke_sf_dir)
    ok, _why = tws_available()
    if not ok:
        with pytest.raises(RuntimeError, match="transformWithStateInPandas unavailable"):
            running_totals_v2(events)
        return

    from pyspark.sql import functions as F

    out = running_totals_v2(events)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.user_id: r.running_total
        for r in spark.sql(
            # update mode can emit a key several times; last wins
            "SELECT user_id, running_total FROM tws_totals"
        ).collect()
    }
    from oracle_parquet_dumper_spark.sources.tables import load_table

    batch = load_table(spark, smoke_sf_dir, "events")
    expect = {
        r.user_id: round(r.total, 2)
        for r in batch.groupBy("user_id").agg(F.sum("value").alias("total")).collect()
    }
    assert got == expect
