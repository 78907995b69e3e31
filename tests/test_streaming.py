"""Streaming execution tests: the watermarked streaming plans
(file source -> availableNow -> memory sink) must produce exactly their
batch-equivalent answers, plus a custom stateful operator via
applyInPandasWithState."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oracle_parquet_dumper_spark.sources.tables import load_table
from oracle_parquet_dumper_spark.streaming import ops


def _normalize(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


def test_stream_tumbling_equals_batch(spark, smoke_sf_dir):
    stream = ops.tumbling_counts(ops.read_events_stream(spark, smoke_sf_dir))
    ops.run_to_memory(stream, "t_tumbling")
    got = spark.table("t_tumbling")
    expect = ops.tumbling_counts(load_table(spark, smoke_sf_dir, "events").drop("props"))
    assert _normalize(got) == _normalize(expect)


def test_stream_session_equals_batch(spark, smoke_sf_dir):
    stream = ops.session_windows(ops.read_events_stream(spark, smoke_sf_dir))
    ops.run_to_memory(stream, "t_session")
    got = spark.table("t_session")
    expect = ops.session_windows(load_table(spark, smoke_sf_dir, "events").drop("props"))
    assert _normalize(got) == _normalize(expect)


def test_stream_dedup_bounded_state(spark, smoke_sf_dir):
    stream = ops.stream_dedup(ops.read_events_stream(spark, smoke_sf_dir))
    ops.run_to_memory(stream, "t_dedup", output_mode="append")
    got = spark.table("t_dedup")
    batch = load_table(spark, smoke_sf_dir, "events")
    # one survivor per (user_id, event_type) pair
    assert got.count() == batch.select("user_id", "event_type").distinct().count()
    assert got.select("user_id", "event_type").distinct().count() == got.count()


def test_apply_in_pandas_with_state(spark, smoke_sf_dir):
    from oracle_parquet_dumper_spark.streaming.stateful import running_totals

    events = ops.read_events_stream(spark, smoke_sf_dir)
    stream = running_totals(events)
    ops.run_to_memory(stream, "t_state", output_mode="update")
    got = spark.table("t_state")
    # final state per user equals the batch per-user sum
    batch = (
        load_table(spark, smoke_sf_dir, "events")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("expected"))
    )
    # take the last emitted row per user (memory sink keeps all updates)
    latest = (
        got.groupBy("user_id").agg(F.max("running_total").alias("running_total"))
    )
    joined = latest.join(batch, "user_id")
    mismatches = joined.where(
        F.abs(F.col("running_total") - F.col("expected")) > 0.011
    ).count()
    assert mismatches == 0


def test_stream_to_parquet_sink_with_checkpoint(spark, smoke_sf_dir, tmp_path):
    """Streaming ingest -> rolled parquet files with exactly-once
    checkpointing — the streaming counterpart of the exporter sink."""
    events = ops.read_events_stream(spark, smoke_sf_dir)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        events.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.parquet(out)
    batch = load_table(spark, smoke_sf_dir, "events")
    assert written.count() == batch.count()
    # restart with same checkpoint: no new data -> no duplicates
    q2 = (
        ops.read_events_stream(spark, smoke_sf_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_interval_join_equals_batch(spark, smoke_sf_dir):
    ev_stream = ops.read_events_stream(spark, smoke_sf_dir)
    stream = ops.interval_join_purchases_views(
        ev_stream.where("event_type = 'purchase'"),
        ev_stream.where("event_type = 'view'"),
    )
    ops.run_to_memory(stream, "t_ssjoin", output_mode="append")
    got = spark.table("t_ssjoin")
    ev = load_table(spark, smoke_sf_dir, "events").drop("props")
    expect = ops.interval_join_purchases_views(
        ev.where("event_type = 'purchase'"), ev.where("event_type = 'view'")
    )
    assert _normalize(got) == _normalize(expect)


def test_foreach_batch_into_exporter_layout(spark, smoke_sf_dir, tmp_path):
    """Streaming ingest through foreachBatch into the reference's
    <schema>/<table>/ layout — the streaming->exporter integration:
    each micro-batch appends rolled parquet under the table directory."""
    out = str(tmp_path / "warehouse" / "main" / "events")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(batch_df, batch_id):
        (
            batch_df.write.mode("append")
            .option("compression", "zstd")
            .parquet(out)
        )

    q = (
        ops.read_events_stream(spark, smoke_sf_dir)
        .writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    written = spark.read.parquet(out)
    expect = load_table(spark, smoke_sf_dir, "events")
    assert written.count() == expect.count()
    assert set(written.columns) == set(expect.columns)


def test_stream_static_enrich_equals_batch(spark, smoke_sf_dir):
    from oracle_parquet_dumper_spark.plans.registry import REGISTRY

    cust = load_table(spark, smoke_sf_dir, "customer")
    stream = ops.enrich_with_dimension(
        ops.read_events_stream(spark, smoke_sf_dir), cust, cust.count()
    )
    ops.run_to_memory(stream, "t_enrich", output_mode="complete")
    got = {tuple(r) for r in spark.table("t_enrich").collect()}
    batch = {
        tuple(r)
        for r in REGISTRY["stream_static_enrich"].fn(spark, smoke_sf_dir).collect()
    }
    assert got == batch


def test_stream_ohlc_equals_batch(spark, smoke_sf_dir):
    stream = ops.ohlc_tumbling(ops.read_events_stream(spark, smoke_sf_dir))
    ops.run_to_memory(stream, "t_ohlc")
    got = spark.table("t_ohlc")
    expect = ops.ohlc_tumbling(load_table(spark, smoke_sf_dir, "events").drop("props"))
    assert _normalize(got) == _normalize(expect)
