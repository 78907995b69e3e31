"""Python DataSource API source: determinism across parallelism, shard
partitioning, and schema stability."""

from __future__ import annotations

from oracle_parquet_dumper_spark.sources.pydatasource import (
    SYNTH_SCHEMA,
    register_synthetic_docs,
)


def _read(spark, **opts):
    r = spark.read.format("synthetic_docs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthetic_source_deterministic_across_parallelism(spark):
    """Content depends only on (doc_id, seed) — shard count must not
    change what is generated, only where."""
    register_synthetic_docs(spark)
    a = _read(spark, rows=200, shards=2, seed="s1")
    b = _read(spark, rows=200, shards=8, seed="s1")
    rows_a = sorted(map(tuple, a.drop("shard").collect()))
    rows_b = sorted(map(tuple, b.drop("shard").collect()))
    assert rows_a == rows_b
    assert a.count() == 200
    assert a.schema.simpleString() == b.schema.simpleString()


def test_synthetic_source_seed_changes_content(spark):
    register_synthetic_docs(spark)
    a = {r.doc_id: r.text for r in _read(spark, rows=50, seed="x").collect()}
    b = {r.doc_id: r.text for r in _read(spark, rows=50, seed="y").collect()}
    assert set(a) == set(b)
    assert any(a[k] != b[k] for k in a)


def test_synthetic_source_feeds_engine_queries(spark):
    """The source composes with ordinary DataFrame ops (it is a real
    scan, not a collected local relation)."""
    from pyspark.sql import functions as F

    register_synthetic_docs(spark)
    df = _read(spark, rows=300, shards=4, seed="s2")
    agg = df.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in agg) == 300
    assert len(agg) == 4
    assert SYNTH_SCHEMA.startswith("doc_id")


def test_synthetic_stream_reader_matches_batch(spark, tmp_path):
    """Streaming micro-batches over the same doc space must reproduce
    the batch read exactly (same _doc_row content), arriving across
    multiple micro-batches with checkpointed {"row": n} offsets."""
    register_synthetic_docs(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows_per_batch", 17)
        .option("max_rows", 60)
        .option("shards", 3)
        .option("seed", "st")
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # rows_per_batch < max_rows forces multiple micro-batches (17, 17,
    # 17, 9); poll the sink until the stream catches up to max_rows.
    import time

    try:
        deadline = time.time() + 120
        while time.time() < deadline and spark.table("synth_stream").count() < 60:
            time.sleep(0.5)
    finally:
        q.stop()
    n_batches = len(q.recentProgress)
    assert n_batches >= 4, f"expected >=4 micro-batches, saw {n_batches}"
    got = sorted(map(tuple, spark.table("synth_stream").drop("shard").collect()))
    want = sorted(map(tuple, _read(spark, rows=60, seed="st").drop("shard").collect()))
    assert got == want and len(got) == 60


def test_jsonl_sink_batch_two_phase_commit(spark, tmp_path):
    """Batch write through the Python DataSource sink: staged files are
    published atomically on commit; the staging area holds no visible
    shards afterwards; content round-trips."""
    import json
    import os

    from oracle_parquet_dumper_spark.sources.pydatasource import register_jsonl_shards

    register_synthetic_docs(spark)
    register_jsonl_shards(spark)
    out = str(tmp_path / "sink")
    df = _read(spark, rows=50, shards=3, seed="w1")
    df.write.format("jsonl_shards").option("path", out).mode("overwrite").save()
    shards = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert len(shards) == 3 and all(f.startswith("shard_") for f in shards)
    assert os.listdir(os.path.join(out, "_staged")) == []
    rows = []
    for f in shards:
        with open(os.path.join(out, f), encoding="utf-8") as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted(r["doc_id"] for r in rows) == list(range(50))
    want = {r.doc_id: r.text for r in df.collect()}
    assert all(want[r["doc_id"]] == r["text"] for r in rows)


def test_jsonl_sink_streaming_per_batch_prefix(spark, tmp_path):
    """Streaming write: each micro-batch publishes under its batchId
    prefix (replay-idempotent names), and the full stream equals the
    batch read."""
    import json
    import os
    import time

    from oracle_parquet_dumper_spark.sources.pydatasource import register_jsonl_shards

    register_synthetic_docs(spark)
    register_jsonl_shards(spark)
    out = str(tmp_path / "stream_sink")
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows_per_batch", 25)
        .option("max_rows", 50)
        .option("shards", 2)
        .option("seed", "w2")
        .load()
    )
    q = (
        stream.writeStream.format("jsonl_shards")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 120
        def _rows():
            if not os.path.isdir(out):
                return []
            acc = []
            for f in sorted(os.listdir(out)):
                if f.endswith(".jsonl"):
                    with open(os.path.join(out, f), encoding="utf-8") as fh:
                        acc += [json.loads(l) for l in fh]
            return acc
        while time.time() < deadline and len(_rows()) < 50:
            time.sleep(0.5)
    finally:
        q.stop()
    files = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert len({f.split("_shard_")[0] for f in files}) >= 2  # >=2 micro-batch prefixes
    rows = _rows()
    assert sorted(r["doc_id"] for r in rows) == list(range(50))


def test_jsonl_sink_append_preserves_and_overwrite_replaces(spark, tmp_path):
    """Save-mode semantics: append publishes under a job-unique prefix
    (a second narrower write cannot splice into the first job's shard
    numbers); overwrite clears previously published files first."""
    import json
    import os

    from oracle_parquet_dumper_spark.sources.pydatasource import register_jsonl_shards

    register_jsonl_shards(spark)
    out = str(tmp_path / "mix")
    os.makedirs(out)

    def rows_on_disk():
        got = []
        for f in sorted(os.listdir(out)):
            if f.endswith(".jsonl") and not f.startswith("_"):
                with open(os.path.join(out, f)) as fh:
                    got += [json.loads(line)["v"] for line in fh]
        return sorted(got)

    spark.range(4).toDF("v").repartition(4).write.format("jsonl_shards").option(
        "path", out
    ).mode("append").save()
    spark.range(4, 6).toDF("v").repartition(2).write.format("jsonl_shards").option(
        "path", out
    ).mode("append").save()
    assert rows_on_disk() == [0, 1, 2, 3, 4, 5]  # nothing lost, nothing spliced
    spark.range(7, 9).toDF("v").repartition(2).write.format("jsonl_shards").option(
        "path", out
    ).mode("overwrite").save()
    assert rows_on_disk() == [7, 8]  # prior jobs' files cleared


def test_synthetic_stream_restart_resumes_with_cursor(spark, tmp_path):
    """Query restart from a checkpoint resumes past committed rows when
    cursor_path persists the synthetic log's high-water mark: three
    availableNow runs emit disjoint batches covering all 60 rows, with
    zero duplicates."""
    import json
    import os

    from oracle_parquet_dumper_spark.sources.pydatasource import (
        register_jsonl_shards,
        register_synthetic_docs,
    )

    register_synthetic_docs(spark)
    register_jsonl_shards(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    cursor = str(tmp_path / "cursor")
    os.makedirs(out)

    def run():
        df = (
            spark.readStream.format("synthetic_docs")
            .option("rows_per_batch", 20)
            .option("max_rows", 60)
            .option("cursor_path", cursor)
            .load()
        )
        q = (
            df.writeStream.format("jsonl_shards")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = []
        for f in sorted(os.listdir(out)):
            if f.endswith(".jsonl") and not f.startswith("_"):
                with open(os.path.join(out, f)) as fh:
                    rows += [
                        (json.loads(line)["shard"], json.loads(line)["doc_id"])
                        for line in fh
                    ]
        return rows

    counts = []
    for _ in range(3):
        rows = run()
        counts.append(len(rows))
        assert len(rows) == len(set(rows))  # no duplicates, ever
    assert counts == [20, 40, 60]  # each restart resumes where committed left off


def test_jsonl_overwrite_crash_between_swap_and_publish_is_recoverable(tmp_path):
    """ADVICE round-4: overwrite used to DELETE the old dataset before
    publishing the new one, so a driver crash between the loops lost
    both.  The swap-with-backup commit must (a) leave the old data on
    disk (as ``.overwrite.old``) if publish blows up mid-commit, and
    (b) leave zero backups after a clean commit."""
    import os

    from oracle_parquet_dumper_spark.sources.pydatasource import (
        JsonlShardBatchWriter,
        _ShardCommit,
    )

    path = str(tmp_path / "ds")
    os.makedirs(path)
    with open(os.path.join(path, "shard_00000.jsonl"), "w") as f:
        f.write('{"v": 1}\n')

    # stage one new shard the way a task would
    w = JsonlShardBatchWriter({"path": path}, overwrite=True)
    staged_dir = os.path.join(path, "_staged")
    os.makedirs(staged_dir, exist_ok=True)
    staged = os.path.join(staged_dir, "new.jsonl")
    with open(staged, "w") as f:
        f.write('{"v": 2}\n')

    # crash INSIDE publish (after the old files were swapped aside)
    orig_publish = JsonlShardBatchWriter._publish
    JsonlShardBatchWriter._publish = lambda self, m, prefix: (_ for _ in ()).throw(
        RuntimeError("boom")
    )
    try:
        try:
            w.commit([_ShardCommit(staged=staged, rows=1)])
        except RuntimeError:
            pass
        files = set(os.listdir(path))
        # old dataset survives as a backup; nothing was deleted
        assert "shard_00000.jsonl.overwrite.old" in files
        assert "shard_00000.jsonl" not in files
    finally:
        JsonlShardBatchWriter._publish = orig_publish

    # recover (rename back) and rerun the commit cleanly
    os.replace(
        os.path.join(path, "shard_00000.jsonl.overwrite.old"),
        os.path.join(path, "shard_00000.jsonl"),
    )
    w2 = JsonlShardBatchWriter({"path": path}, overwrite=True)
    w2.commit([_ShardCommit(staged=staged, rows=1)])
    files = sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))
    assert files == ["shard_00000.jsonl"]
    assert not any(f.endswith(".overwrite.old") for f in os.listdir(path))
    with open(os.path.join(path, "shard_00000.jsonl")) as f:
        assert f.read() == '{"v": 2}\n'
