"""Python DataSource API (Spark 4, SPARK-44076): a deterministic
synthetic-documents source, registered as ``format("synthetic_docs")``.

Part B sources row: beyond file formats and JDBC, Spark 4 lets a pure-
Python class be a first-class batch source with its own partitioning —
the natural adapter for in-house corpus services or generators that
have no Hadoop connector.  Partition planning happens on the driver
(one ``InputPartition`` per shard); each executor materializes ONLY its
shard inside ``read``, so generation scales out like any scan and no
shard ever exists driver-side.

Rows are a hash-seeded word soup: content depends only on (doc_id,
option values), never on partition count or row order — re-reads and
different parallelism produce identical tables (asserted in
tests/test_pydatasource.py).  Python-side generation is the slow path
vs a JVM scan; for 100 TB you'd generate once through this source and
persist parquet, not re-scan the generator per query (same policy as
the reference's one-shot export).
"""

from __future__ import annotations

import hashlib
import sys as _sys

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Ship the source classes by value: executor Python workers must not
# need this package importable (same convention as operators/udfs.py) —
# a DataSource pickled by reference breaks the moment the driver's cwd
# isn't the repo root.
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

_WORDS = (
    "the a of and to in data spark table row scan filter join agg window "
    "batch stream key value hash sort merge shuffle part query fast slow big small"
).split()

SYNTH_SCHEMA = "doc_id bigint, shard int, text string, n_words int"


def _doc_row(seed: str, shard: int, doc_id: int) -> tuple:
    """The single row-content definition both the batch and stream
    readers share: content depends only on (seed, doc_id)."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_words = 5 + h[0] % 20
    words = [_WORDS[h[(1 + i) % 16] % len(_WORDS)] for i in range(n_words)]
    return (doc_id, shard, " ".join(words), n_words)


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, start: int, end: int):
        self.shard = shard
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100))
        self.n_shards = int(options.get("shards", 4))
        self.seed = options.get("seed", "0")

    def partitions(self):
        per = -(-self.n_rows // self.n_shards)  # ceil
        return [
            _ShardPartition(s, s * per, min((s + 1) * per, self.n_rows))
            for s in range(self.n_shards)
            if s * per < self.n_rows
        ]

    def read(self, partition: _ShardPartition):
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(self.seed, partition.shard, doc_id)


class SyntheticDocsSource(DataSource):
    """spark.read.format("synthetic_docs").option("rows", N) after
    ``register_synthetic_docs(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)


# --- streaming reader (Spark 4 Python DataSource streaming, SPARK-45023) ---

class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same deterministic doc space: each
    ``latestOffset`` call advances the available range by
    ``rows_per_batch``; every micro-batch's range is split into the
    same shard partitions as the batch reader, so executors generate
    only their slice.  Offsets are ``{"row": n}`` dicts — the
    engine-checkpointable progress record; within a run, replay of an
    uncommitted batch regenerates identical rows (exactly-once with an
    idempotent sink).

    Restart semantics: a real source's "latest offset" lives in the
    external system (Kafka log end, file listing); this source
    fabricates its data, so its cursor is process memory and a QUERY
    RESTART would reset it to 0 — the engine then sees latest(=one
    batch) == committed and silently resumes nothing.  Spark's stream
    reader API has no committed-offset callback at restart, so
    resumability requires persisting the cursor: pass
    ``.option("cursor_path", file)`` and ``commit`` checkpoints the
    high-water mark there (tmp + atomic replace), letting a restarted
    query continue exactly where the committed offset left off (tested
    in test_pydatasource.py).  Without the option the source is
    fresh-start-only.

    Row content is shared with ``SyntheticDocsReader`` (same
    seed:doc_id hash), asserted stream==batch in
    tests/test_pydatasource.py — the same equivalence discipline as
    streaming/ops.py's batch twins."""

    def __init__(self, options):
        self.n_shards = int(options.get("shards", 4))
        self.rows_per_batch = int(options.get("rows_per_batch", 20))
        self.max_rows = int(options.get("max_rows", 100))
        self.seed = options.get("seed", "0")
        self.cursor_path = options.get("cursor_path")
        self._latest = 0
        if self.cursor_path and _os.path.exists(self.cursor_path):
            with open(self.cursor_path) as fh:
                self._latest = int(fh.read().strip() or 0)

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        self._latest = min(self._latest + self.rows_per_batch, self.max_rows)
        return {"row": self._latest}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        # The engine's start is authoritative (checkpointed); never let
        # the in-memory cursor lag it, and never plan an inverted range.
        self._latest = max(self._latest, lo)
        if hi <= lo:
            return []
        per = -(-(hi - lo) // self.n_shards)  # ceil split of this batch
        return [
            _ShardPartition(s, lo + s * per, min(lo + (s + 1) * per, hi))
            for s in range(self.n_shards)
            if lo + s * per < hi
        ]

    def read(self, partition: _ShardPartition):
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(self.seed, partition.shard, doc_id)

    def commit(self, end: dict) -> None:
        """Durably record the committed high-water mark when a
        cursor_path is configured (atomic tmp+replace, same
        rename-as-commit contract as the sink below)."""
        self._latest = max(self._latest, end["row"])
        if self.cursor_path:
            tmp = f"{self.cursor_path}.tmp"
            with open(tmp, "w") as fh:
                fh.write(str(self._latest))
            _os.replace(tmp, self.cursor_path)


# --- writer pair (batch + streaming sink, SPARK-45430 family) --------------

import json as _json
import os as _os
import uuid as _uuid
from dataclasses import dataclass as _dataclass

from pyspark.sql.datasource import DataSourceStreamWriter, DataSourceWriter, WriterCommitMessage


@_dataclass
class _ShardCommit(WriterCommitMessage):
    """One task's staged file: (staged temp path, rows written)."""

    staged: str
    rows: int


class _JsonlShardWriterBase:
    """Two-phase JSONL shard sink — the adapter shape for in-house
    sinks with no Hadoop committer.  Tasks stage to
    ``<path>/_staged/<uuid>.jsonl`` and report a commit message; ONLY
    the driver-side ``commit`` renames staged files into place, so a
    failed/speculative task leaves garbage in ``_staged/`` but never a
    visible file — the same crash-consistency contract as
    exporter.py's incremental manifest (rename-as-commit).  ``abort``
    deletes its tasks' staged files.

    Path semantics: ``path`` must be storage every task AND the driver
    can reach (shared FS, fuse mount, or an object-store/service client
    in place of ``open``/``os.replace``).  local[*] satisfies this
    trivially; the point of the class is the two-phase commit shape,
    which is what an in-house sink has to reproduce."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards sink requires .option('path', ...)")

    def _stage_rows(self, iterator):
        _os.makedirs(_os.path.join(self.path, "_staged"), exist_ok=True)
        staged = _os.path.join(self.path, "_staged", f"{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), default=str, sort_keys=True))
                f.write("\n")
                n += 1
        return _ShardCommit(staged=staged, rows=n)

    def _publish(self, messages, prefix: str) -> None:
        for i, m in enumerate(m for m in messages if m is not None):
            final = _os.path.join(self.path, f"{prefix}shard_{i:05d}.jsonl")
            _os.replace(m.staged, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.staged):
                _os.remove(m.staged)


class JsonlShardBatchWriter(_JsonlShardWriterBase, DataSourceWriter):
    """Batch flavor honoring the save mode: overwrite swaps previously
    published files out via a backup suffix before renaming the new ones
    in; append publishes under a job-unique prefix so earlier jobs'
    shards survive and a wider/narrower second write can never splice
    two datasets together (fixed names would replace only the shard
    numbers both jobs share)."""

    _OLD = ".overwrite.old"

    def __init__(self, options, overwrite: bool):
        super().__init__(options)
        self.overwrite = overwrite

    def write(self, iterator):
        return self._stage_rows(iterator)

    def commit(self, messages) -> None:
        if self.overwrite:
            # Deleting the old dataset BEFORE publishing would make a
            # driver crash between the two loops lose both datasets
            # (old gone, new still staged).  Same swap-with-backup
            # contract as exporter.compact_table's ``.compact.old``:
            # 1. move old files aside (crash here -> recover by renaming
            #    the ``.overwrite.old`` files back);
            # 2. publish the staged files under the final names;
            # 3. only then drop the backups.
            olds = []
            for f in _os.listdir(self.path):
                if f.endswith(".jsonl") and not f.startswith("_"):
                    backup = _os.path.join(self.path, f + self._OLD)
                    _os.replace(_os.path.join(self.path, f), backup)
                    olds.append(backup)
            self._publish(messages, prefix="")
            for backup in olds:
                _os.remove(backup)
        else:
            self._publish(messages, prefix=f"job_{_uuid.uuid4().hex[:8]}_")


class JsonlShardStreamWriter(_JsonlShardWriterBase, DataSourceStreamWriter):
    """Streaming flavor: files are published under a per-micro-batch
    prefix, so replaying a batch after a crash-before-commit overwrites
    the same names instead of duplicating rows — idempotent exactly-once
    on top of the engine's offset checkpointing."""

    def write(self, iterator):
        return self._stage_rows(iterator)

    def commit(self, messages, batchId: int) -> None:
        self._publish(messages, prefix=f"batch_{batchId:06d}_")

    def abort(self, messages, batchId: int) -> None:  # noqa: ARG002
        _JsonlShardWriterBase.abort(self, messages)


class JsonlShardsSink(DataSource):
    """``df.write.format("jsonl_shards").option("path", dir)`` (and
    ``writeStream`` ditto) after ``register_jsonl_shards(spark)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> JsonlShardBatchWriter:
        return JsonlShardBatchWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonlShardStreamWriter:
        return JsonlShardStreamWriter(self.options)


def register_jsonl_shards(spark) -> None:
    spark.dataSource.register(JsonlShardsSink)
