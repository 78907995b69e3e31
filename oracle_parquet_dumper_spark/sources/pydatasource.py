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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "the a of and to in data spark table row scan filter join agg window "
    "batch stream key value hash sort merge shuffle part query fast slow big small"
).split()

SYNTH_SCHEMA = "doc_id bigint, shard int, text string, n_words int"


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
            h = hashlib.md5(f"{self.seed}:{doc_id}".encode()).digest()
            n_words = 5 + h[0] % 20
            words = [
                _WORDS[h[(1 + i) % 16] % len(_WORDS)] for i in range(n_words)
            ]
            yield (doc_id, partition.shard, " ".join(words), n_words)


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


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsSource)
