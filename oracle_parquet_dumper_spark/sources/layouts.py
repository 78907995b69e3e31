"""Storage layouts for scale: hive-partitioned datasets and bucketed
tables (SURVEY.md §2 Part B sources row; SCALING.md co-location story).

Two layouts turn the engine's biggest shuffles into metadata operations:

- **Hive partitioning** (``partitionBy`` directories): predicates on the
  partition column prune whole directories at planning time — the scan
  never lists, let alone reads, the excluded partitions.  The right
  layout for low-cardinality routing columns (lang, source, dt).

- **Bucketing** (``bucketBy`` + ``saveAsTable``): rows are pre-hashed
  into a fixed bucket count on the join/agg key, so a join of two
  tables bucketed on the same key by the same count runs with NO
  exchange on either side — the shuffle happened once at write time and
  is amortized over every subsequent join.  The right layout for the
  huge fact-fact joins (orders x lineitem) that dominate 100 TB plans.
  ``tests/test_layouts.py`` asserts the exchange-free plan.

The reference (main.py:110-189) always writes one flat directory per
table; both layouts here are Part B extensions over its sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet dataset: one directory level per
    partition column value.  Keep partition columns low-cardinality —
    each distinct tuple is a directory and at least one file; a
    high-cardinality partition column is the small-files anti-pattern."""
    (
        df.write.mode(mode)
        .option("compression", compression)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Read a hive-partitioned dataset.  Filters on partition columns
    become ``PartitionFilters`` in the scan (directory pruning);
    ``basePath`` semantics and partition-column typing follow Spark's
    defaults (partition values parse as strings unless
    ``spark.sql.sources.partitionColumnTypeInference.enabled``)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session
    catalog.  ``n_buckets`` is the write-time shuffle width AND the
    read-time parallelism floor — pick it from target partition size
    (total bytes / 128 MB), not from cluster size, and use the SAME
    count for every table that joins on ``bucket_col``; mismatched
    counts reintroduce one side's exchange."""
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


# --- shared stored-state lifecycle primitives ------------------------------
#
# Both stored-state layouts (ensure_bucketed_state here and the dedup
# corpus index in operators/dedup.py) promote builds with the same two
# moves: atomic rename into the fingerprint-keyed location, then GC of
# superseded siblings.  Round-9 shipped both moves with latent hazards
# (ADVICE r9): a swallowed rename failure could silently serve
# stale/partial state, and an immediate sibling rmtree could kill a
# concurrent session mid-scan.  These helpers are the hardened versions
# both call sites share.

STATE_GC_GRACE_S = 1800.0  # default; OPDS_STATE_GC_GRACE_S overrides

_SUPERSEDED_MARK = ".superseded"


def _gc_grace_s(grace_s: float | None) -> float:
    import os

    if grace_s is not None:
        return grace_s
    try:
        return float(os.environ.get("OPDS_STATE_GC_GRACE_S", ""))
    except ValueError:
        return STATE_GC_GRACE_S


def promote_state_build(tmp_path: str, path: str, complete) -> None:
    """Atomically promote a finished build dir into its keyed location.

    ``os.rename`` failing does NOT imply a concurrent session landed
    identical bytes — the destination may pre-exist stale (an explicit
    dir reused after the corpus changed) or half-written (a crashed
    copy).  Round 9 treated every OSError as a benign concurrent win,
    which silently discarded the fresh rebuild (ADVICE r9, medium).
    Here the loss is accepted ONLY when ``complete()`` verifies the
    destination is a finished build of the same fingerprint-keyed
    location; otherwise the error propagates so the caller never serves
    unverified state."""
    import os
    import shutil

    try:
        os.rename(tmp_path, path)
    except OSError:
        shutil.rmtree(tmp_path, ignore_errors=True)
        if not complete():
            raise


def revive_state(path: str) -> None:
    """Clear a stale tombstone from a keyed state dir that has become
    current again (the corpus was regenerated back to identical bytes,
    so a previously-superseded fingerprint is live once more).  Without
    this, the next supersede could skip straight to phase-2 removal on
    the old tombstone's age."""
    import contextlib
    import os

    with contextlib.suppress(OSError):
        os.remove(os.path.join(path, _SUPERSEDED_MARK))


def gc_state_siblings(
    base: str,
    keep: str,
    *,
    grace_s: float | None = None,
    on_remove=None,
) -> list[str]:
    """Two-phase, age-gated GC of superseded state under ``base``.

    Deleting a superseded fingerprint sibling the moment a new build
    lands races any long-running session still mid-scan over it (the
    dir's mtime says when it was BUILT, not when it was last read, so
    age alone can't prove quiescence).  Phase 1 therefore only
    TOMBSTONES a superseded sibling (touches ``<sib>/.superseded``);
    phase 2 removes it once the tombstone itself is older than the
    grace period — a reader that started before the supersede has had
    the whole grace window to finish.  Abandoned ``.tmp.*`` build dirs
    from crashed sessions are swept on the same age gate (mtime is
    correct for those: nothing reads a tmp dir but its writer, and a
    crashed writer stops touching it).

    Returns the sibling names actually removed; ``on_remove(name)``
    runs for each (catalog deregistration hook)."""
    import os
    import shutil
    import time

    grace = _gc_grace_s(grace_s)
    now = time.time()
    removed: list[str] = []
    try:
        siblings = os.listdir(base)
    except OSError:
        return removed
    for old in siblings:
        if old == keep:
            continue
        p = os.path.join(base, old)
        try:
            if ".tmp." in old:
                if now - os.stat(p).st_mtime >= grace:
                    shutil.rmtree(p, ignore_errors=True)
                continue
            mark = os.path.join(p, _SUPERSEDED_MARK)
            if not os.path.exists(mark):
                with open(mark, "w") as fh:
                    fh.write(f"{now}")
                continue
            if now - os.stat(mark).st_mtime >= grace:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(old)
                if on_remove is not None:
                    on_remove(old)
        except OSError:
            continue  # raced a concurrent GC — someone else removed it
    return removed


def ensure_bucketed_state(
    spark: SparkSession,
    sf_dir: str,
    *,
    state_name: str,
    fp_table: str,
    schema_ddl: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str,
    build,
) -> str:
    """Ensure a corpus-derived, round-invariant relation exists as a
    bucketed parquet table and return its catalog name — the shared
    lifecycle for iterative operators whose per-round join side must
    keep HashPartitioning at any scale (graph_pagerank_bucketed,
    dedup_label_propagation_bucketed).

    Lifecycle rules (VERDICT r8 #3 / ADVICE r8), all planted-tested in
    tests/test_round9_ops.py:

    - state lives at ``<tmp>/<state_name>/<md5(sf_dir)>/<fingerprint>``,
      where the fingerprint is a content hash of ``fp_table``'s parquet
      files (sizes + mtimes) — regenerating the fixture in place
      rotates the key;
    - the catalog registration and the data path are verified
      INDEPENDENTLY: a registration whose data is gone is dropped and
      rebuilt; a warm path with no registration (fresh session) is
      re-registered as an external bucketed table WITHOUT rewriting
      (a concurrent session may be mid-scan);
    - builds land via write-to-unique-tempdir + atomic rename, never
      overwrite-in-place on the shared path; a FAILED rename is
      accepted only when the destination is verifiably complete (a
      concurrent identical build won), else it raises
      (promote_state_build);
    - superseded fingerprint siblings of the same corpus path (and
      their catalog entries) are garbage-collected with the two-phase
      tombstone + grace-period protocol of ``gc_state_siblings``, so a
      concurrent session mid-scan over the superseded state keeps its
      files for the whole grace window; crashed builds' ``.tmp.*``
      dirs are swept on the same age gate.

    ``build(spark)`` returns the DataFrame to persist; ``schema_ddl``
    is its column DDL for the external re-registration."""
    import hashlib
    import os
    import tempfile
    import uuid

    # function-level: dedup imports the registry package, which imports
    # operator modules that import this module
    from oracle_parquet_dumper_spark.operators.dedup import _corpus_fingerprint

    pathkey = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:12]
    fpkey = _corpus_fingerprint(sf_dir, table=fp_table)
    base = os.path.join(tempfile.gettempdir(), state_name, pathkey)
    path = os.path.join(base, fpkey)
    table = f"{state_name}_{pathkey}_{fpkey}"

    def data_present() -> bool:
        return os.path.isfile(os.path.join(path, "_SUCCESS"))

    if spark.catalog.tableExists(table):
        if data_present():
            revive_state(path)  # fingerprint reinstated => clear tombstone
            return table
        spark.sql(f"DROP TABLE IF EXISTS {table}")  # registration outlived data

    if data_present():
        revive_state(path)
    else:
        nonce = uuid.uuid4().hex[:8]
        tmp_table = f"{table}_tmp_{nonce}"
        tmp_path = f"{path}.tmp.{nonce}"
        write_bucketed_table(
            build(spark),
            tmp_table,
            tmp_path,
            bucket_col=bucket_col,
            n_buckets=n_buckets,
            sort_col=sort_col,
        )
        spark.sql(f"DROP TABLE IF EXISTS {tmp_table}")  # external: files stay
        os.makedirs(base, exist_ok=True)
        # rename failure is benign ONLY if a concurrent identical build
        # (same fingerprint => same corpus) verifiably completed; a
        # half-written destination must raise, not fall through to
        # CREATE TABLE over missing data (ADVICE r9)
        promote_state_build(tmp_path, path, data_present)
        gc_state_siblings(
            base,
            fpkey,
            on_remove=lambda old: spark.sql(
                f"DROP TABLE IF EXISTS {state_name}_{pathkey}_{old}"
            ),
        )

    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) "
        f"USING parquet CLUSTERED BY ({bucket_col}) SORTED BY ({sort_col}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    return table


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.  With
    bucketing aligned this plans as a SortMergeJoin whose children are
    bare bucketed scans — zero Exchange nodes (asserted in
    tests/test_layouts.py); the only remaining cost is the per-bucket
    sort, which ``sort_col`` at write time also removes.  The merge hint
    pins the fact-fact shape (at fixture scale size stats would pick a
    broadcast and never exercise the bucketing)."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), on)


# --- Z-order clustering (multi-dimensional file skipping) ------------------

ZORDER_BITS = 16


def zorder_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS):
    """Return ``df`` with an interleaved-bit Morton key ``_z`` over
    ``cols`` (Delta/Iceberg's OPTIMIZE ZORDER layout, built from plain
    column expressions).

    Each column is min-max scaled to a ``bits``-bit integer using an
    in-plan broadcast 1-row aggregate (no driver collect), then the bit
    planes are interleaved: bit b of column i lands at position
    b*len(cols)+i.  Sorting by ``_z`` gives every file a tight min/max
    envelope on EVERY z-ordered column simultaneously — single-column
    sorting does this for the first column only and leaves the others'
    per-file ranges at full width (asserted in tests/test_layouts.py).
    At 100 TB this is what turns parquet row-group stats + partition-file
    pruning into multi-dimensional skipping for point/range predicates
    on any of the clustered columns."""
    from functools import reduce
    from operator import add

    from pyspark.sql import functions as F

    n = len(cols)
    if bits * n > 63:
        # bit b of column i lands at position b*n+i in a signed long; past
        # bit 62 the sign bit flips and high keys sort FIRST, silently
        # breaking the Morton ordering (and the file-skipping it exists for).
        raise ValueError(
            f"zorder_key: bits*len(cols) = {bits}*{n} = {bits * n} exceeds 63 "
            f"(signed-long overflow would corrupt the sort order); "
            f"use bits <= {63 // n} for {n} columns"
        )
    mins_maxes = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{i}") for i, c in enumerate(cols)],
    )
    j = df.crossJoin(F.broadcast(mins_maxes))
    top = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"_mn_{i}"), F.col(f"_mx_{i}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled = F.least(
            F.floor((F.col(c).cast("double") - mn) / span * top).cast("long"), F.lit(top)
        )
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftrightunsigned(scaled, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    # bit positions are disjoint, so summing assembles the Morton code
    z = reduce(add, terms)
    return j.withColumn("_z", z).drop(*[f"_mn_{i}" for i in range(n)], *[f"_mx_{i}" for i in range(n)])


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the Morton
    key: range-repartition on ``_z`` (contiguous key ranges per file,
    one skew-resistant sampling shuffle) + within-partition sort, then
    drop the key.  Files come out as disjoint z-range tiles, which is
    exactly the property row-group pruning needs."""
    keyed = zorder_key(df, cols)
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def hilbert_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS):
    """Return ``df`` with a Hilbert-curve index ``_h`` over two columns —
    the same multi-dimensional clustering contract as ``zorder_key`` but
    with strictly better locality: consecutive Hilbert positions are
    always grid-adjacent (no Morton "jumps" across the key space), so
    range-partitioned files get tighter per-file envelopes on both
    dimensions.

    Each column is min-max scaled to a ``bits``-bit integer exactly as
    in ``zorder_key`` (in-plan broadcast bounds, no driver collect),
    then the standard xy->d walk (Hamilton's algorithm, the loop form
    popularized by Wikipedia's "Hilbert curve" d2xy/xy2d) runs as
    ``bits`` chained integer-only projections — one named column per
    level, so the expression tree stays LINEAR in ``bits`` instead of
    doubling per level, and every op is exact integer arithmetic
    (bit-reproducible in any engine; the SQL twin in
    operators/layout_queries.py mirrors it CTE-for-CTE)."""
    from pyspark.sql import functions as F

    if len(cols) != 2:
        raise ValueError("hilbert_key supports exactly 2 columns")
    if 2 * bits > 62:
        raise ValueError(f"hilbert_key: 2*bits = {2 * bits} exceeds 62 (signed-long overflow)")
    mins_maxes = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"_mx_{i}") for i, c in enumerate(cols)],
    )
    j = df.crossJoin(F.broadcast(mins_maxes))
    top = (1 << bits) - 1
    scaled = []
    for i, c in enumerate(cols):
        mn, mx = F.col(f"_mn_{i}"), F.col(f"_mx_{i}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.floor((F.col(c).cast("double") - mn) / span * top).cast("long"), F.lit(top)
            )
        )
    base = j.withColumn("_hx", scaled[0]).withColumn("_hy", scaled[1]).withColumn(
        "_h", F.lit(0).cast("long")
    )
    cur = base
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        x, y, d = F.col("_hx"), F.col("_hy"), F.col("_h")
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        d2 = d + F.lit(s).cast("long") * F.lit(s) * (F.lit(3) * rx).bitwiseXOR(ry).cast("long")
        # rotate the quadrant: only when ry == 0; flip both coords when
        # rx == 1, then swap x and y
        fx = F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        fy = F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        nx = F.when(ry == 0, fy).otherwise(x)
        ny = F.when(ry == 0, fx).otherwise(y)
        cur = cur.withColumns({"_h": d2, "_hx": nx, "_hy": ny})
    return cur.drop(
        "_hx", "_hy", *[f"_mn_{i}" for i in range(2)], *[f"_mx_{i}" for i in range(2)]
    )
