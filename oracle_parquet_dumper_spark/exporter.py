"""Export-parity core: the reference's OracleParquetExporter surface
(main.py:31-263) re-expressed on Spark.

Parity map (SURVEY.md §2 Part A):

- A1-A3  catalog enumeration + regex include/exclude  -> ``catalog.py``
- A4-A5  type-pruned projection + lowercase rename    -> ``_project``
- A6/A9  table scan, batched fetch                    -> Spark scan (JDBC
         fetchsize / parquet vectorized reader), partitioned = parallel
- A7     row limit                                    -> ``df.limit``
- A11    compression (none/snappy/gzip/zstd, default zstd)
- A12    byte-targeted file rolling                   -> ``maxRecordsPerFile``
         derived from a sampled average row width (the reference itself
         documents its size as approximate, main.py:453-454)
- A13    overwrite / error-if-exists                  -> directory guard
- A14    snapshot isolation                           -> sessionInitStatement
         + AS OF SCN (see catalog.JdbcCatalog.read_table)
- A15    ``<out>/<schema>/<table>/<table>_<n>.parquet`` layout
- A16    schema x table driver loop with wall-clock metrics
- A17    zero-eligible-column skip (warn)
- empty-table semantics (SURVEY.md §1.2): reference writes NO file for an
  empty table (lazy writer, main.py:165-170) — reproduced with an
  ``isEmpty`` guard.

Unlike the reference (strictly serial: one connection, sequential tables,
sequential 10k-row batches), every table export here is a distributed
Spark job, and independent tables can export concurrently via a thread
pool (Spark schedules the jobs FAIR across executors).
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.catalog import ParquetDirectoryCatalog, eligible_fields

logger = logging.getLogger(__name__)

# Reference defaults (main.py:20-21, main.py:408,417)
DEFAULT_ROW_LIMIT = -1
DEFAULT_MAX_FILE_SIZE = 200_000_000
DEFAULT_COMPRESSION = "zstd"
DEFAULT_BATCH_SIZE = 10_000
COMPRESSION_CHOICES = ("none", "snappy", "gzip", "zstd")
SIZE_SAMPLE_ROWS = 2_000
# Watermark types whose str() round-trip preserves ordering under
# ``> CAST(lit AS type)``; string is deliberately absent (lexicographic).
_ORDERABLE_WATERMARK_TYPES = frozenset(
    {"byte", "short", "integer", "long", "float", "double", "decimal",
     "date", "timestamp", "timestamp_ntz"}
)


@dataclass
class ExportResult:
    schema: str
    table: str
    rows: int
    files: list[str]
    seconds: float
    skipped: str | None = None
    # Resolved output directory actually written (None for skipped tables).
    # validate_export audits exactly this path instead of re-deriving it —
    # re-deriving guessed lowercase-first and could validate a stale
    # directory left by a previous run with different casing settings.
    target: str | None = None


@dataclass
class TableValidation:
    schema: str
    table: str
    ok: bool
    issues: list[str] = field(default_factory=list)


def validate_export(
    spark: SparkSession,
    output_path: str,
    results: list[ExportResult],
    incremental: bool = False,
) -> list[TableValidation]:
    """Post-export read-back audit: every non-skipped table's parquet
    output must (a) exist, (b) read back with the exported row count
    (>= for incremental appends), (c) carry at least one column.  This
    catches the failure exports silently tolerate — a sink that wrote
    fewer rows than it claimed — by paying one cheap count() per table
    against the parquet footers.  The per-table DQ operators
    (operators/validation.py) are the deeper, schema-aware layer."""
    out: list[TableValidation] = []
    for r in results:
        if r.skipped:
            continue
        issues: list[str] = []
        target = r.target
        if target is None:  # legacy results without a recorded path
            target = os.path.join(output_path, r.schema.lower(), r.table.lower())
            if not os.path.isdir(target):
                target = os.path.join(output_path, r.schema, r.table)
        if not os.path.isdir(target):
            issues.append("output directory missing")
        else:
            try:
                df = spark.read.parquet(target)
                if not df.columns:
                    issues.append("no columns in output")
                n = df.count()
                if incremental:
                    if n < r.rows:
                        issues.append(f"read-back rows {n} < exported rows {r.rows}")
                elif n != r.rows:
                    issues.append(f"read-back rows {n} != exported rows {r.rows}")
            except Exception as exc:  # unreadable/empty dir counts as failed
                issues.append(f"unreadable output: {type(exc).__name__}")
        out.append(TableValidation(r.schema, r.table, not issues, issues))
    return out


@dataclass
class SparkParquetExporter:
    """Constructor parameters mirror the reference's (main.py:32-50);
    connection parameters are replaced by a ``catalog`` (parquet-dir or
    JDBC), keeping the export pipeline identical for both."""

    spark: SparkSession
    catalog: object  # ParquetDirectoryCatalog | JdbcCatalog
    output_path: str
    schemas: list[str] = field(default_factory=list)
    table_name_include_pattern: str = ".*"
    table_name_exclude_pattern: str | None = None
    compression_method: str = DEFAULT_COMPRESSION
    overwrite: bool = False
    row_limit: int = DEFAULT_ROW_LIMIT
    lowercase_object_names: bool = False
    parquet_max_file_size: int = DEFAULT_MAX_FILE_SIZE
    reference_file_naming: bool = True
    max_concurrent_tables: int = 1
    # Hive-style partition columns per table (A15 extension — SURVEY.md
    # §2: "within a table, partitionBy if we add partition columns").
    # Partitioned tables keep Spark's directory layout (partition pruning
    # needs it), so reference_file_naming does not apply to them.
    partition_by: dict[str, list[str]] = field(default_factory=dict)
    # Space-filling-curve clustering per table (sources/layouts.py): rows
    # are range-repartitioned + sorted on a Morton or Hilbert key over
    # the listed columns before writing, so every output file carries a
    # tight min/max envelope on EVERY clustered column — parquet
    # row-group/file skipping then prunes multi-dimensional predicates
    # (Delta/Iceberg OPTIMIZE ZORDER, as an export-time option).  Column
    # names are post-projection (lowercased if lowercase_object_names).
    cluster_by: dict[str, list[str]] = field(default_factory=dict)
    cluster_curve: str = "hilbert"  # or "zorder"

    def __post_init__(self):
        if self.compression_method not in COMPRESSION_CHOICES:
            raise ValueError(
                f"compression_method must be one of {COMPRESSION_CHOICES}, got {self.compression_method!r}"
            )
        if self.cluster_curve not in ("hilbert", "zorder"):
            raise ValueError(
                f"cluster_curve must be 'hilbert' or 'zorder', got {self.cluster_curve!r}"
            )

    def _cluster(self, df: DataFrame, table: str) -> DataFrame:
        """Apply space-filling-curve clustering when configured for this
        table: key the rows (in-plan broadcast bounds, integer bit ops),
        range-repartition on the key (one skew-resistant sampling
        shuffle producing contiguous, disjoint key ranges per output
        partition), sort within each partition, drop the key.  Combined
        with maxRecordsPerFile rolling, every rolled file is a disjoint
        curve-range tile."""
        cols = self.cluster_by.get(table, [])
        if not cols:
            return df
        from oracle_parquet_dumper_spark.sources.layouts import hilbert_key, zorder_key

        if self.cluster_curve == "hilbert":
            keyed, key = hilbert_key(df, cols), "_h"
        else:
            keyed, key = zorder_key(df, cols), "_z"
        return keyed.repartitionByRange(key).sortWithinPartitions(key).drop(key)

    # -- catalog introspection (reference EP3 surface, main.py:87-217) ------
    def get_tables(self, schema: str) -> list[str]:
        """Reference ``get_tables`` parity (main.py:191-217): regex-filtered,
        name-ordered table list."""
        return self.catalog.list_tables(
            schema, self.table_name_include_pattern, self.table_name_exclude_pattern
        )

    def get_columns(self, schema: str, table_name: str) -> list[str]:
        """Reference ``get_columns`` parity (main.py:87-108): type-excluded
        column names in catalog order."""
        return eligible_fields(self.catalog.read_table(schema, table_name).schema)

    # -- projection (A4/A5) -------------------------------------------------
    def _project(self, df: DataFrame) -> DataFrame | None:
        cols = eligible_fields(df.schema)
        if not cols:
            return None
        df = df.select(*cols)
        if self.lowercase_object_names:
            df = df.toDF(*[c.lower() for c in cols])
        return df

    # -- byte-targeted rolling (A12) ----------------------------------------
    def _rows_per_file(self, df: DataFrame) -> int:
        """maxRecordsPerFile ~= target_bytes / avg_in_memory_row_bytes,
        measured on a bounded sample via Arrow — the same 'uncompressed
        buffer size' the reference rolls on (main.py:174-181)."""
        sample = df.limit(SIZE_SAMPLE_ROWS)
        try:
            tbl = sample.toArrow()
            n, nbytes = tbl.num_rows, tbl.nbytes
        except Exception:
            pdf = sample.toPandas()
            n, nbytes = len(pdf), int(pdf.memory_usage(deep=True).sum())
        if n == 0 or nbytes == 0:
            return 1_000_000
        return max(1, int(self.parquet_max_file_size / (nbytes / n)))

    # -- single table (reference export_table, main.py:129-187) -------------
    def export_table(self, schema: str, table: str) -> ExportResult:
        t0 = time.perf_counter()
        out_schema = schema.lower() if self.lowercase_object_names else schema
        out_table = table.lower() if self.lowercase_object_names else table
        target = os.path.join(self.output_path, out_schema, out_table)

        df = self.catalog.read_table(schema, table)
        projected = self._project(df)
        if projected is None:
            logger.warning("Table %s.%s has no eligible columns - skipping", schema, table)
            return ExportResult(schema, table, 0, [], time.perf_counter() - t0, "no_eligible_columns")
        if self.row_limit != DEFAULT_ROW_LIMIT:
            projected = projected.limit(self.row_limit)
        if projected.isEmpty():
            # Reference semantics: empty table -> no file at all (the
            # ParquetWriter is created lazily on the first batch,
            # main.py:165-170, so zero batches -> zero files).
            logger.warning("Table %s.%s is empty - no file written", schema, table)
            return ExportResult(schema, table, 0, [], time.perf_counter() - t0, "empty")

        part_cols = self.partition_by.get(table, [])
        # Size the rolling threshold on the PRE-cluster relation: the
        # sample is a cheap limit() there, but on a range-repartitioned
        # plan it would execute the clustering shuffle a second time.
        rows_per_file = self._rows_per_file(projected)
        projected = self._cluster(projected, table)
        # Row count comes from an Observation on the write job itself —
        # one pass over the data.  (Re-reading the written output to
        # count, as round 1 did, is a full extra scan per table: at
        # 100 TB that doubles export I/O.)
        obs = Observation()
        observed = projected.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = (
            observed.write.mode("overwrite")
            .option("compression", self.compression_method)
            .option("maxRecordsPerFile", str(rows_per_file))
        )
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(target)
        rows = int(obs.get["rows"])
        files = [] if part_cols else self._finalize_layout(target, out_table)
        elapsed = time.perf_counter() - t0
        logger.info("Exported %s.%s in %.4f s", schema, table, elapsed)
        return ExportResult(schema, table, rows, files, elapsed, target=target)

    def _finalize_layout(self, target: str, table: str) -> list[str]:
        """Rename Spark's part-files to the reference layout
        ``<table>_<n>.parquet`` (main.py:166,245-253) and drop job markers.
        Pure metadata renames — O(#files), not O(bytes).  Numbering
        continues after any already-finalized files, so incremental
        appends extend the sequence instead of colliding."""
        if not self.reference_file_naming:
            return []
        existing = re.compile(re.escape(table) + r"_(\d+)\.parquet$")
        taken = [
            int(m.group(1)) for f in os.listdir(target) if (m := existing.match(f))
        ]
        start = max(taken) + 1 if taken else 0
        parts = sorted(
            f for f in os.listdir(target) if f.startswith("part-") and f.endswith(".parquet")
        )
        out = []
        for i, fname in enumerate(parts):
            new = f"{table}_{start + i}.parquet"
            os.rename(os.path.join(target, fname), os.path.join(target, new))
            out.append(new)
        for entry in os.listdir(target):
            if entry == "_SUCCESS" or entry.startswith(".") or entry.endswith(".crc"):
                os.remove(os.path.join(target, entry))
        return out

    # -- incremental export (watermark high-water-mark pattern) -------------
    # No reference counterpart (the reference always re-exports fully);
    # this is the standard warehouse-ingest extension: remember the max
    # of a monotonic column per table, export only rows strictly above
    # it next run.  The filter lands directly on the source scan
    # (pushdown / partition pruning at 100 TB), and the new high-water
    # mark comes from the SAME observe() pass as the row count — zero
    # extra jobs.  Caveat (documented, standard): rows that arrive later
    # with a watermark value <= the recorded mark are not picked up; use
    # a monotonic column (sequence, SCN, ingest timestamp).

    def _state_path(self) -> str:
        return os.path.join(self.output_path, "_incremental_state.json")

    def _load_state(self) -> dict[str, str]:
        try:
            with open(self._state_path()) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return {}

    def _save_state(self, state: dict[str, str]) -> None:
        os.makedirs(self.output_path, exist_ok=True)
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._state_path())

    def export_table_incremental(
        self, schema: str, table: str, watermark_col: str
    ) -> ExportResult:
        t0 = time.perf_counter()
        os.makedirs(self.output_path, exist_ok=True)
        self._recover_pending()
        key = f"{schema}.{table}"
        state = self._load_state()
        last = state.get(key)

        df = self.catalog.read_table(schema, table)
        # Resolve the watermark column case-insensitively (Spark resolves
        # columns case-insensitively; df.schema[...] does not) and reject
        # types whose str() round-trip is not order-preserving: a string
        # watermark would compare lexicographically ('9' > '10'), silently
        # dropping or double-exporting rows.
        matches = [f for f in df.schema.fields if f.name.lower() == watermark_col.lower()]
        if not matches:
            raise ValueError(
                f"Watermark column {watermark_col!r} not found in {schema}.{table}; "
                f"available columns: {[f.name for f in df.schema.fields]}"
            )
        wm_field = matches[0]
        watermark_col = wm_field.name
        if wm_field.dataType.typeName() not in _ORDERABLE_WATERMARK_TYPES:
            raise ValueError(
                f"Watermark column {watermark_col!r} has type "
                f"{wm_field.dataType.simpleString()}; incremental export requires a "
                f"numeric, date or timestamp watermark (string watermarks compare "
                f"lexicographically and would corrupt the high-water mark)"
            )
        if last is not None:
            df = df.where(F.col(watermark_col) > F.lit(last).cast(wm_field.dataType))
        projected = self._project(df)
        if projected is None:
            return ExportResult(
                schema, table, 0, [], time.perf_counter() - t0, "no_eligible_columns"
            )
        if projected.isEmpty():
            logger.info("Table %s.%s: no rows past watermark %r", schema, table, last)
            return ExportResult(schema, table, 0, [], time.perf_counter() - t0, "up_to_date")

        out_schema = schema.lower() if self.lowercase_object_names else schema
        out_table = table.lower() if self.lowercase_object_names else table
        target = os.path.join(self.output_path, out_schema, out_table)
        wm_out = (
            watermark_col.lower() if self.lowercase_object_names else watermark_col
        )
        obs = Observation()
        observed = projected.observe(
            obs, F.count(F.lit(1)).alias("rows"), F.max(wm_out).alias("wm")
        )
        # Crash-consistent append: write the delta to a staging dir, then
        # commit via a pending manifest (atomic os.replace) that lists every
        # file move and the new watermark.  A crash anywhere replays cleanly:
        #   - before the manifest: staging is garbage, state unchanged — the
        #     next run recomputes the same delta and overwrites staging;
        #   - after the manifest: _recover_pending() finishes the moves
        #     (each move is idempotent — skip if already done) and advances
        #     the watermark BEFORE the next delta is computed.
        # Without this, append-then-save-state double-exports the delta if
        # the process dies between the two steps.
        staging = target + ".delta.tmp"
        (
            observed.write.mode("overwrite")
            .option("compression", self.compression_method)
            .option("maxRecordsPerFile", str(self._rows_per_file(projected)))
            .parquet(staging)
        )
        rows = int(obs.get["rows"])
        raw_wm = obs.get["wm"]
        if raw_wm is None:
            # Non-empty delta whose watermark column is entirely NULL: only
            # possible on a first run (later runs filter `col > last`, which
            # excludes NULLs).  str(None) would store the literal "None",
            # which the next run casts to the watermark type — an ANSI error
            # or a silent filter-everything.  The rows were staged but no
            # manifest written, so aborting here is clean (staging is
            # overwritten on the next attempt, state unchanged).
            raise ValueError(
                f"Watermark column {watermark_col!r} is NULL for every row of "
                f"{schema}.{table}; incremental export needs at least one "
                f"non-NULL watermark value to record a high-water mark"
            )
        new_wm = str(raw_wm)
        os.makedirs(target, exist_ok=True)
        existing = re.compile(re.escape(out_table) + r"_(\d+)\.parquet$")
        taken = [
            int(m.group(1)) for f in os.listdir(target) if (m := existing.match(f))
        ]
        start = max(taken) + 1 if taken else 0
        parts = sorted(
            f for f in os.listdir(staging)
            if f.startswith("part-") and f.endswith(".parquet")
        )
        moves = {p: f"{out_table}_{start + i}.parquet" for i, p in enumerate(parts)}
        manifest = {"key": key, "target": target, "staging": staging,
                    "watermark": new_wm, "moves": moves}
        mtmp = self._pending_path() + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        os.replace(mtmp, self._pending_path())
        files = self._commit_pending(manifest, state)
        return ExportResult(
            schema, table, rows, files, time.perf_counter() - t0, target=target
        )

    def _pending_path(self) -> str:
        return os.path.join(self.output_path, "_incremental_pending.json")

    def _commit_pending(self, manifest: dict, state: dict) -> list[str]:
        """Apply a pending manifest: move staged files into the table dir
        (idempotent — a file already moved is skipped), advance the
        watermark, then drop the manifest and staging dir.  Called both on
        the happy path and from :meth:`_recover_pending` after a crash."""
        staging, target = manifest["staging"], manifest["target"]
        files = []
        for part, final in sorted(manifest["moves"].items()):
            src, dst = os.path.join(staging, part), os.path.join(target, final)
            if os.path.exists(src):
                os.replace(src, dst)
            elif not os.path.exists(dst):
                raise RuntimeError(
                    f"Incremental commit lost file {part!r}: neither staged "
                    f"({src}) nor committed ({dst}) copy exists"
                )
            files.append(final)
        state[manifest["key"]] = manifest["watermark"]
        self._save_state(state)
        os.remove(self._pending_path())
        if os.path.exists(staging):
            shutil.rmtree(staging)
        return files

    def _recover_pending(self) -> None:
        """Finish a commit interrupted by a crash: if a pending manifest
        exists, its delta was fully staged but possibly only partially
        moved — complete the moves and watermark advance before computing
        any new delta (otherwise the same rows would export twice).
        Afterwards sweep staging directories no manifest references: a
        crash *before* the manifest is written leaves ``*.delta.tmp``
        garbage that would otherwise persist forever (and confuse
        recursive parquet globs) unless the same table happened to run
        incrementally again."""
        if os.path.exists(self._pending_path()):
            with open(self._pending_path()) as fh:
                manifest = json.load(fh)
            logger.warning(
                "Recovering interrupted incremental export for %s (%d files)",
                manifest["key"], len(manifest["moves"]),
            )
            self._commit_pending(manifest, self._load_state())
        self._sweep_orphan_staging()

    def _sweep_orphan_staging(self) -> None:
        """Delete ``*.delta.tmp`` staging dirs under the output path.  Only
        called when no pending manifest exists (recovery just completed or
        none was needed) and before any new staging is written, so every
        surviving staging dir is an orphan from a pre-manifest crash."""
        for root, dirs, _files in os.walk(self.output_path):
            for d in list(dirs):
                if d.endswith(".delta.tmp"):
                    orphan = os.path.join(root, d)
                    logger.warning("Removing orphaned staging directory %s", orphan)
                    shutil.rmtree(orphan)
                    dirs.remove(d)

    def export_tables_incremental(
        self, watermarks: dict[str, str]
    ) -> list[ExportResult]:
        """Incremental driver loop: ``watermarks`` maps table name ->
        monotonic watermark column.  Unlike ``export_tables`` this never
        clears the output directory — it appends new deltas and advances
        the per-table high-water marks in ``_incremental_state.json``."""
        os.makedirs(self.output_path, exist_ok=True)
        self._recover_pending()
        results: list[ExportResult] = []
        matched: set[str] = set()
        schemas = self.schemas or self.catalog.list_schemas()
        for schema in schemas:
            for table in self.catalog.list_tables(
                schema, self.table_name_include_pattern, self.table_name_exclude_pattern
            ):
                if table in watermarks:
                    matched.add(table)
                    results.append(
                        self.export_table_incremental(schema, table, watermarks[table])
                    )
        # A typo'd or schema-filtered watermark key would otherwise vanish
        # silently — the caller would read "no result row" as "up to date".
        unmatched = sorted(set(watermarks) - matched)
        if unmatched:
            logger.warning(
                "Watermark entries matched no exported table (typo or filtered "
                "out by schema/include/exclude?): %s", unmatched
            )
        return results

    # -- driver loop (reference export_tables, main.py:219-263) -------------
    def export_tables(self) -> list[ExportResult]:
        t_all = time.perf_counter()
        if os.path.exists(self.output_path):
            if not self.overwrite:
                raise RuntimeError(
                    f"Output path: {self.output_path} exists and overwrite is not allowed."
                )
            shutil.rmtree(self.output_path)
        os.makedirs(self.output_path, exist_ok=True)

        results: list[ExportResult] = []
        schemas = self.schemas or self.catalog.list_schemas()
        for schema in schemas:
            t_schema = time.perf_counter()
            tables = self.catalog.list_tables(
                schema, self.table_name_include_pattern, self.table_name_exclude_pattern
            )
            if self.max_concurrent_tables > 1:
                with ThreadPoolExecutor(max_workers=self.max_concurrent_tables) as pool:
                    results.extend(pool.map(lambda t: self.export_table(schema, t), tables))
            else:
                for table in tables:
                    results.append(self.export_table(schema, table))
            logger.info(
                "Exported schema: %s in %.4f s", schema, time.perf_counter() - t_schema
            )
        logger.info("Exported all schemas in %.4f s", time.perf_counter() - t_all)
        return results


@dataclass
class SchemaDrift:
    added: list[str]
    removed: list[str]
    retyped: list[str]  # "name: old -> new"

    @property
    def changed(self) -> bool:
        return bool(self.added or self.removed or self.retyped)


def schema_drift(old, new) -> SchemaDrift:
    """Diff two Spark StructTypes by column name + type.  The
    export-validation primitive: run it between the source's current
    schema and the last export's parquet footer schema to catch columns
    appearing, vanishing, or changing type before (not after) a 100 TB
    re-export is launched."""
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    return SchemaDrift(
        added=sorted(set(n) - set(o)),
        removed=sorted(set(o) - set(n)),
        retyped=sorted(f"{c}: {o[c]} -> {n[c]}" for c in set(o) & set(n) if o[c] != n[c]),
    )


def check_export_drift(
    spark: SparkSession, catalog, schema: str, table: str, exported_path: str
) -> SchemaDrift:
    """Drift between the catalog's CURRENT schema for a table and what an
    earlier export wrote (read from parquet footers — metadata only)."""
    current = catalog.read_table(schema, table).schema
    previous = spark.read.parquet(exported_path).schema
    return schema_drift(previous, current)


def compact_table(
    spark: SparkSession,
    path: str,
    table: str,
    target_file_size: int = DEFAULT_MAX_FILE_SIZE,
    compression: str = DEFAULT_COMPRESSION,
    cluster_by: list[str] | None = None,
    cluster_curve: str = "hilbert",
) -> int:
    """Compact a table directory's small files into ~target-sized ones,
    preserving the reference ``<table>_<n>.parquet`` naming.  Incremental
    appends accumulate one small file per run; this rewrite is the
    standard maintenance pass (Delta OPTIMIZE / Iceberg rewrite_data_files
    for plain parquet dirs).  One distributed read + one write; the
    rows-per-file target reuses the exporter's sampled row-width
    heuristic (A12).  ``cluster_by`` additionally orders the rewrite on a
    space-filling curve over the listed columns (OPTIMIZE ZORDER parity:
    compaction is exactly when clustering is cheapest, since the data is
    being rewritten anyway — the curve turns the repartition it must do
    regardless into a range-repartition + sort).  Returns the resulting
    file count."""
    # Startup recovery: a crash mid-swap leaves ``<path>.compact.old``
    # holding the (complete) pre-compaction data.  If the live dir is
    # missing, restore it before proceeding; if both exist, the swap
    # completed and the old copy is stale garbage.
    stale = path.rstrip("/") + ".compact.old"
    if os.path.exists(stale):
        if not os.path.exists(path):
            os.rename(stale, path)
        else:
            shutil.rmtree(stale)
    # Refuse to compact while a crashed incremental commit is pending for
    # this directory: compaction renumbers files from <table>_0, but the
    # manifest's staged moves were computed against the PRE-compaction
    # numbering — replaying them afterwards would overwrite compacted data
    # files.  The manifest lives at the exporter's output root; probe the
    # ancestors of the table dir (layout is <out>/<schema>/<table>).
    probe = os.path.dirname(os.path.abspath(path.rstrip("/")))
    for _ in range(3):
        pending = os.path.join(probe, "_incremental_pending.json")
        if os.path.exists(pending):
            with open(pending) as fh:
                manifest = json.load(fh)
            if os.path.abspath(manifest.get("target", "")) == os.path.abspath(
                path.rstrip("/")
            ):
                raise RuntimeError(
                    f"A pending incremental commit targets {path}; run the "
                    f"incremental exporter once to recover it before compacting"
                )
            break  # manifest found but for another table — safe
        parent = os.path.dirname(probe)
        if parent == probe:
            break
        probe = parent
    df = spark.read.parquet(path)
    sample = df.limit(SIZE_SAMPLE_ROWS)
    tbl = sample.toArrow()
    per_row = (tbl.nbytes / tbl.num_rows) if tbl.num_rows else 1000.0
    rows_per_file = max(1, int(target_file_size / per_row))
    n_files = max(1, (df.count() + rows_per_file - 1) // rows_per_file)

    tmp = path.rstrip("/") + ".compact.tmp"
    if cluster_by:
        from oracle_parquet_dumper_spark.sources.layouts import hilbert_key, zorder_key

        if cluster_curve == "hilbert":
            keyed, key = hilbert_key(df, cluster_by), "_h"
        elif cluster_curve == "zorder":
            keyed, key = zorder_key(df, cluster_by), "_z"
        else:
            raise ValueError(f"cluster_curve must be 'hilbert' or 'zorder', got {cluster_curve!r}")
        out_df = keyed.repartitionByRange(n_files, key).sortWithinPartitions(key).drop(key)
    else:
        out_df = df.repartition(n_files)
    (
        out_df
        .write.mode("overwrite")
        .option("compression", compression)
        .option("maxRecordsPerFile", str(rows_per_file))
        .parquet(tmp)
    )
    # Atomic-ish swap: never leave a window where the live dir is gone.
    # rmtree-then-rename would lose the table entirely if we crash between
    # the two (the incremental state still records the high-water mark, so
    # the next run would append only the delta on top of nothing).  Instead
    # move the live dir aside, rename tmp into place, then delete the old
    # copy; a crash at any point leaves either the old or the new data
    # present, and a leftover ``.compact.old`` is recovered on re-run.
    old = path.rstrip("/") + ".compact.old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # roll back: restore the live dir
        raise
    shutil.rmtree(old)
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    for i, fname in enumerate(parts):
        os.rename(os.path.join(path, fname), os.path.join(path, f"{table}_{i}.parquet"))
    for entry in os.listdir(path):
        if entry == "_SUCCESS" or entry.startswith(".") or entry.endswith(".crc"):
            os.remove(os.path.join(path, entry))
    return len(parts)


def exporter(
    spark: SparkSession,
    source_path: str,
    output_path: str,
    **kwargs,
) -> list[ExportResult]:
    """Programmatic one-call surface, analog of reference ``exporter()``
    (main.py:266-314) with the parquet-directory catalog."""
    cat = ParquetDirectoryCatalog(spark, source_path)
    return SparkParquetExporter(
        spark=spark, catalog=cat, output_path=output_path, **kwargs
    ).export_tables()
