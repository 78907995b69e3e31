"""Data-quality validation operators: declarative constraint checking,
distribution histograms, and partition-completeness auditing — the
pre-flight gates a 100 TB ingest runs before (and after) every export.

Design notes for scale:

- The constraint report is a UNION of independent aggregates over ONE
  table scan each; Catalyst collapses the scans it can share, and every
  aggregate is a partial (map-side combine) so the shuffle carries one
  row per constraint, not data.
- Referential-integrity violation counting is a broadcast anti-join
  when the dimension is small (customer here), a shuffle anti-join
  otherwise — never a collect.
- The equi-width histogram derives its bounds from an in-plan broadcast
  1-row min/max aggregate (the zorder_key pattern, sources/layouts.py),
  so bucketing is a single pass with no driver round-trip.
- The equi-depth histogram is NTILE over a window — one sort-shuffle;
  ties are ordered by a unique key so the tile assignment (and hence
  the oracle comparison) is deterministic.
- Partition completeness is a per-partition count joined against the
  trailing window average — the freshness/volume anomaly gate of an
  incremental pipeline (pairs with exporter.export_tables_incremental).

The reference has no validation surface at all (it exports whatever the
dictionary lists, main.py:219-263); this module is part of the Part-B
capability extension and every query here is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import query
from oracle_parquet_dumper_spark.sources.tables import load_table

N_HIST_BUCKETS = 10


@query(
    "dq_constraint_report",
    oracle="""
    SELECT 'orderkey_not_null' AS constraint_name,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'status_in_accepted_set',
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'custkey_references_customer',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    """,
    tags=("validation", "agg", "join"),
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over ``orders``: not-null,
    uniqueness, accepted value set, range, and referential integrity
    against ``customer`` — one violation-count row per constraint (the
    Deequ/dbt-test shape).  Each check is an independent aggregate; the
    RI check is an anti-join that Spark broadcasts when the dimension
    fits (asserted in tests/test_validation.py)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def one(name: str, violations) -> DataFrame:
        return o.agg(
            F.lit(name).alias("constraint_name"),
            violations.cast("long").alias("n_violations"),
        )

    checks = [
        one("orderkey_not_null", F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))),
        one("orderkey_unique", F.count(F.lit(1)) - F.countDistinct("o_orderkey")),
        one(
            "status_in_accepted_set",
            F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)),
        ),
        one("totalprice_positive", F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))),
    ]
    orphans = (
        # customer's PK set grows with SF — no forced broadcast; AQE
        # picks broadcast vs shuffled anti-join from runtime size
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(
            F.lit("custkey_references_customer").alias("constraint_name"),
            F.count(F.lit(1)).cast("long").alias("n_violations"),
        )
    )
    out = checks[0]
    for ch in checks[1:] + [orphans]:
        out = out.unionByName(ch)
    return out


@query(
    "dq_histogram_equiwidth",
    oracle=f"""
    WITH b AS (
      SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
    )
    SELECT CASE WHEN mx = mn THEN 0
                ELSE LEAST(CAST(floor((o_totalprice - mn) / ((mx - mn) / {N_HIST_BUCKETS}.0)) AS BIGINT),
                           {N_HIST_BUCKETS - 1}) END AS bucket,
           COUNT(*) AS n,
           round(MIN(o_totalprice), 2) AS lo,
           round(MAX(o_totalprice), 2) AS hi
    FROM orders CROSS JOIN b
    GROUP BY 1 ORDER BY 1
    """,
    tags=("validation", "agg"),
)
def dq_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width value histogram over o_totalprice: bounds come from
    an in-plan broadcast 1-row min/max (no driver round-trip — the
    zorder_key pattern), bucketing is one scan + one partial-aggregated
    groupBy.  The distribution-drift check a pipeline runs per
    ingest."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / float(N_HIST_BUCKETS)
    # constant column => zero width => 0/0 = NaN, which the engines cast
    # differently (Spark 0, DuckDB NULL); degenerate to one bucket.
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long")).otherwise(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("mn")) / width).cast("long"),
            F.lit(N_HIST_BUCKETS - 1),
        )
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "dq_histogram_equidepth",
    oracle=f"""
    WITH t AS (
      SELECT o_totalprice,
             ntile({N_HIST_BUCKETS}) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
      FROM orders
    )
    SELECT tile, COUNT(*) AS n,
           round(MIN(o_totalprice), 2) AS lo,
           round(MAX(o_totalprice), 2) AS hi
    FROM t GROUP BY tile ORDER BY tile
    """,
    tags=("validation", "window", "agg", "skew-source"),
)
def dq_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-depth (quantile) histogram: each tile holds ~1/{N} of the
    rows, so tile boundaries ARE the deciles.  The oracle states it as
    ``ntile() OVER (ORDER BY ...)`` — a single-partition window that
    must NOT run at 100 TB; the Spark plan computes the identical tile
    assignment from a distributed global row index (two-pass
    bucket-offset pattern, operators/global_index.py) plus the standard
    NTILE integer formula.  The tie-break on the unique key makes the
    index — and hence the oracle hash — deterministic.  The index pass
    uses the QUANTILE bucketer: totalprice is unbounded monetary data,
    so equi-width min/max bounds would pile most orders into the low
    buckets (the exact skew an equi-DEPTH histogram exists to expose);
    approx-percentile boundaries keep bucket occupancy even, and the
    index is bucketer-invariant (any monotone bucketing is exact)."""
    from oracle_parquet_dumper_spark.operators.global_index import (
        ntile_expr,
        with_global_index,
    )

    o = load_table(spark, sf_dir, "orders")
    idx = with_global_index(
        o.select("o_totalprice", "o_orderkey"),
        "o_totalprice",
        ["o_orderkey"],
        bucketer="quantile",
    )
    return (
        idx.select(
            "o_totalprice",
            ntile_expr(F.col("_gidx"), F.col("_gn"), N_HIST_BUCKETS).alias("tile"),
        )
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("tile")
    )


@query(
    "dq_partition_completeness",
    oracle="""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT month, n,
             AVG(CAST(n AS DOUBLE)) OVER (
               ORDER BY month ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING
             ) AS trailing_avg
      FROM m
    )
    SELECT month, n,
           round(coalesce(trailing_avg, CAST(n AS DOUBLE)), 2) AS trailing_avg,
           CAST(trailing_avg IS NOT NULL AND n < 0.5 * trailing_avg AS BOOLEAN) AS anomaly
    FROM w ORDER BY month
    """,
    tags=("validation", "window", "agg"),
)
def dq_partition_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-completeness audit: per-month row counts compared to
    the trailing-3-month average; a month under 50% of its trailing
    average is flagged.  The volume-anomaly gate an incremental export
    pipeline (exporter.export_tables_incremental) runs after each
    watermark advance — a sudden drop means the upstream feed broke,
    not that the data got quiet.  Counts are integers and the trailing
    mean is a fixed-order window fold over at most 3 values, so the
    check is oracle-exact."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("month").rowsBetween(-3, -1)
    trailing = F.avg(F.col("n").cast("double")).over(w)
    return m.select(
        "month",
        "n",
        F.round(F.coalesce(trailing, F.col("n").cast("double")), 2).alias("trailing_avg"),
        (trailing.isNotNull() & (F.col("n") < 0.5 * trailing)).alias("anomaly"),
    ).orderBy("month")


@query(
    "dq_table_checksum",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substring(md5(
             concat_ws('|', CAST(o_orderkey AS VARCHAR),
                            coalesce(CAST(o_custkey AS VARCHAR), '<null>'),
                            coalesce(o_orderstatus, '<null>'),
                            coalesce(CAST(o_totalprice AS VARCHAR), '<null>'))
           ), 1, 15)) AS BIGINT)) AS VARCHAR) AS checksum
    FROM orders
    """,
    tags=("validation", "agg"),
)
def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum: per-row md5 over a canonical
    column serialization (null-sentineled), summed exactly — identical
    no matter how the table is partitioned, sorted, or re-exported.
    THE cheap source-vs-export integrity check at 100 TB: run on both
    sides, compare two numbers; any dropped, duplicated, or mutated row
    moves the sum.  One scan, one partial-aggregated number per side.
    Doubles serialize via their shortest round-trip repr in both
    engines, so the canonical string is engine-portable."""
    o = load_table(spark, sf_dir, "orders")
    sentinel = F.lit("<null>")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.coalesce(F.col("o_custkey").cast("string"), sentinel),
        F.coalesce(F.col("o_orderstatus"), sentinel),
        F.coalesce(F.col("o_totalprice").cast("string"), sentinel),
    )
    row_hash = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 15), 16, 10).cast("long")
    # 60-bit hashes summed over billions of rows overflow a long; the
    # sum runs in exact DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and the
    # checksum is emitted as a string — both engines stringify the exact
    # integer identically.
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash.cast("decimal(38,0)")).cast("string").alias("checksum"),
    )


@query(
    "dq_benford_leading_digit",
    oracle="""
    WITH cents AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c FROM orders
      WHERE o_totalprice > 0
    ),
    d AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM cents
    ),
    t AS (SELECT COUNT(*) AS total FROM d)
    SELECT digit, COUNT(*) AS n_orders,
           (COUNT(*) * 1000000) // MAX(total) AS share_ppm
    FROM d CROSS JOIN t
    GROUP BY digit
    """,
    tags=("dq", "profile"),
)
def dq_benford_leading_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order amounts (the Benford's-law
    fraud/entry-error screen): histogram of the first significant digit
    with an EXACT parts-per-million share (integer division — no float
    rounding to tie-break cross-engine).

    The leading digit is taken from the integer cents value through a
    BIGINT -> string hop (identical in every engine) instead of
    log10/pow arithmetic (libm-dependent).  One scan, one 9-row partial
    aggregate; the total is an in-plan broadcast 1-row aggregate."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    d = o.select(F.substring(cents.cast("string"), 1, 1).cast("long").alias("digit"))
    t = d.agg(F.count(F.lit(1)).alias("total"))
    return (
        d.crossJoin(F.broadcast(t))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("CAST(count(1) * 1000000 DIV max(total) AS BIGINT)").alias("share_ppm"),
        )
    )


@query(
    "dq_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_disc(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, abs(e.value - m.med) AS d, m.med
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_disc(d, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           COUNT(*) AS n,
           MAX(dev.med) AS median_value,
           MAX(mad.mad) AS mad,
           CAST(SUM(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type
    """,
    tags=("dq", "profile", "stats", "skew-source"),
)
def dq_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly screen: per event type, count values more than 3
    median-absolute-deviations from the median — the outlier detector
    that, unlike mean/stddev z-scores, is not itself dragged by the
    outliers it is hunting.

    Determinism: both medians are DISCRETE percentiles (an actual data
    value — no interpolation arithmetic), deviations are single IEEE
    subtractions of identical doubles, and the 3*MAD threshold compare
    therefore resolves identically cross-engine.

    Scale shape: neither median runs Spark's ``percentile_disc`` buffer
    aggregate (per-type state = every raw value sorted in ONE task —
    the round-6 verdict's scale-killer class, swept out of the registry
    in round 7).  Both passes first reduce to the (type, value) /
    (type, deviation) COUNT relation — map-side partial, one row per
    distinct double — then take the weighted order statistic on the
    global-index primitive (quantile bucketer: raw monetary values are
    heavy-tailed, so equi-width would concentrate the distinct-value
    relation's low end into one bucket).  Deviations and the outlier
    fold also run on the value-level relation (weights carry the raw
    counts), so after the first aggregate nothing touches raw rows."""
    from oracle_parquet_dumper_spark.operators.global_index import weighted_quantiles

    ev = load_table(spark, sf_dir, "events")
    # the (type, value) count relation feeds BOTH median passes, the
    # deviation join and the final fold — truncate lineage once (the
    # agg_mannwhitney_u convention) so the plan scans it, not re-derives
    # it per consumer.
    vc = (
        ev.groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("_w"))
        .localCheckpoint(eager=False)
    )
    med = weighted_quantiles(
        vc, "value", "_w", group_cols=["event_type"], disc={"med": 0.5},
        bucketer="quantile",
    )
    dev = vc.join(F.broadcast(med), "event_type").select(
        "event_type", "med", "_w", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    dev = dev.localCheckpoint(eager=False)
    devc = dev.groupBy("event_type", "med", "d").agg(F.sum("_w").alias("_w"))
    mad = weighted_quantiles(
        devc, "d", "_w", group_cols=["event_type"], disc={"mad": 0.5},
        bucketer="quantile",
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum("_w").cast("long").alias("n"),
            F.max("med").alias("median_value"),
            F.max("mad").alias("mad"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad"), F.col("_w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_outliers"),
        )
    )


# snapshot-diff simulation constants: the "old" snapshot is missing
# every ADD_MOD-th key (later-arrived rows), the "new" snapshot bumps
# every CHG_MOD-th price by one cent (updates) and drops every
# DEL_MOD-th key (deletions)
DIFF_ADD_MOD = 97
DIFF_CHG_MOD = 101
DIFF_DEL_MOD = 89

_DIFF_DIGEST_SQL = (
    "md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR), "
    "o_orderstatus, CAST(cents AS VARCHAR), strftime(o_orderdate, '%Y-%m-%d')))"
)


@query(
    "dq_snapshot_diff",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    old AS (
      SELECT o_orderkey, {_DIFF_DIGEST_SQL} AS dig
      FROM base WHERE o_orderkey % {DIFF_ADD_MOD} != 0
    ),
    new AS (
      SELECT o_orderkey, {_DIFF_DIGEST_SQL} AS dig
      FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate,
                   cents + CASE WHEN o_orderkey % {DIFF_CHG_MOD} = 0
                                THEN 1 ELSE 0 END AS cents
            FROM base WHERE o_orderkey % {DIFF_DEL_MOD} != 0)
    ),
    j AS (
      SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.dig != n.dig THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT status, COUNT(*) AS n FROM j GROUP BY status
    """,
    tags=("dq", "join", "pipeline"),
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the validation step behind the exporter's
    incremental-append story (exporter.py's crash-replay appends): given
    two versions of a table, classify every key as added / removed /
    changed / unchanged and report counts.  Here the two versions are
    simulated deterministically from ``orders`` (old is missing every
    {DIFF_ADD_MOD}-th key; new bumps every {DIFF_CHG_MOD}-th price by a
    cent and drops every {DIFF_DEL_MOD}-th key) so the expected counts
    are checkable; in production both sides are real snapshot reads.

    The diff ships (key, md5-digest) pairs ONLY — change detection
    compares 16-byte digests, never the row bodies, so a 100-column
    table diffs with the same shuffle volume as a 2-column one (the
    dedup_exact digest-only convention applied to versioning).  The
    digest input renders floats as exact integer cents and dates as
    ISO strings (both engines format identically); the FULL OUTER join
    shuffles both sides by key once; the classification is a map-side
    CASE into a 4-row aggregate.  Companion to ``dq_table_checksum``
    (one digest for the whole table: tells you THAT it changed;
    this tells you WHERE)."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )

    def dig(df: DataFrame) -> Column:
        return F.md5(
            F.concat_ws(
                "|",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_orderstatus"),
                F.col("cents").cast("string"),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
            )
        )

    old = base.where(F.col("o_orderkey") % DIFF_ADD_MOD != 0).select(
        F.col("o_orderkey").alias("k_old"), dig(base).alias("dig_old")
    )
    bumped = base.where(F.col("o_orderkey") % DIFF_DEL_MOD != 0).withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("o_orderkey") % DIFF_CHG_MOD == 0, 1).otherwise(0),
    )
    new = bumped.select(
        F.col("o_orderkey").alias("k_new"), dig(bumped).alias("dig_new")
    )
    j = old.join(new, old["k_old"] == new["k_new"], "full_outer")
    status = (
        F.when(F.col("k_old").isNull(), F.lit("added"))
        .when(F.col("k_new").isNull(), F.lit("removed"))
        .when(F.col("dig_old") != F.col("dig_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "dq_functional_dependencies",
    oracle="""
    WITH cands AS (
      SELECT 'orders.o_orderkey->o_custkey' AS fd,
             COUNT(*) AS n_lhs,
             SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS viol,
             MAX(nd) AS max_rhs
      FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS nd
            FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'orders.o_custkey->o_orderpriority',
             COUNT(*), SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), MAX(nd)
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY o_custkey)
      UNION ALL
      SELECT 'lineitem.l_partkey->l_suppkey',
             COUNT(*), SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), MAX(nd)
      FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS nd
            FROM lineitem GROUP BY l_partkey)
      UNION ALL
      SELECT 'nation.n_nationkey->n_regionkey',
             COUNT(*), SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), MAX(nd)
      FROM (SELECT n_nationkey, COUNT(DISTINCT n_regionkey) AS nd
            FROM nation GROUP BY n_nationkey)
      UNION ALL
      SELECT 'customer.c_nationkey->c_mktsegment',
             COUNT(*), SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END), MAX(nd)
      FROM (SELECT c_nationkey, COUNT(DISTINCT c_mktsegment) AS nd
            FROM customer GROUP BY c_nationkey)
    )
    SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs_groups,
           CAST(viol AS BIGINT) AS violating_groups,
           CAST(max_rhs AS BIGINT) AS max_rhs_per_lhs,
           viol = 0 AS holds
    FROM cands
    """,
    tags=("validation", "agg", "profiling"),
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over a fixed candidate set: for each
    A -> B candidate, the number of A-groups, how many of them see more
    than one distinct B (violations), and the worst fan-out — the core
    primitive of schema profiling (key discovery, denormalization
    checks) that an export pipeline runs to decide partition and
    bucketing columns before a 100 TB dump.

    Scale shape: each candidate is one two-level hash aggregate
    (groupBy A with per-group exact distinct-B, then a 1-row fold);
    the union carries five 1-row relations.  No joins, no windows."""

    def probe(table: str, lhs: str, rhs: str) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        per = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        return per.agg(
            F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).cast("long").alias("n_lhs_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("violating_groups"),
            F.max("nd").cast("long").alias("max_rhs_per_lhs"),
        )

    parts = [
        probe("orders", "o_orderkey", "o_custkey"),
        probe("orders", "o_custkey", "o_orderpriority"),
        probe("lineitem", "l_partkey", "l_suppkey"),
        probe("nation", "n_nationkey", "n_regionkey"),
        probe("customer", "c_nationkey", "c_mktsegment"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.withColumn("holds", F.col("violating_groups") == 0)


@query(
    "dq_histogram_log2_gaps",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             date_diff('second',
                       LAG(CAST(ts AS TIMESTAMP)) OVER
                         (PARTITION BY user_id, event_type ORDER BY ts, event_id),
                       CAST(ts AS TIMESTAMP)) AS gap_s
      FROM events
    ),
    b AS (
      SELECT event_type, gap_s,
             CAST(length(bin(CAST(gap_s AS BIGINT))) - 1 AS INT) AS bucket
      FROM gaps WHERE gap_s IS NOT NULL
    )
    SELECT event_type, bucket,
           CAST(CASE WHEN bucket = 0 THEN 0
                     ELSE CAST(1 AS BIGINT) << bucket END AS BIGINT) AS lo_s,
           CAST((CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS BIGINT) AS hi_s,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM b GROUP BY event_type, bucket
    """,
    tags=("dq", "events", "stats", "timeseries"),
)
def dq_histogram_log2_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HdrHistogram-flavored LOG2-bucketed inter-arrival histogram per
    event type: bucket k holds gaps in [2^k, 2^(k+1)) seconds (bucket 0
    holds 0-1 s), the exponential bucketing every latency-tail monitor
    uses — ~40 buckets cover nanoseconds to centuries, vs equi-width's
    blindness to tails and equi-depth's data-dependent bounds.

    Exact log2 WITHOUT floating point: floor(log2 n) computed as
    length(bin(n)) - 1 — the binary-string length, identical in both
    engines, immune to the ln(8)/ln(2) = 2.9999... float-floor trap
    that a log()-based bucketer hits at every power of two.

    Scale shape: one per-(user, type) ordered window pass produces the
    gaps (the events_inter_arrival_percentiles lag), then one map-side
    partial aggregate to <= #types x ~40 bucket cells.  Per-task state
    is bucket cells, never raw gaps."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    b = gaps.select(
        "event_type",
        "gap_s",
        (F.length(F.bin(F.col("gap_s").cast("bigint"))) - 1).cast("int").alias("bucket"),
    )
    g = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
    )
    return g.select(
        "event_type",
        "bucket",
        F.expr(
            "CASE WHEN bucket = 0 THEN CAST(0 AS BIGINT)"
            " ELSE shiftleft(CAST(1 AS BIGINT), bucket) END"
        ).alias("lo_s"),
        F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1").alias("hi_s"),
        "n",
        "min_gap_s",
        "max_gap_s",
    )


K_ANON_MIN = 10  # the conventional "k >= 10" publication threshold
L_DIV_MIN = 3


@query(
    "dq_k_anonymity",
    oracle=f"""
    WITH cls AS (
      SELECT o_orderstatus AS status, o_orderpriority AS priority,
             CAST(year(o_orderdate) AS BIGINT) AS yr,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(COUNT(DISTINCT CAST(floor(o_totalprice / 50000.0) AS BIGINT)) AS BIGINT) AS l_distinct
      FROM orders
      GROUP BY o_orderstatus, o_orderpriority, year(o_orderdate)
    ),
    s AS (
      SELECT SUM(CASE WHEN k < {K_ANON_MIN} THEN k ELSE 0 END) AS rows_below_k,
             SUM(k) AS rows_total
      FROM cls
    )
    SELECT status, priority, yr, k, l_distinct,
           k >= {K_ANON_MIN} AS meets_k,
           l_distinct >= {L_DIV_MIN} AS meets_l,
           CAST((1000000 * rows_below_k) // rows_total AS BIGINT) AS frac_rows_below_k_ppm
    FROM cls CROSS JOIN s
    """,
    tags=("dq", "agg", "privacy"),
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit over the quasi-identifier tuple
    (status, priority, order year): k = rows per QI equivalence class
    (Sweeney 2002 — a class with k < {K_ANON_MIN} re-identifies its
    members against any external join on the same QI columns),
    l_distinct = distinct sensitive values (50k-wide price bands) per
    class (Machanavajjhala 2007 — a k-anonymous class whose sensitive
    attribute is CONSTANT still leaks it).  The release gate a training
    corpus built from transactional exports needs before the export
    layer ships rows downstream; frac_rows_below_k_ppm is the headline
    suppression cost.

    Scale shape: the QI domain is bounded (3 statuses x 5 priorities x
    calendar years), so the class relation is a map-side partial
    aggregate to <= a few hundred cells at ANY data size; the summary
    is a 1-row fold over it, crossJoined back broadcast.  The distinct
    count is per-class exact (partial distinct within the bounded
    cell)."""
    o = load_table(spark, sf_dir, "orders")
    cls = (
        o.groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.countDistinct(
                F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
            )
            .cast("long")
            .alias("l_distinct"),
        )
        .localCheckpoint(eager=False)  # <= #QI-cells rows, feeds 2 consumers
    )
    s = cls.agg(
        F.sum(F.when(F.col("k") < K_ANON_MIN, F.col("k")).otherwise(0)).alias(
            "rows_below_k"
        ),
        F.sum("k").alias("rows_total"),
    )
    return cls.crossJoin(F.broadcast(s)).select(
        "status",
        "priority",
        "yr",
        "k",
        "l_distinct",
        (F.col("k") >= K_ANON_MIN).alias("meets_k"),
        (F.col("l_distinct") >= L_DIV_MIN).alias("meets_l"),
        F.expr("CAST((1000000 * rows_below_k) div rows_total AS BIGINT)").alias(
            "frac_rows_below_k_ppm"
        ),
    )


FRESH_SLA_S = 86400  # one-day staleness SLA per event stream


@query(
    "dq_freshness_lag",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(epoch_us(ts)) AS last_us
      FROM events GROUP BY event_type
    ),
    t AS (SELECT MAX(last_us) AS now_us FROM g)
    SELECT event_type, n_events,
           CAST((now_us - last_us) // 1000000 AS BIGINT) AS lag_s,
           (now_us - last_us) // 1000000 > {FRESH_SLA_S} AS stale
    FROM g CROSS JOIN t
    """,
    tags=("dq", "agg", "timeseries"),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness audit: each event type's lag behind the
    most recent event anywhere in the table (the batch-world proxy for
    'now'), with a one-day SLA flag — the first monitor an ingestion
    pipeline grows, because a silently-stalled upstream topic shows up
    as one stream's lag diverging while row counts still look plausible
    day over day.

    Determinism: pure integer microsecond arithmetic (epoch max, floor
    division to seconds) — no doubles anywhere.

    Scale shape: ONE map-side-partial aggregate to the <= #types
    relation (count + max fold per partition, then merge); the 'now'
    fold is 1 row crossJoined back broadcast.  No window, no raw-row
    shuffle — the scan's partial aggregates are the entire data-sized
    work at any scale."""
    g = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("last_us"),
        )
        .localCheckpoint(eager=False)  # <= #types rows, feeds 2 consumers
    )
    t = g.agg(F.max("last_us").alias("now_us"))
    lag_s = F.expr("(now_us - last_us) div 1000000")
    return g.crossJoin(F.broadcast(t)).select(
        "event_type",
        "n_events",
        lag_s.cast("long").alias("lag_s"),
        (lag_s > FRESH_SLA_S).alias("stale"),
    )


# --- cross-table reconciliation (orders vs lineitem roll-up, r11) -----------


@query(
    "dq_reconciliation_orders_lineitem",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                                 * 100) AS BIGINT)) AS BIGINT) AS li_cents
      FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
      SELECT o.o_orderstatus AS status,
             ABS(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)
                 - COALESCE(li.li_cents, 0)) AS diff_cents
      FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN diff_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mismatched,
           CAST(MAX(diff_cents) AS BIGINT) AS max_abs_diff_cents,
           CAST(SUM(diff_cents) AS BIGINT) AS total_abs_diff_cents
    FROM j GROUP BY status ORDER BY status
    """,
    tags=("validation", "agg", "join"),
)
def dq_reconciliation_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table RECONCILIATION: does each order's header total match
    the roll-up of its line items (extendedprice x (1-discount) x
    (1+tax))?  Per order status: order count, mismatched count, worst
    and total absolute drift in cents — the header-vs-detail balance
    audit every financial/warehouse pipeline runs nightly, and the
    missing sibling of dq_constraint_report's single-table checks
    (referential integrity says the rows EXIST; reconciliation says
    the AMOUNTS agree).

    Determinism: both engines floor the identical double product to
    cents per line (same op tree — IEEE multiply is correctly rounded)
    and every aggregate after that is exact BIGINT.  Orders with no
    line items reconcile against 0 via the left join, so they surface
    as mismatches instead of disappearing.

    Scale shape: one map-side-partial roll-up of lineitem keyed by
    l_orderkey (the natural join key), one orderkey equi-join (both
    sides data-sized — no forced hint, AQE chooses), then a fold to
    the 3-value status domain."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                    * 100
                ).cast("long")
            )
            .cast("long")
            .alias("li_cents")
        )
    )
    o = load_table(spark, sf_dir, "orders")
    j = o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        F.col("o_orderstatus").alias("status"),
        F.abs(
            F.floor(F.col("o_totalprice") * 100).cast("long")
            - F.coalesce(F.col("li_cents"), F.lit(0))
        ).alias("diff_cents"),
    )
    return (
        j.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(F.col("diff_cents") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_mismatched"),
            F.max("diff_cents").cast("long").alias("max_abs_diff_cents"),
            F.sum("diff_cents").cast("long").alias("total_abs_diff_cents"),
        )
        .orderBy("status")
    )


# --- numeric distribution drift: exact 1-Wasserstein / EMD (r11) ------------

EMD_PACK = 1 << 31  # packs (cntA, cntB) into one weight: w = cntA*PACK + cntB


@query(
    "dq_drift_emd_numeric",
    oracle="""
    WITH v AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT cents,
             CAST(SUM(ca) OVER (ORDER BY cents) AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY cents) AS BIGINT) AS cumb,
             LEAD(cents) OVER (ORDER BY cents) AS nxt
      FROM v
    ),
    t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM v)
    SELECT t.na AS n_a, t.nb AS n_b,
           CAST(CAST(CAST(SUM(CAST(ABS(cuma * t.nb - cumb * t.na) AS HUGEINT)
                               * (nxt - cents)) AS HUGEINT) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(t.na AS HUGEINT) * t.nb AS VARCHAR) AS DOUBLE)
             AS emd_cents
    FROM c CROSS JOIN t WHERE nxt IS NOT NULL
    GROUP BY t.na, t.nb
    """,
    tags=("validation", "agg", "stats", "skew-source"),
    bench=True,  # standing number for the packed-weight global-index CDF path
)
def dq_drift_emd_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two numeric
    distributions — even-keyed vs odd-keyed orders' total price — the
    NUMERIC drift measure that complements the categorical pair
    (events_psi_category_drift / events_jsd_drift): PSI and JSD need
    binning and go blind to WITHIN-bin shift; EMD is the integral of
    |CDF_A - CDF_B| and sees every cent of displacement, in the
    metric's own units (cents of price moved per unit mass).

    Exactness: over the value-aggregated domain, EMD = sum_v
    |cumA(v)*nB - cumB(v)*nA| * gap(v) / (nA*nB) — an integer rational
    (HUGEINT / DECIMAL(38,0) numerator, one VARCHAR-hopped double
    divide at the end).  No binning, no float accumulation.

    Scale shape: ONE fold to the value domain (cents -> conditional
    counts, map-side partial), then the two-pass global-index
    machinery (operators/global_index.py) for the ordered cumulative
    — both side's running counts ride a SINGLE weighted cum by packing
    (cntA, cntB) into one weight word (w = cntA * 2^31 + cntB; exact
    while each side stays below 2^31 rows — document/repack at
    larger scale), quantile-bucketed because price is heavy-tailed
    user data (the skew-source rule).  The neighbor gap is a
    within-bucket lead() on the index machinery's own window plus a
    bounded (<= n_buckets rows) next-bucket-first fix-up — no
    data-sized self-join (r15).  The final fold is 1 row."""
    from pyspark.sql import Window as W

    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    d38 = "decimal(38,0)"
    o = load_table(spark, sf_dir, "orders")
    v = (
        o.select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (F.col("o_orderkey") % 2).alias("side"),
        )
        .groupBy("cents")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("cb"),
        )
        .withColumn("w", F.col("ca") * EMD_PACK + F.col("cb"))
    )
    # r15 (VERDICT r14 "Next" #5): the neighbor gap (next distinct
    # cents) no longer self-joins the index relation on _gidx — that
    # join's probe side was the full value-domain relation, re-keyed by
    # an index that exists only for this lookup (AQE broadcasts it at
    # fixture scale; at 100 TB it degrades to a double-exchange
    # sort-merge join of a data-sized relation).  Instead:
    #   - WITHIN a bucket, lead(cents) rides the exact (partition _gb,
    #     order cents) window the index machinery already established —
    #     CollapseWindow folds it into the same WindowExec, zero new
    #     exchanges (guide §2.4 "window keyed like the previous op");
    #   - ACROSS buckets (the <= n_buckets last-rows whose lead is
    #     null), the next value is the first cents of the next
    #     non-empty bucket: a <= 64-row per-bucket MIN + a <= 64-row
    #     lead + one bounded broadcast join back on _gb.  Monotone
    #     bucketing guarantees every value of bucket g+1 exceeds every
    #     value of bucket g, so this IS the global neighbor.
    # Interleaved A/B medians: 1.83 -> 1.80 s sf0.1, 2.27 -> 2.16 s
    # sf1 (flat at fixture scale — the win is the removed data-sized
    # join at scale); hash-identical both SFs.
    raw = with_global_index(
        v, "cents", [], weight_col="w", bucketer="quantile", bucket_col="_gb"
    ).withColumn(
        "nxt_in", F.lead("cents").over(W.partitionBy("_gb").orderBy("cents"))
    )
    # still checkpointed once: the bounded bucket-firsts fold below is a
    # second consumer, and without the checkpoint Catalyst re-derives
    # the whole two-pass machinery per reference (the triangle-count
    # 109-exchange lesson)
    idx = raw.localCheckpoint(eager=False)
    firsts = idx.groupBy("_gb").agg(F.min("cents").alias("_bf"))
    nxtb = firsts.select(
        "_gb", F.lead("_bf").over(W.orderBy("_gb")).alias("_nxt_bf")
    )
    terms = (
        idx.join(F.broadcast(nxtb), "_gb", "left")
        .select(
            "cents",
            F.expr(f"_gcum div {EMD_PACK}").alias("cuma"),
            F.expr(f"_gcum % {EMD_PACK}").alias("cumb"),
            F.expr(f"_gwtot div {EMD_PACK}").alias("na"),
            F.expr(f"_gwtot % {EMD_PACK}").alias("nb"),
            F.coalesce("nxt_in", "_nxt_bf").alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .select(
            "na",
            "nb",
            (
                F.abs(
                    F.col("cuma").cast(d38) * F.col("nb")
                    - F.col("cumb").cast(d38) * F.col("na")
                )
                * (F.col("nxt") - F.col("cents"))
            )
            .cast(d38)
            .alias("term"),
        )
    )
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    return (
        terms.groupBy("na", "nb")
        .agg(F.sum("term").cast(d38).alias("emd_num"))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            (
                dbl(F.col("emd_num"))
                / dbl((F.col("na").cast(d38) * F.col("nb")).cast(d38))
            ).alias("emd_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Cramér's V association matrix (round 12)
# ---------------------------------------------------------------------------

def _cramers_pair_sql(idx: int, table: str, rcol: str, ccol: str) -> str:
    """One pair's chi-square CTE chain, suffixed with ``idx`` so two
    pairs share a single flat WITH (DuckDB 1.0 miscompiles parenthesized
    WITH subqueries under UNION ALL — "query node type mismatch" — so
    the composition must stay one statement-level WITH).  chi2 folds
    the per-cell contributions LEFT-TO-RIGHT in (rl, cl) order via
    list_reduce — the exact same sequential fold as the Spark side's
    aggregate() over an array_sort'ed collect_list, so the otherwise
    order-dependent double sum is bit-identical."""
    return f"""
    cells{idx} AS MATERIALIZED (
      SELECT {rcol} AS rl, {ccol} AS cl, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM {table} GROUP BY 1, 2
    ),
    r{idx} AS (SELECT rl, CAST(SUM(n_obs) AS BIGINT) AS n_row FROM cells{idx} GROUP BY 1),
    c{idx} AS (SELECT cl, CAST(SUM(n_obs) AS BIGINT) AS n_col FROM cells{idx} GROUP BY 1),
    t{idx} AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_tot FROM cells{idx}),
    e{idx} AS (
      SELECT rl, cl, COALESCE(n_obs, 0) AS n_obs, n_row, n_col, n_tot,
             CAST(CAST(CAST(n_row AS DECIMAL(38,0)) * n_col AS VARCHAR) AS DOUBLE)
               / n_tot AS expected
      FROM r{idx} CROSS JOIN c{idx}
      LEFT JOIN cells{idx} USING (rl, cl)
      CROSS JOIN t{idx}
    ),
    s{idx} AS (
      SELECT MAX(n_tot) AS n,
             CAST(COUNT(DISTINCT rl) AS BIGINT) AS nr,
             CAST(COUNT(DISTINCT cl) AS BIGINT) AS nc,
             list_reduce(
               list((CAST(n_obs AS DOUBLE) - expected)
                    * (CAST(n_obs AS DOUBLE) - expected) / expected
                    ORDER BY rl, cl),
               (acc, v) -> acc + v) AS chi2
      FROM e{idx}
    )"""


def _cramers_select(idx: int, pair: str) -> str:
    return f"""
    SELECT '{pair}' AS pair, n, nr AS r_levels, nc AS c_levels, chi2,
           sqrt(chi2 / (n * (least(nr, nc) - 1))) AS cramers_v
    FROM s{idx}"""


@query(
    "dq_association_cramers_v",
    oracle=(
        "WITH "
        + _cramers_pair_sql(1, "orders", "o_orderpriority", "o_orderstatus")
        + ", "
        + _cramers_pair_sql(2, "lineitem", "l_returnflag", "l_linestatus")
        + _cramers_select(1, "orders:priority~status")
        + " UNION ALL "
        + _cramers_select(2, "lineitem:returnflag~linestatus")
        + " ORDER BY pair"
    ),
    tags=("dq", "agg", "stats"),
)
def dq_association_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association strength between categorical column pairs
    — the DQ profiler's answer to "are these two dimensions redundant?"
    (V≈0 independent, V≈1 one determines the other).  V = sqrt(chi2 /
    (n·(min(r,c)−1))) over the zero-filled contingency grid; extends
    agg_chi_square_independence (which deliberately leaves the per-cell
    contributions unsummed) with a portable SUMMED statistic.

    Determinism of the chi2 sum: summing IEEE doubles in engine order
    is non-portable, so both engines fold the per-cell contributions
    sequentially in canonical (rl, cl) order — Spark aggregate() over
    an array_sort'ed collect_list (bounded: the grid is ≤ r·c ≤ 15
    cells), DuckDB list_reduce over list(... ORDER BY rl, cl); a left
    fold from 0.0 and a first-element fold agree exactly because
    0.0 + x == x in IEEE.  Counts, margins and expected follow the
    chi-square query's conventions (DECIMAL(38,0) margin product, one
    correctly-rounded double crossing).

    Scale shape (per pair): one map-side-partial groupBy on the two
    bounded-domain columns, then margins/grid/fold over ≤15-row
    relations — the grid join sides are checkpointed bounded
    aggregates, declared in QUERY_BOUNDED_DOMAIN_COLS."""
    d38 = "decimal(38,0)"

    def pair(table: str, rcol: str, ccol: str, name: str) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        cells = (
            df.groupBy(F.col(rcol).alias("rl"), F.col(ccol).alias("cl"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
            .localCheckpoint(eager=False)
        )
        r = cells.groupBy("rl").agg(F.sum("n_obs").cast("long").alias("n_row"))
        c = cells.groupBy("cl").agg(F.sum("n_obs").cast("long").alias("n_col"))
        t = cells.agg(F.sum("n_obs").cast("long").alias("n_tot"))
        expected = (
            (F.col("n_row").cast(d38) * F.col("n_col")).cast(d38)
            .cast("string")
            .cast("double")
            / F.col("n_tot")
        )
        diff = F.col("n_obs").cast("double") - F.col("expected")
        e = (
            r.crossJoin(F.broadcast(c))
            .join(F.broadcast(cells), ["rl", "cl"], "left")
            .crossJoin(F.broadcast(t))
            .select(
                "rl",
                "cl",
                F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
                "n_tot",
                expected.alias("expected"),
            )
            .select("rl", "cl", "n_tot", (diff * diff / F.col("expected")).alias("contrib"))
        )
        s = e.agg(
            F.max("n_tot").alias("n"),
            F.countDistinct("rl").cast("long").alias("r_levels"),
            F.countDistinct("cl").cast("long").alias("c_levels"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("rl", "cl", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("chi2"),
        )
        return s.select(
            F.lit(name).alias("pair"),
            "n",
            "r_levels",
            "c_levels",
            "chi2",
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least("r_levels", "c_levels") - F.lit(1)))
            ).alias("cramers_v"),
        )

    return (
        pair("orders", "o_orderpriority", "o_orderstatus", "orders:priority~status")
        .unionByName(
            pair("lineitem", "l_returnflag", "l_linestatus",
                 "lineitem:returnflag~linestatus")
        )
        .orderBy("pair")
    )


# ---------------------------------------------------------------------------
# Mahalanobis outlier screen (round 12)
# ---------------------------------------------------------------------------

MAHAL_TOP = 20


@query(
    "dq_outliers_mahalanobis",
    oracle=f"""
    WITH b AS (
      SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS q,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS p
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq,
             CAST(SUM(CAST(p AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp,
             CAST(SUM(CAST(q AS DECIMAL(38,0)) * q) AS DECIMAL(38,0)) AS sqq,
             CAST(SUM(CAST(p AS DECIMAL(38,0)) * p) AS DECIMAL(38,0)) AS spp,
             CAST(SUM(CAST(q AS DECIMAL(38,0)) * p) AS DECIMAL(38,0)) AS sqp
      FROM b
    ),
    m AS (
      SELECT n,
             CAST(CAST(sq AS VARCHAR) AS DOUBLE) / n AS mq,
             CAST(CAST(sp AS VARCHAR) AS DOUBLE) / n AS mp,
             CAST(CAST(sqq AS VARCHAR) AS DOUBLE) / n
               - (CAST(CAST(sq AS VARCHAR) AS DOUBLE) / n)
                 * (CAST(CAST(sq AS VARCHAR) AS DOUBLE) / n) AS cxx,
             CAST(CAST(spp AS VARCHAR) AS DOUBLE) / n
               - (CAST(CAST(sp AS VARCHAR) AS DOUBLE) / n)
                 * (CAST(CAST(sp AS VARCHAR) AS DOUBLE) / n) AS cyy,
             CAST(CAST(sqp AS VARCHAR) AS DOUBLE) / n
               - (CAST(CAST(sq AS VARCHAR) AS DOUBLE) / n)
                 * (CAST(CAST(sp AS VARCHAR) AS DOUBLE) / n) AS cxy
      FROM s
    )
    SELECT q AS quantity, p AS price_cents,
           ((q - mq) * (q - mq) * cyy
            - 2 * (q - mq) * (p - mp) * cxy
            + (p - mp) * (p - mp) * cxx)
           / (cxx * cyy - cxy * cxy) AS mahal_sq
    FROM b CROSS JOIN m
    ORDER BY mahal_sq DESC, price_cents, quantity
    LIMIT {MAHAL_TOP}
    """,
    tags=("dq", "agg", "stats"),
)
def dq_outliers_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Mahalanobis outlier screen over (quantity, price): the
    DQ reviewer's "which rows are jointly implausible" list — a row can
    be unremarkable on each axis yet far outside the correlation
    ellipse (cheap huge order / pricey tiny one), which per-column
    fences (dq_anomaly_mad) cannot see.  d² = Δᵀ Σ⁻¹ Δ with the 2x2
    inverse in closed form.

    Determinism: the five moments are exact DECIMAL(38,0) sums crossing
    to double once; means/covariances/d² are then one shared IEEE tree,
    so per-row d² is bit-identical cross-engine.  The top-{MAHAL_TOP}
    boundary is safe without a unique tiebreak because the OUTPUT is
    (quantity, price_cents, d²) — rows tied at the boundary are
    value-identical triples, so any choice among them hashes the same.

    Scale shape: one moment fold (map-side partial, O(d²) doubles per
    partition), the 1-row model broadcast back, one row-local scoring
    pass, TakeOrdered for the top-k — no global sort, no second
    data-sized shuffle."""
    d38 = "decimal(38,0)"
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.floor(F.col("l_quantity")).cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("p"),
    )
    s = b.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("q").cast(d38)).cast(d38).alias("sq"),
        F.sum(F.col("p").cast(d38)).cast(d38).alias("sp"),
        F.sum(F.col("q").cast(d38) * F.col("q")).cast(d38).alias("sqq"),
        F.sum(F.col("p").cast(d38) * F.col("p")).cast(d38).alias("spp"),
        F.sum(F.col("q").cast(d38) * F.col("p")).cast(d38).alias("sqp"),
    )
    m = s.select(
        "n",
        (dbl(F.col("sq")) / F.col("n")).alias("mq"),
        (dbl(F.col("sp")) / F.col("n")).alias("mp"),
        (
            dbl(F.col("sqq")) / F.col("n")
            - (dbl(F.col("sq")) / F.col("n")) * (dbl(F.col("sq")) / F.col("n"))
        ).alias("cxx"),
        (
            dbl(F.col("spp")) / F.col("n")
            - (dbl(F.col("sp")) / F.col("n")) * (dbl(F.col("sp")) / F.col("n"))
        ).alias("cyy"),
        (
            dbl(F.col("sqp")) / F.col("n")
            - (dbl(F.col("sq")) / F.col("n")) * (dbl(F.col("sp")) / F.col("n"))
        ).alias("cxy"),
    )
    dx = F.col("q") - F.col("mq")
    dy = F.col("p") - F.col("mp")
    md2 = (
        dx * dx * F.col("cyy") - 2 * dx * dy * F.col("cxy") + dy * dy * F.col("cxx")
    ) / (F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy"))
    return (
        b.crossJoin(F.broadcast(m))
        .select(
            F.col("q").alias("quantity"),
            F.col("p").alias("price_cents"),
            md2.alias("mahal_sq"),
        )
        .orderBy(F.col("mahal_sq").desc(), "price_cents", "quantity")
        .limit(MAHAL_TOP)
    )


# --- probability-calibration reliability bins (round 13) --------------------

ECE_BINS = 10


@query(
    "dq_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT LEAST(1000000, GREATEST(0,
               CAST(floor(5000000.0 * length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                          / length(text)) AS BIGINT) - 1000000)) AS conf_ppm,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
      FROM documents WHERE length(text) > 0
    ),
    binned AS (
      SELECT LEAST(CAST(conf_ppm * {ECE_BINS} // 1000000 AS BIGINT), {ECE_BINS - 1}) AS bin,
             conf_ppm, label
      FROM scored
    ),
    tot AS (SELECT COUNT(*) AS n FROM binned)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(conf_ppm) // COUNT(*) AS BIGINT) AS mean_conf_ppm,
           CAST(SUM(label) * 1000000 // COUNT(*) AS BIGINT) AS acc_ppm,
           CAST(abs(SUM(label) * 1000000 - SUM(conf_ppm)) // COUNT(*) AS BIGINT) AS gap_ppm,
           CAST(abs(SUM(label) * 1000000 - SUM(conf_ppm)) // MAX(tot.n) AS BIGINT)
             AS ece_contrib_ppm
    FROM binned CROSS JOIN tot
    GROUP BY bin
    """,
    tags=("dq", "validation", "agg", "eval"),
)
def dq_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins + expected-calibration-error
    contributions for a score/label pair — the standard audit of any
    quality/langid classifier feeding a curation gate (Guo et al. 2017):
    a well-calibrated score's bin accuracy tracks its bin confidence.

    Score here is an in-plan vowel-density pseudo-confidence — the
    [0.2, 0.4] vowel-fraction band stretched to [0, 1e6] ppm (one
    double division then integer clamps, so the quantization is
    bit-exact cross-engine); label is lang == 'en'.  The signal is
    DELIBERATELY weak — the point of the op is to quantify exactly how
    miscalibrated a score is, and a flat/uninformative score shows up
    as bins whose accuracy is the base rate while confidence varies.
    Equal-width bins on the score; per bin: count, mean confidence,
    accuracy, |acc − conf| gap, and the n_b/N-weighted ECE contribution
    (sum over bins = ECE).  All integer ppm via floor division —
    bit-exact oracle; the |sum_label·1e6 − sum_conf| form avoids ever
    materializing a per-bin float mean.

    Scale shape: one scan, one {ECE_BINS}-ary map-side-partial groupBy;
    the corpus total rides along as a broadcast 1-row fold.  No window,
    no per-row Python."""
    d = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    conf = F.least(
        F.lit(1_000_000).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(
                F.lit(5_000_000.0)
                * F.length(F.regexp_replace(F.lower("text"), "[^aeiou]", ""))
                / F.length("text")
            ).cast("long")
            - 1_000_000,
        ),
    )
    scored = d.select(
        conf.alias("conf_ppm"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    binned = scored.select(
        F.least(
            F.expr(f"conf_ppm * {ECE_BINS} div 1000000"), F.lit(ECE_BINS - 1).cast("long")
        ).alias("bin"),
        "conf_ppm",
        "label",
    )
    tot = binned.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        binned.crossJoin(F.broadcast(tot))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("sum(conf_ppm) div count(1)").cast("long").alias("mean_conf_ppm"),
            F.expr("sum(label) * 1000000 div count(1)").cast("long").alias("acc_ppm"),
            F.expr("abs(sum(label) * 1000000 - sum(conf_ppm)) div count(1)")
            .cast("long")
            .alias("gap_ppm"),
            F.expr("abs(sum(label) * 1000000 - sum(conf_ppm)) div max(n_total)")
            .cast("long")
            .alias("ece_contrib_ppm"),
        )
    )
