"""Product/event analytics over the events table: retention cohorts and
conversion funnels — the classic clickstream aggregations a warehouse
engine is asked for daily (no reference counterpart; Part B extension
alongside the windowed event queries in operators/windows.py).

Scale shape: both queries reduce events to a per-user relation first
(one shuffle keyed by user_id), then join events back on the SAME key —
on a cluster the two stages share partitioning, and the per-user
relation (distinct users, not events) is orders of magnitude smaller
than the event log.  Dates are emitted as 'yyyy-MM-dd' strings (the
harness convention: no date-typed output columns).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from oracle_parquet_dumper_spark.plans.registry import query
from oracle_parquet_dumper_spark.sources.tables import load_table

RETENTION_MAX_OFFSET = 7
FUNNEL_WINDOW_DAYS = 7


@query(
    "events_retention_cohorts",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    )
    SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_date,
           date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
          BETWEEN 0 AND {RETENTION_MAX_OFFSET}
    GROUP BY 1, 2
    """,
    tags=("agg", "events", "window"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, then
    distinct active users per (cohort, day-offset) for the first
    {RETENTION_MAX_OFFSET} offsets."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    j = ev.join(firsts, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day")
    )
    return (
        j.where(F.col("day_offset").between(0, RETENTION_MAX_OFFSET))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_date"),
            F.col("day_offset").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "events_funnel_signup_purchase",
    oracle=f"""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id
      FROM s JOIN events e
        ON e.user_id = s.user_id
       AND e.event_type = 'purchase'
       AND e.ts >= s.s_ts
       AND e.ts < s.s_ts + INTERVAL {FUNNEL_WINDOW_DAYS} DAY
      GROUP BY s.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup_users,
           (SELECT COUNT(*) FROM conv) AS n_converted,
           round(CAST((SELECT COUNT(*) FROM conv) AS DOUBLE) /
                 (SELECT COUNT(*) FROM s), 6) AS conversion_rate
    """,
    tags=("agg", "events", "join"),
)
def events_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: users whose first signup is followed by a
    purchase within {FUNNEL_WINDOW_DAYS} days.  The conversion join is
    keyed by user_id (same shuffle key as the signup reduction) with the
    time window as a residual predicate — the standard funnel shape that
    avoids any per-user sort."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(
            (F.col("ts") >= F.col("s_ts"))
            & (F.col("ts") < F.col("s_ts") + F.expr(f"INTERVAL {FUNNEL_WINDOW_DAYS} DAYS"))
        )
        .select("user_id")
        .distinct()
    )
    n_s = s.agg(F.count(F.lit(1)).alias("n_signup_users"))
    n_c = conv.agg(F.count(F.lit(1)).alias("n_converted"))
    return (
        n_s.crossJoin(n_c)
        .select(
            "n_signup_users",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double") / F.col("n_signup_users"), 6
            ).alias("conversion_rate"),
        )
    )


# Gap-fill keeps a deterministic 1-in-N user slice so the output stays
# ~(users/N) x hours at every SF (sf1 sweep collects results; unbounded
# spines are the class of blow-up the sweep caught in round 4).
GAPFILL_USER_MOD = 10
GAPFILL_USER_REM = 3


@query(
    "ts_gapfill_interpolate",
    oracle=f"""
    WITH present AS (
      SELECT user_id, date_trunc('hour', ts) AS h, MAX(value) AS v
      FROM events WHERE user_id % {GAPFILL_USER_MOD} = {GAPFILL_USER_REM}
      GROUP BY 1, 2
    ),
    bounds AS (SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM present GROUP BY 1),
    spine AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    g AS (
      SELECT s.user_id, s.h, p.v, row_number() OVER w AS idx
      FROM spine s LEFT JOIN present p USING (user_id, h)
      WINDOW w AS (PARTITION BY s.user_id ORDER BY s.h)
    ),
    f AS (
      SELECT user_id, h, v, idx,
        last_value(v IGNORE NULLS) OVER wp AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wp AS pi,
        first_value(v IGNORE NULLS) OVER wn AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER wn AS ni
      FROM g
      WINDOW wp AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(h, '%Y-%m-%d %H:00') AS hour,
      CASE WHEN v IS NOT NULL THEN v
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE pv + (nv - pv) * (CAST(idx - pi AS DOUBLE) / CAST(ni - pi AS DOUBLE))
      END AS v_filled,
      CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END AS was_present
    FROM f
    """,
    tags=("window", "events", "timeseries"),
    bench=True,
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with linear interpolation: per-user hourly
    buckets between each user's first and last active hour; missing
    hours are generated with ``sequence``+``explode`` (no driver loop)
    and filled by interpolating between the nearest present neighbours
    (ignore-nulls ``last``/``first`` window frames), falling back to
    nearest-value extrapolation at the edges.

    Scale shape (round-6 rewrite): the event log is reduced map-side
    FIRST — the partial (user_id, hour) max combines before anything
    shuffles — and then gap rows are generated DIRECTLY from
    consecutive-present pairs: one lead() window over the (small)
    present relation hands every pair (h_i, v_i) -> (h_{i+1}, v_{i+1})
    its own gap, which a map-side sequence+explode expands into the
    missing hours with the interpolation inputs already in-row.  That
    replaces the previous spine-join formulation's THREE extra passes
    over the full spine (left join, row_number, and the
    forward+backward ignore-nulls frames) with one window over present
    rows only — the spine (which a sparse series makes arbitrarily
    larger than present) is never shuffled, joined, or sorted, only
    emitted.  Because each user's spine spans first..last present hour,
    the pair walk covers every spine row exactly once (k=0 is the
    present row itself; the per-user last row emits just itself), so
    the oracle — still the declarative two-frame window spec — is
    unchanged, and k/n here equal (idx-pi)/(ni-pi) there, keeping the
    interpolation doubles bit-identical.
    The hour bucket value is MAX(value) (order-independent, bit-exact
    cross-engine).  No reference counterpart (the reference exports
    tables as-is, main.py:144-146); Part B timeseries extension."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % GAPFILL_USER_MOD == GAPFILL_USER_REM
    )
    present = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max("value").alias("v"))
    wl = W.partitionBy("user_id").orderBy("h")
    pairs = present.select(
        "user_id",
        "h",
        "v",
        F.lead("h").over(wl).alias("nh"),
        F.lead("v").over(wl).alias("nv"),
    ).withColumn(
        # gap length in hour steps to the next present hour (>= 1);
        # NULL on each user's last present row -> emit only itself
        "n",
        ((F.unix_timestamp("nh") - F.unix_timestamp("h")) / 3600).cast("long"),
    )
    rows = pairs.select(
        "user_id",
        "h",
        "v",
        "nv",
        "n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.coalesce(F.col("n") - 1, F.lit(0)))
        ).alias("k"),
    )
    interp = F.col("v") + (F.col("nv") - F.col("v")) * (
        F.col("k").cast("double") / F.col("n").cast("double")
    )
    return rows.select(
        "user_id",
        F.date_format(
            F.col("h")
            + F.expr("make_interval(0, 0, 0, 0, CAST(k AS INT), 0, 0)"),
            "yyyy-MM-dd HH:00",
        ).alias("hour"),
        F.when(F.col("k") == 0, F.col("v")).otherwise(interp).alias("v_filled"),
        F.when(F.col("k") == 0, F.lit(1)).otherwise(F.lit(0)).alias("was_present"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(date_diff('microsecond', date_trunc('hour', ts), ts) AS DECIMAL(10,0))
               * CAST('10000000000000000000' AS DECIMAL(20,0))
               + CAST(event_id AS DECIMAL(19,0)) AS ord,
             value
      FROM events
    )
    SELECT user_id, strftime(h, '%Y-%m-%d %H:00') AS hour,
           arg_min(value, ord) AS open_v, MAX(value) AS high_v,
           MIN(value) AS low_v, arg_max(value, ord) AS close_v,
           COUNT(*) AS n_events
    FROM b GROUP BY user_id, h
    """,
    tags=("agg", "events", "timeseries"),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsample per user: open/close via min_by/max_by on
    a within-bucket ordering key, high/low via plain min/max — the
    standard market-data/metrics resample as ONE partial-aggregated
    groupBy (no window, no sort; every aggregate combines map-side).

    The ordering key folds the within-hour microsecond offset and the
    unique event_id into one exact DECIMAL(32,0):
    offset_us * 10^19 + event_id.  A BIGINT key (offset_us * 1e9 +
    event_id) only stays timestamp-major while event_id < 1e9 — at
    billions of events a later event with a small id would outrank an
    earlier one, and because both engines would compute the same wrong
    key the differential oracle could never catch it.  10^19 exceeds
    the bigint max (9.22e18), so timestamp-major ordering holds for ANY
    bigint event_id; widths stay exact (offset_us < 3.6e9 fits
    DECIMAL(10,0); (10,0)x(20,0) -> (31,0), +(19,0) -> (32,0), all
    below the 38-digit clamp in both engines).  argmin/argmax
    tie-breaking on equal timestamps is engine-defined — same
    determinism rule as agg_max_min_by.  Output rows are bounded by
    distinct (user, hour) buckets, not events.  No reference
    counterpart; Part B timeseries extension alongside
    ts_gapfill_interpolate."""
    ev = load_table(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts"))
    ord_key = (
        F.timestamp_diff("MICROSECOND", h, F.col("ts")).cast("decimal(10,0)")
        * F.lit("10000000000000000000").cast("decimal(20,0)")
        + F.col("event_id").cast("decimal(19,0)")
    )
    b = ev.select(
        "user_id", h.alias("h"), ord_key.alias("ord"), "value"
    )
    return b.groupBy("user_id", "h").agg(
        F.min_by("value", F.col("ord")).alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max_by("value", F.col("ord")).alias("close_v"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        "open_v", "high_v", "low_v", "close_v", "n_events",
    )


FUNNEL3_WINDOW_HOURS = 24


@query(
    "events_window_funnel_3step",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.t1
        AND e.ts < v.t1 + INTERVAL {FUNNEL3_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN c ON e.user_id = c.user_id
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
        AND e.ts < v.t1 + INTERVAL {FUNNEL3_WINDOW_HOURS} HOUR
      GROUP BY e.user_id
    ),
    s AS (
      SELECT v.user_id,
             1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
               + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS steps
      FROM v
      LEFT JOIN c ON v.user_id = c.user_id
      LEFT JOIN p ON v.user_id = p.user_id
    )
    SELECT steps, COUNT(*) AS n_users FROM s GROUP BY steps
    """,
    tags=("agg", "events", "join"),
)
def events_window_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-step window funnel (the ClickHouse ``windowFunnel`` shape):
    view -> click -> purchase must occur in strict chronological order,
    all within {FUNNEL3_WINDOW_HOURS}h of the user's FIRST view (the
    deterministic anchor — greedy earliest-next-step chaining).  Output
    is the per-step user histogram.

    Scale shape: every stage is a per-user MIN aggregate or a join on
    user_id — one shuffle key end to end, each stage's relation is
    distinct-users-sized, and the time window is a residual predicate
    (no per-user sort, no window function over raw events)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr(f"INTERVAL {FUNNEL3_WINDOW_HOURS} HOURS")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("t1")) & (F.col("ts") < F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .join(v, "user_id")
        .where((F.col("ts") >= F.col("t2")) & (F.col("ts") < F.col("t1") + win))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    steps = (
        F.lit(1)
        + F.when(F.col("t2").isNotNull(), 1).otherwise(0)
        + F.when(F.col("t3").isNotNull(), 1).otherwise(0)
    )
    s = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(steps.alias("steps"))
    )
    return s.groupBy("steps").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "events_rfm_segments",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MAX(CAST(ts AS DATE)) AS last_day,
             COUNT(*) AS freq,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM events GROUP BY user_id
    ),
    anchor AS (SELECT MAX(last_day) AS max_day FROM per_user),
    scored AS (
      SELECT user_id,
             date_diff('day', last_day, max_day) AS recency_days,
             freq, monetary_cents
      FROM per_user CROSS JOIN anchor
    ),
    tiled AS (
      SELECT user_id,
             ntile(4) OVER (ORDER BY recency_days, user_id) AS r_q,
             ntile(4) OVER (ORDER BY freq DESC, user_id) AS f_q,
             ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS m_q
      FROM scored
    )
    SELECT r_q, f_q, m_q, COUNT(*) AS n_users
    FROM tiled GROUP BY r_q, f_q, m_q
    """,
    tags=("agg", "events", "window", "skew-source"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user Recency (days since last event,
    anchored at the corpus max day — an in-plan broadcast 1-row
    aggregate, no wall clock), Frequency, and Monetary value (integer
    cents — exact), each quartiled with ntile(4) and rolled up into the
    at-most-64 segment histogram.

    Determinism: ntile ties break on user_id in both engines; monetary
    integerizes via FLOOR before summing.  Scale shape: the event log
    reduces to one row per user in a single partial-aggregated shuffle.
    The oracle states the quartiles as three unpartitioned ntile windows
    — the shape that must NOT run at 100 TB (O(users) rows through a
    single WindowExec task, three times).  The Spark plan instead MELTS
    the per-user relation to (user, metric, order_value) — DESC metrics
    negate — and computes ONE metric-partitioned distributed row index
    (two-pass bucket-offset pattern, operators/global_index.py), so all
    three quartiles come out of one partitioned pass; the standard NTILE
    integer formula then reproduces the oracle's tiles exactly, and a
    per-user pivot reassembles (r_q, f_q, m_q).

    The index pass uses the QUANTILE bucketer (round-6 verdict #3):
    monetary is heavy-tailed user data, and equi-width min/max bounds
    concentrate most users into a few low buckets — a partial straggler
    at extreme scale.  Approx-percentile boundaries keep per-bucket
    occupancy even; the index (and hence the oracle hash) is unchanged
    because any monotone bucketer yields the same exact index."""
    ev = load_table(spark, sf_dir, "events")
    from oracle_parquet_dumper_spark.operators.global_index import (
        ntile_expr,
        with_global_index,
    )

    from oracle_parquet_dumper_spark.operators.dedup import truncate_lineage

    # per_user feeds the anchor aggregate AND (via the melt) both arms
    # of the global-index pass — four consumers in one plan; Catalyst
    # re-derives a shared subtree PER REFERENCE, so materialize the
    # per-user reduction (distinct users, not events) once.
    per_user = truncate_lineage(
        ev.groupBy("user_id").agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("monetary_cents"),
        )
    )
    anchor = per_user.agg(F.max("last_day").alias("max_day"))
    scored = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.datediff("max_day", "last_day").alias("recency_days"),
        "freq",
        "monetary_cents",
    )
    melted = scored.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_days").cast("long").alias("v"),
                ),
                F.struct(F.lit("f").alias("metric"), (-F.col("freq")).alias("v")),
                F.struct(
                    F.lit("m").alias("metric"), (-F.col("monetary_cents")).alias("v")
                ),
            )
        ).alias("mv"),
    ).select("user_id", "mv.metric", "mv.v")
    idx = with_global_index(
        melted, "v", ["user_id"], group_cols=["metric"], bucketer="quantile"
    )
    tiles = idx.select(
        "user_id", "metric", ntile_expr(F.col("_gidx"), F.col("_gn"), 4).alias("tile")
    )
    per_user_tiles = tiles.groupBy("user_id").agg(
        F.max(F.when(F.col("metric") == "r", F.col("tile"))).alias("r_q"),
        F.max(F.when(F.col("metric") == "f", F.col("tile"))).alias("f_q"),
        F.max(F.when(F.col("metric") == "m", F.col("tile"))).alias("m_q"),
    )
    return per_user_tiles.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# ---------------------------------------------------------------------------
# Round-5 additions: attribution, path mining, rolling anomaly screen
# ---------------------------------------------------------------------------

ATTR_TOUCH_TYPES = ("click", "view")
ZSCORE_WIN = 20  # rolling lookback rows (exclusive of current)
ZSCORE_MIN_N = 12  # don't score until the window has this many samples


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM events
    )
    SELECT COALESCE(touch, 'direct') AS touch_type,
           COUNT(*) AS n_purchases,
           CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) AS VARCHAR(64)) AS DOUBLE) AS revenue
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    tags=("window", "events", "agg"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to
    the most recent PRIOR touch event ({ATTR_TOUCH_TYPES}) of the same
    user, 'direct' when none exists; revenue per touch channel.

    The conditional carry-forward (last(when(...), ignorenulls) over an
    unbounded-preceding row frame) is the same single-pass pattern as
    the as-of join (operators/relational.py): one shuffle keyed by
    user_id, no self-join against the touch subset, state per row is
    one string.  At 100 TB this is a sort within user partitions —
    attribution over a year of clickstream stays one exchange."""
    from pyspark.sql import Window as W

    from oracle_parquet_dumper_spark.plans.registry import dec_sum

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*ATTR_TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch"))
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dec_sum("value").alias("revenue"),
        )
    )


@query(
    "events_path_trigrams",
    oracle="""
    SELECT path, COUNT(*) AS n
    FROM (
      SELECT event_type || '>' ||
             LEAD(event_type, 1) OVER w || '>' ||
             LEAD(event_type, 2) OVER w AS path
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE path IS NOT NULL
    GROUP BY path
    """,
    tags=("window", "events", "sequence"),
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral path mining: counts of every 3-step event-type path
    (order-2 Markov context — the step past window_event_transitions'
    order-1 matrix).  One window shuffle keyed by user_id builds the
    trigram per row via two leads; the follow-up count sees at most
    |types|^3 groups after map-side combine, so the second exchange is
    O(K^3) regardless of event volume."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    path = F.concat_ws(
        ">",
        F.col("event_type"),
        F.lead("event_type", 1).over(w),
        F.lead("event_type", 2).over(w),
    )
    # concat_ws skips NULLs (unlike ||), so require the 3rd step instead
    return (
        ev.select(
            path.alias("path"), F.lead("event_type", 2).over(w).alias("third")
        )
        .where(F.col("third").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "ts_anomaly_rolling_zscore",
    oracle=f"""
    WITH cents AS (
      SELECT user_id, event_id, ts, value,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    stats AS (
      SELECT user_id, event_id, value, v,
             COUNT(*) OVER w AS n,
             SUM(CAST(v AS HUGEINT)) OVER w AS s,
             SUM(CAST(v AS HUGEINT) * v) OVER w AS ssq
      FROM cents
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ZSCORE_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, value, n AS n_win,
           CAST((1000 * (n - 1) * (n * CAST(v AS HUGEINT) - s) * (n * CAST(v AS HUGEINT) - s))
             // nullif(n * (n * ssq - s * s), 0) AS BIGINT) AS z2_milli
    FROM stats
    WHERE n >= {ZSCORE_MIN_N}
      AND (n - 1) * (n * CAST(v AS HUGEINT) - s) * (n * CAST(v AS HUGEINT) - s)
            > 9 * n * (n * ssq - s * s)
    """,
    tags=("window", "timeseries", "dq"),
)
def ts_anomaly_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly screen: flag events whose value deviates
    from the trailing-{ZSCORE_WIN}-event mean by more than 3 rolling
    standard deviations (the per-key streaming cousin of the global MAD
    screen, dq_anomaly_mad).

    All-integer formulation: values become cents, and |v - mean| >
    3*std is cross-multiplied into (n-1)(nv-s)^2 > 9n(n*ssq - s^2).
    The quadratic terms are computed in 128-bit integers — DECIMAL(38,0)
    on Spark, HUGEINT on DuckDB — because the z2_milli numerator
    1000(n-1)(nv-s)^2 reaches ~3.5e7 * v_cents^2 at a 20-row window and
    would overflow BIGINT for values around $10k vs a calm window (under
    ANSI mode a hard failure, not silent corruption); in 128-bit the
    formulation is exact for |value| up to ~1.7e15 cents ($17 trillion),
    i.e. any real monetary input.  The oracle comparison has NO floating
    point anywhere and z^2 is emitted as an exact integer-divided
    milli-unit (both engines truncate positive quotients identically;
    the streaming twin's Python ints are arbitrary-precision already).
    One window shuffle keyed by user_id with a bounded 20-row frame:
    O(1) state per row at any scale, the same shape Structured Streaming
    would run with a transformWithState 20-row ring buffer."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    d38 = "decimal(38,0)"
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZSCORE_WIN, -1)
    )
    stats = ev.select(
        "user_id",
        "event_id",
        "value",
        v.alias("v"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(v.cast(d38)).over(w).alias("s"),
        F.sum((v.cast(d38) * v).cast(d38)).over(w).alias("ssq"),
    )
    n, s, ssq = F.col("n"), F.col("s"), F.col("ssq")
    dv = F.col("v").cast(d38)
    dev2 = (n * dv - s) * (n * dv - s)
    var_n = n * (n * ssq - s * s)
    return (
        stats.where((n >= ZSCORE_MIN_N) & ((n - 1) * dev2 > 9 * var_n))
        .select(
            "user_id",
            "event_id",
            "value",
            n.alias("n_win"),
            F.expr(
                f"CAST((1000 * (n - 1) * (n * CAST(v AS {d38}) - s) * (n * CAST(v AS {d38}) - s)) "
                f"div nullif(n * (n * ssq - s * s), CAST(0 AS {d38})) AS BIGINT)"
            ).alias("z2_milli"),
        )
    )


@query(
    "ts_seasonal_profile_mad",
    oracle="""
    WITH cents AS (
      SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    base AS (
      SELECT event_type, hr, SUM(v) AS s, COUNT(*) AS n FROM cents GROUP BY 1, 2
    )
    SELECT c.event_type, c.hr AS hour_of_day, CAST(b.n AS BIGINT) AS n,
           CAST((1000 * b.s) // b.n AS BIGINT) AS mean_milli_cents,
           CAST((1000 * SUM(abs(b.n * c.v - b.s))) // (b.n * b.n) AS BIGINT)
             AS mad_milli_cents
    FROM cents c JOIN base b ON c.event_type = b.event_type AND c.hr = b.hr
    GROUP BY c.event_type, c.hr, b.s, b.n
    """,
    tags=("agg", "timeseries", "events"),
)
def ts_seasonal_profile_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal profile: per (event_type, hour-of-day) mean and mean
    absolute deviation of value — the baseline table a seasonal anomaly
    detector compares against (the trailing-window screen
    ts_anomaly_rolling_zscore is its per-entity cousin).

    All-integer again: cents, and both mean and MAD are emitted as
    floor-divided milli-units (mean = 1000s//n; MAD = 1000*Σ|n·v-s|
    // n², the cross-multiplied form that never divides early), so the
    oracle is exact BIGINT end to end.  Plan: one partial-agg pass
    builds the 5x24-row profile, which BROADCASTS back onto the events
    scan for the deviation pass — two scans, one tiny broadcast, no
    fact-fact shuffle; at 100 TB both passes are map-side against the
    profile."""
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    base = cents.groupBy("event_type", "hr").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
    )
    j = cents.join(F.broadcast(base), ["event_type", "hr"])
    return (
        j.groupBy("event_type", F.col("hr").alias("hour_of_day"), "s", "n")
        .agg(F.sum(F.abs(F.col("n") * F.col("v") - F.col("s"))).alias("t"))
        .select(
            "event_type",
            "hour_of_day",
            F.col("n").cast("long").alias("n"),
            F.expr("(1000 * s) div n").alias("mean_milli_cents"),
            F.expr("(1000 * t) div (n * n)").alias("mad_milli_cents"),
        )
    )


@query(
    "events_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_date,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
             SUM(CAST(e.value AS DECIMAL(25,6))) AS sd
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
        AND date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
            BETWEEN 0 AND {RETENTION_MAX_OFFSET}
      GROUP BY 1, 2
    )
    SELECT cohort_date, day_offset,
           CAST(CAST(sd AS VARCHAR(64)) AS DOUBLE) AS revenue,
           CAST(CAST(SUM(sd) OVER (PARTITION BY cohort_date ORDER BY day_offset
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS VARCHAR(64)) AS DOUBLE) AS cum_revenue
    FROM rev
    """,
    tags=("agg", "events", "window"),
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: purchase revenue per (first-seen day,
    day offset) and its running total per cohort — the revenue overlay
    of the retention triangle (events_retention_cohorts).

    The cumulative sum runs over the DECIMAL group sums, not doubles:
    window engines combine frames in different orders (Spark cumulative
    add vs DuckDB segment trees), which diverges in double but is
    association-free in decimal; both engines cast the exact decimal to
    double only at the end (the dec_sum convention).  The window
    partitions are cohort keys with ≤{RETENTION_MAX_OFFSET}+1 rows each
    AFTER aggregation — a bounded window over a reduced relation, the
    allowlisted shape."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    rev = (
        ev.join(firsts, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
        .where(
            (F.col("event_type") == "purchase")
            & F.col("day_offset").between(0, RETENTION_MAX_OFFSET)
        )
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_date"),
            F.col("day_offset").cast("long").alias("day_offset"),
        )
        .agg(F.sum(F.col("value").cast("decimal(25,6)")).alias("sd"))
    )
    w = (
        W.partitionBy("cohort_date")
        .orderBy("day_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return rev.select(
        "cohort_date",
        "day_offset",
        F.col("sd").cast("double").alias("revenue"),
        F.sum("sd").over(w).cast("double").alias("cum_revenue"),
    )


@query(
    "events_inter_arrival_percentiles",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             date_diff('second',
                       LAG(CAST(ts AS TIMESTAMP)) OVER
                         (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id),
                       CAST(ts AS TIMESTAMP)) AS gap_s
      FROM events
    )
    SELECT event_type, COUNT(gap_s) AS n_gaps,
           quantile_cont(gap_s, 0.5) AS p50_s,
           quantile_cont(gap_s, 0.9) AS p90_s,
           quantile_cont(gap_s, 0.99) AS p99_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
    tags=("window", "events", "stats", "timeseries", "skew-source"),
)
def events_inter_arrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival latency distribution: per event type, exact
    p50/p90/p99/max of the seconds between a user's consecutive events
    of that type — the ops-dashboard staple (think: time between
    heartbeats, purchases, errors).

    Gaps are integer seconds from one lag() pass keyed by (user_id,
    event_type); the exact interpolated percentiles reuse the proven
    Spark percentile == DuckDB quantile_cont convention
    (agg_percentile_exact) — but NEVER Spark's ``percentile()`` buffer
    aggregate, whose per-group state is every raw gap sorted in one
    task (with ~5 event types at 100 TB: billions of values per
    reducer; the round-6 verdict's scale-killer class).  Instead the
    gaps are first reduced ``groupBy(event_type, gap_s).count()`` — a
    map-side-partial aggregate bounded by the integer-second TIME
    DOMAIN (a year of data is <= ~31.5M distinct gaps however many
    rows), then ``global_index.weighted_quantiles`` takes grouped
    weighted order statistics exactly as agg_mannwhitney_u does."""
    from pyspark.sql import Window as W

    from oracle_parquet_dumper_spark.operators.global_index import weighted_quantiles

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    vc = gaps.groupBy("event_type", "gap_s").agg(F.count(F.lit(1)).alias("_w"))
    return weighted_quantiles(
        vc,
        "gap_s",
        "_w",
        group_cols=["event_type"],
        cont={"p50_s": 0.5, "p90_s": 0.9, "p99_s": 0.99},
        extra_aggs={"max_s": F.max("gap_s").cast("long")},
        n_col="n_gaps",
        bucketer="quantile",
    )


WAU_DAYS = 7  # trailing window for "weekly" active users


@query(
    "events_dau_wau",
    oracle=f"""
    WITH active AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM active),
    wau_src AS (
      SELECT d.day, a.user_id
      FROM active a JOIN days d
        ON d.day >= a.day AND d.day < a.day + INTERVAL {WAU_DAYS} DAY
      GROUP BY d.day, a.user_id
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           (SELECT COUNT(DISTINCT user_id) FROM active a WHERE a.day = d.day) AS dau,
           (SELECT COUNT(*) FROM wau_src w WHERE w.day = d.day) AS wau
    FROM days d
    """,
    tags=("agg", "events", "window"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-{WAU_DAYS}-day WAU per observed day — the first
    chart on every product dashboard, and a distinct-count-over-sliding-
    window problem engines routinely get wrong (windowed COUNT(DISTINCT)
    isn't supported; recomputing per window is O(days x log)).

    The scalable formulation: reduce to DISTINCT (day, user) once
    (bounded by active-pairs, not events), then EXPLODE each pair onto
    the ≤{WAU_DAYS} future observed days it keeps a user active for and
    count plain rows per day — turning the sliding distinct into one
    explode + one exact count, the same explode-onto-windows trick as
    the retention triangle.  The observed-days dimension broadcasts."""
    from pyspark.sql import Window as W  # noqa: F401 (parity with module)

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    active = ev.distinct()
    days = active.select("day").distinct()
    dau = active.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # explode each active (day,user) to the observed days within its
    # 7-day influence, dedup (user may re-appear), count per day
    targets = (
        active.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), WAU_DAYS - 1))
            ).alias("day"),
        )
        .join(F.broadcast(days), "day")
        .distinct()
    )
    wau = targets.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
        )
    )


@query(
    "events_survival_hazard",
    oracle="""
    WITH lt AS (
      SELECT user_id,
             date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
               AS lifetime_days
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT lifetime_days, COUNT(*) AS n_ended
      FROM lt GROUP BY lifetime_days
    ),
    r AS (
      SELECT lifetime_days, n_ended,
             SUM(n_ended) OVER (ORDER BY lifetime_days DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS n_at_risk,
             SUM(n_ended) OVER () AS n_total
      FROM d
    )
    SELECT lifetime_days, CAST(n_ended AS BIGINT) AS n_ended,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(n_ended AS DOUBLE) / n_at_risk AS hazard,
           CAST(n_at_risk - n_ended AS DOUBLE) / n_total AS survival
    FROM r
    """,
    tags=("agg", "events", "window", "stats"),
)
def events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-indexed churn table (the discrete-time survival-analysis
    shape): per observed lifetime k (days between a user's first and
    last event), how many users' observed span ENDED at k (``n_ended``),
    how many were still at risk (span >= k, ``n_at_risk``), the hazard
    d_k/n_k and the empirical survival S(k) = P(span > k).

    Complements ``events_retention_cohorts`` (calendar-cohort triangle):
    this is the lifetime-axis marginal a growth team reads churn rates
    off.  With no censoring, Kaplan-Meier's product-limit estimator
    degenerates to the empirical survival function — so S(k) is ONE
    integer ratio per row (single IEEE divide, cross-engine exact)
    instead of an order-sensitive float product.

    Scale: the per-user span is one groupBy; the lifetime distribution
    has <= observation-window-days rows REGARDLESS of data size (29 at
    the fixture, ~3650 for a decade of data), so the reverse-cumsum
    window runs on a bounded relation (allowlisted in plans/audit.py) —
    the same bounded-relation argument as clean_length_band.  No row
    ever crosses an unpartitioned window."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    lt = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))).alias(
            "lifetime_days"
        )
    )
    d = lt.groupBy("lifetime_days").agg(F.count(F.lit(1)).alias("n_ended"))
    # both frames share one ordering so Spark plans ONE WindowExec over
    # the bounded lifetime-distribution relation
    rev = W.orderBy(F.col("lifetime_days").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot = W.orderBy(F.col("lifetime_days").desc()).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    r = d.select(
        F.col("lifetime_days").cast("long").alias("lifetime_days"),
        F.col("n_ended").cast("long").alias("n_ended"),
        F.sum("n_ended").over(rev).cast("long").alias("n_at_risk"),
        F.sum("n_ended").over(tot).alias("n_total"),
    )
    return r.select(
        "lifetime_days",
        "n_ended",
        "n_at_risk",
        (F.col("n_ended").cast("double") / F.col("n_at_risk")).alias("hazard"),
        (
            (F.col("n_at_risk") - F.col("n_ended")).cast("double") / F.col("n_total")
        ).alias("survival"),
    )


CUPED_VARIANTS = 2  # deterministic assignment: user_id % CUPED_VARIANTS


@query(
    "events_cuped_adjusted",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS mn_s,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS mx_s
      FROM events
    ),
    u AS (
      SELECT user_id, user_id % {CUPED_VARIANTS} AS variant,
             SUM(CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                        < CAST((mn_s + mx_s) // 2 AS BIGINT)
                      THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS x,
             SUM(CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                        >= CAST((mn_s + mx_s) // 2 AS BIGINT)
                      THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS y
      FROM events CROSS JOIN bounds
      GROUP BY user_id
    ),
    g AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM u
    ),
    v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sxv,
             CAST(SUM(y) AS DECIMAL(38,0)) AS syv
      FROM u GROUP BY variant
    )
    SELECT v.variant, v.n_users,
           CAST(CAST(v.syv AS VARCHAR) AS DOUBLE) / v.n_users AS mean_post,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS theta,
           (CAST(CAST(v.syv AS VARCHAR) AS DOUBLE) / v.n_users)
             - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
               * ((CAST(CAST(v.sxv AS VARCHAR) AS DOUBLE) / v.n_users)
                  - (CAST(CAST(g.sx AS VARCHAR) AS DOUBLE)
                     / CAST(CAST(g.n AS VARCHAR) AS DOUBLE)))
             AS mean_post_cuped
    FROM v CROSS JOIN g
    """,
    tags=("agg", "events", "stats", "experiment"),
)
def events_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker, WSDM'13): per deterministic variant (user_id % 2), the raw
    post-period mean metric and the CUPED-adjusted mean
    ``ybar_v - theta * (xbar_v - xbar)``, where the covariate x is each
    user's PRE-period metric and ``theta = cov(x,y)/var(x)`` is pooled
    across all users.  Pre/post split at the midpoint of the dataset's
    time range (exact integer epoch-second arithmetic).

    Float portability: x and y are exact cents (BIGINT); every moment —
    n, Sx, Sy, Sxy, Sxx, and the theta numerator/denominator
    n*Sxy - Sx*Sy / n*Sxx - Sx² — is exact DECIMAL(38,0) (Sxy alone
    reaches ~3e18 at sf1, and n*Sxy ~3e23 overflows BIGINT, the
    ts_anomaly_rolling_zscore lesson).  Doubles appear only at the
    final scalar expression, built from single casts of exact decimals
    (through VARCHAR — the registry's correctly-rounded-cast
    convention) combined in an identical op tree on both engines, so
    the adjusted means are bit-identical.

    Scale shape: one broadcast 1-row time-bounds aggregate; ONE shuffle
    keyed by user_id for the per-user covariate/metric rollup
    (map-side partial agg); from there everything aggregates to a
    2-row variant relation and a broadcast 1-row moment relation.
    theta is computed IN-PLAN (no driver collect) and joined back by
    broadcast cross join.  No reference counterpart (main.py:144-146
    exports tables as-is); Part B experimentation extension."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_timestamp("ts")).alias("mn_s"),
        F.max(F.unix_timestamp("ts")).alias("mx_s"),
    )
    cut = F.expr("(mn_s + mx_s) div 2")
    cents = F.floor(F.col("value") * 100).cast("long")
    u = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.unix_timestamp("ts") < cut, cents).otherwise(F.lit(0))
            ).alias("x"),
            F.sum(
                F.when(F.unix_timestamp("ts") >= cut, cents).otherwise(F.lit(0))
            ).alias("y"),
        )
        .select(
            (F.col("user_id") % CUPED_VARIANTS).alias("variant"), "x", "y"
        )
    )
    d38 = "decimal(38,0)"
    g = u.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast(d38).alias("sxv"),
        F.sum("y").cast(d38).alias("syv"),
    )
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    j = v.crossJoin(F.broadcast(g))
    theta = dbl(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / dbl(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    mean_post = dbl(F.col("syv")) / F.col("n_users")
    xbar_v = dbl(F.col("sxv")) / F.col("n_users")
    xbar = dbl(F.col("sx")) / dbl(F.col("n"))
    return j.select(
        F.col("variant").cast("long").alias("variant"),
        "n_users",
        mean_post.alias("mean_post"),
        theta.alias("theta"),
        (mean_post - theta * (xbar_v - xbar)).alias("mean_post_cuped"),
    )


# ---------------------------------------------------------------------------
# Two-sample inference over the event stream: Welch's t-test, CUSUM
# changepoint, Kolmogorov-Smirnov.  No reference counterpart (the
# reference exports tables verbatim, main.py:144-146); Part B
# experimentation/monitoring extensions next to events_cuped_adjusted.
# ---------------------------------------------------------------------------

TT_TREAT = "purchase"
TT_CONTROL = "view"


@query(
    "events_welch_ttest",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DECIMAL(38,0))
                      * CAST(FLOOR(value * 100) AS BIGINT)) AS DECIMAL(38,0)) AS q
      FROM events WHERE event_type IN ('{TT_TREAT}', '{TT_CONTROL}')
      GROUP BY event_type
    ),
    m AS (
      SELECT MAX(CASE WHEN event_type = '{TT_TREAT}' THEN n END) AS n1,
             MAX(CASE WHEN event_type = '{TT_TREAT}' THEN s END) AS s1,
             MAX(CASE WHEN event_type = '{TT_TREAT}' THEN q END) AS q1,
             MAX(CASE WHEN event_type = '{TT_CONTROL}' THEN n END) AS n2,
             MAX(CASE WHEN event_type = '{TT_CONTROL}' THEN s END) AS s2,
             MAX(CASE WHEN event_type = '{TT_CONTROL}' THEN q END) AS q2
      FROM g
    ),
    v AS (
      SELECT n1, n2,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / n1 AS m1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) / n2 AS m2,
             CAST(CAST(n1 * q1 - s1 * s1 AS VARCHAR) AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * (n1 - 1) * n1) AS v1n,
             CAST(CAST(n2 * q2 - s2 * s2 AS VARCHAR) AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * (n2 - 1) * n2) AS v2n
      FROM m
    )
    SELECT n1 AS n_treat, n2 AS n_control,
           m1 AS mean_treat_cents, m2 AS mean_control_cents,
           (m1 - m2) / sqrt(v1n + v2n) AS t_stat,
           (v1n + v2n) * (v1n + v2n)
             / (v1n * v1n / (n1 - 1) + v2n * v2n / (n2 - 1)) AS df_welch
    FROM v
    """,
    tags=("agg", "events", "stats", "experiment"),
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between the '{TT_TREAT}' and
    '{TT_CONTROL}' event-value distributions (Welch 1947): t statistic
    plus the Welch-Satterthwaite degrees of freedom.

    Float portability (the events_cuped_adjusted recipe): the only
    inputs are EXACT integer moments per group — n, sum of cents,
    sum of squared cents — carried as DECIMAL(38,0) (sum-of-squares
    reaches ~2.4e15 at sf1 and the n*q variance numerator ~2.4e21,
    past BIGINT; the decimal form stays exact to ~1e12 rows).  Doubles
    appear only in the final scalar expression, each decimal entering
    through ONE correctly-rounded cast (VARCHAR hop on the DuckDB
    side, the registry convention), combined in an identical op tree —
    division, subtraction, sqrt are all IEEE-correctly-rounded, so the
    t statistic is bit-identical across engines.

    Scale shape: one scan with the two-type filter pushed to parquet;
    ONE map-side-partial aggregate keyed by event_type (2 groups);
    everything after runs on a 2-row relation folded to 1 row.  No
    window, no join, no Python."""
    d38 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(TT_TREAT, TT_CONTROL)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast(d38).alias("s"),
        F.sum(cents.cast(d38) * cents).cast(d38).alias("q"),
    )

    def pick(t: str, c: str):
        return F.max(F.when(F.col("event_type") == t, F.col(c)))

    m = g.agg(
        pick(TT_TREAT, "n").alias("n1"),
        pick(TT_TREAT, "s").alias("s1"),
        pick(TT_TREAT, "q").alias("q1"),
        pick(TT_CONTROL, "n").alias("n2"),
        pick(TT_CONTROL, "s").alias("s2"),
        pick(TT_CONTROL, "q").alias("q2"),
    )
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    v = m.select(
        "n1",
        "n2",
        (dbl(F.col("s1")) / F.col("n1")).alias("m1"),
        (dbl(F.col("s2")) / F.col("n2")).alias("m2"),
        (
            dbl(F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1"))
            / (F.col("n1").cast("double") * (F.col("n1") - 1) * F.col("n1"))
        ).alias("v1n"),
        (
            dbl(F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2"))
            / (F.col("n2").cast("double") * (F.col("n2") - 1) * F.col("n2"))
        ).alias("v2n"),
    )
    vn = F.col("v1n") + F.col("v2n")
    return v.select(
        F.col("n1").alias("n_treat"),
        F.col("n2").alias("n_control"),
        F.col("m1").alias("mean_treat_cents"),
        F.col("m2").alias("mean_control_cents"),
        ((F.col("m1") - F.col("m2")) / F.sqrt(vn)).alias("t_stat"),
        (
            vn * vn
            / (
                F.col("v1n") * F.col("v1n") / (F.col("n1") - 1)
                + F.col("v2n") * F.col("v2n") / (F.col("n2") - 1)
            )
        ).alias("df_welch"),
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id, epoch_us(ts) AS ts_us,
             CAST(FLOOR(value * 100) AS BIGINT) AS c
      FROM events
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS t
      FROM base GROUP BY event_type
    ),
    cum AS (
      SELECT b.event_type, b.event_id, t.n,
             SUM(CAST(t.n AS DECIMAL(38,0)) * b.c - t.t)
               OVER (PARTITION BY b.event_type ORDER BY b.ts_us, b.event_id) AS s
      FROM base b JOIN tot t USING (event_type)
    ),
    r AS (
      SELECT event_type, event_id, n, abs(s) AS d,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(s) DESC, event_id) AS rk
      FROM cum
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(event_id AS BIGINT) AS cp_event_id,
           CAST(CAST(d AS VARCHAR) AS DOUBLE) / n AS cusum_abs_per_n
    FROM r WHERE rk = 1
    """,
    tags=("window", "events", "timeseries", "stats"),
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type (Page 1954): the
    event (in time order) where the cumulative sum of mean-centered
    values attains its maximum absolute deviation — the classic
    single-changepoint location estimator for a level shift.

    All-integer formulation: centering by the mean would leave integer
    arithmetic, so every value is scaled by n first — S_k =
    sum_{{i<=k}} (n*c_i - T) = n*(C_k - k*T/n) with c in exact cents,
    T the per-type total.  Per-row terms fit BIGINT to ~1e12 rows
    (n*c <= 1e12 * 5e4 cents) but the RUNNING SUM reaches ~n*max|term|,
    so it accumulates in DECIMAL(38,0) — exact at any realistic scale.
    The one double (|S|/n, the mean-shift magnitude in cents) enters
    through a single correctly-rounded cast on both engines.

    Scale shape: the oracle states the running sum as a window
    PARTITION BY event_type — but a low-cardinality partition key IS an
    unpartitioned window in disguise (5 types = 5 tasks however big the
    data).  The Spark plan instead computes the identical prefix sum on
    the distributed global-index primitive (two-pass bucket offsets,
    operators/global_index.py, group_cols=[event_type]): within-type
    order is (epoch-microseconds, event_id) — exact integers, identical
    on both engines — and the argmax is a map-side-partial struct-max
    aggregate, never a second window."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    d38 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        # ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the cast is
        # the identity instant and unix_micros is well-defined
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    tot = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_ev"),
        F.sum("c").cast("long").alias("t"),
    )
    j = base.join(F.broadcast(tot), "event_type").withColumn(
        "w", (F.col("n_ev").cast(d38) * F.col("c") - F.col("t")).cast(d38)
    )
    idx = with_global_index(
        j, "ts_us", ["event_id"], group_cols=["event_type"], weight_col="w"
    )
    best = idx.groupBy("event_type").agg(
        F.max(
            F.struct(
                F.abs(F.col("_gcum")).alias("d"),
                (-F.col("_gidx")).alias("neg_idx"),
                F.col("event_id").alias("cp_event_id"),
                F.col("n_ev").alias("n"),
            )
        ).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").alias("n"),
        F.col("b.cp_event_id").alias("cp_event_id"),
        (F.col("b.d").cast("string").cast("double") / F.col("b.n")).alias(
            "cusum_abs_per_n"
        ),
    )


KS_A = "purchase"
KS_B = "view"


@query(
    "agg_ks_two_sample",
    oracle=f"""
    WITH f AS (
      SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c, event_type
      FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
    ),
    v AS (
      SELECT c,
             CAST(SUM(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END) AS BIGINT) AS d2
      FROM f GROUP BY c
    ),
    t AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2 FROM v
    ),
    cum AS (
      SELECT v.c, t.n1, t.n2,
             SUM(CAST(t.n2 AS DECIMAL(38,0)) * v.d1
                 - CAST(t.n1 AS DECIMAL(38,0)) * v.d2) OVER (ORDER BY v.c) AS s
      FROM v CROSS JOIN t
    )
    SELECT n1 AS n_a, n2 AS n_b, CAST(c AS BIGINT) AS at_value_cents,
           CAST(CAST(abs(s) AS VARCHAR) AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)
             AS ks_stat
    FROM cum ORDER BY abs(s) DESC, c LIMIT 1
    """,
    tags=("agg", "events", "stats", "window"),
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the '{KS_A}' and
    '{KS_B}' event-value distributions: D = max_x |F1(x) - F2(x)|, plus
    the value where the ECDFs diverge most.

    All-integer formulation: the ECDF difference at x is
    |c1(x)/n1 - c2(x)/n2| = |n2*c1(x) - n1*c2(x)| / (n1*n2), so the
    maximized quantity is the running sum of per-value weights
    w = n2*d1 - n1*d2 over the VALUE-AGGREGATED distribution (one row
    per distinct cents value — ties between the samples are handled
    exactly, because the ECDF step at a tied value completes before the
    difference is evaluated).  Weights are DECIMAL(38,0) (n2*d1 can
    pass BIGINT at ~1e10 rows); the single double is the final
    D / (n1*n2) division, identical op tree both engines.

    Scale shape: the oracle's ``SUM(...) OVER (ORDER BY c)`` is THE
    canonical single-partition window; the Spark plan computes the
    identical prefix sum with the distributed global-index primitive
    (operators/global_index.py) over the aggregated value distribution
    — whose size is bounded by the value domain, not the row count —
    after one map-side-partial groupBy(cents) and a broadcast 1-row
    total.  The argmax is a struct-max aggregate, not a second sort.
    The aggregated distribution is lazily localCheckpointed: the plan
    references it four times (total, weights, bucket counts, bucket
    join) and the checkpoint makes that ONE events scan + one shuffle
    instead of four re-derivations (the lsh.py band convention)."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    d38 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(KS_A, KS_B)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    v = ev.select(cents.alias("c"), "event_type").groupBy("c").agg(
        F.count(F.when(F.col("event_type") == KS_A, 1)).cast("long").alias("d1"),
        F.count(F.when(F.col("event_type") == KS_B, 1)).cast("long").alias("d2"),
    ).localCheckpoint(eager=False)
    t = v.agg(
        F.sum("d1").cast("long").alias("n1"), F.sum("d2").cast("long").alias("n2")
    )
    j = v.crossJoin(F.broadcast(t)).withColumn(
        "w",
        (F.col("n2").cast(d38) * F.col("d1") - F.col("n1").cast(d38) * F.col("d2"))
        .cast(d38),
    )
    idx = with_global_index(j, "c", ["c"], weight_col="w")
    best = idx.agg(
        F.max(
            F.struct(
                F.abs(F.col("_gcum")).alias("d"),
                (-F.col("c")).alias("neg_c"),
                F.col("c").alias("at_value_cents"),
                F.col("n1").alias("n_a"),
                F.col("n2").alias("n_b"),
            )
        ).alias("b")
    )
    return best.select(
        F.col("b.n_a").alias("n_a"),
        F.col("b.n_b").alias("n_b"),
        F.col("b.at_value_cents").alias("at_value_cents"),
        (
            F.col("b.d").cast("string").cast("double")
            / (F.col("b.n_a").cast("double") * F.col("b.n_b"))
        ).alias("ks_stat"),
    )


@query(
    "agg_mannwhitney_u",
    oracle=f"""
    WITH f AS (
      SELECT CAST(FLOOR(value * 100) AS BIGINT) AS c, event_type
      FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
    ),
    v AS (
      SELECT c,
             CAST(SUM(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END) AS BIGINT) AS d2
      FROM f GROUP BY c
    ),
    cum AS (
      SELECT c, d1, d2, d1 + d2 AS d,
             CAST(SUM(d1 + d2) OVER (ORDER BY c) AS BIGINT) AS cumd
      FROM v
    ),
    s AS (
      SELECT CAST(SUM(d1) AS BIGINT) AS n1, CAST(SUM(d2) AS BIGINT) AS n2,
             CAST(SUM(CAST(d1 AS DECIMAL(38,0)) * (2 * cumd - d + 1)) AS DECIMAL(38,0)) AS two_r1,
             CAST(SUM(CAST(d AS DECIMAL(38,0)) * d * d - d) AS DECIMAL(38,0)) AS tie_t
      FROM cum
    )
    SELECT n1 AS n_a, n2 AS n_b,
           (CAST(CAST(two_r1 AS VARCHAR) AS DOUBLE)
              - CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS VARCHAR) AS DOUBLE)) / 2
             AS u_stat,
           ((CAST(CAST(two_r1 AS VARCHAR) AS DOUBLE)
               - CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS VARCHAR) AS DOUBLE)) / 2
            - CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS VARCHAR) AS DOUBLE) / 2)
           / sqrt(
               (CAST(CAST(CAST(n1 AS DECIMAL(38,0)) * n2 AS VARCHAR) AS DOUBLE) / 12)
               * (CAST(CAST(CAST(n1 + n2 + 1 AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
                  - CAST(CAST(tie_t AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(CAST(n1 + n2 AS DECIMAL(38,0)) * (n1 + n2 - 1) AS VARCHAR) AS DOUBLE))
             ) AS z_stat
    FROM s
    """,
    tags=("agg", "events", "stats", "window", "experiment"),
    bench=True,
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between the '{KS_A}' and
    '{KS_B}' event-value distributions, with exact MIDRANKS for ties and
    the tie-corrected normal approximation (Mann & Whitney 1947) —
    completing the classical two-sample panel next to the parametric
    Welch t and the distributional KS.

    All-integer rank algebra: over the VALUE-AGGREGATED distribution
    (one row per distinct cents value with per-sample counts d1, d2,
    pooled d), the midrank of value v is prefix(v) + (d+1)/2, so
    2*R1 = sum d1 * (2*cumd - d + 1) with cumd the INCLUSIVE pooled
    running count — exact integers carried in DECIMAL(38,0), like the
    KS weights.  The tie term sum(d^3 - d) is likewise exact.  Doubles
    appear only in the final scalar block, each decimal entering
    through ONE VARCHAR-hop cast, combined in an identical op tree
    (B^(3/2) is written b*sqrt(b)-style: no pow(), whose rounding is
    not IEEE-pinned).

    Scale shape: identical to agg_ks_two_sample — one pushed scan, one
    map-side-partial groupBy(cents) bounded by the value domain, the
    inclusive prefix count on the distributed global-index primitive
    (ungrouped: rank order is global, so its <= 64-row bucket-offsets
    window is allowlisted like KS), then a 1-row fold."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    d38 = "decimal(38,0)"
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(KS_A, KS_B)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    v = (
        ev.select(cents.alias("c"), "event_type")
        .groupBy("c")
        .agg(
            F.count(F.when(F.col("event_type") == KS_A, 1)).cast("long").alias("d1"),
            F.count(F.when(F.col("event_type") == KS_B, 1)).cast("long").alias("d2"),
        )
        .withColumn("d", (F.col("d1") + F.col("d2")).cast("long"))
        .localCheckpoint(eager=False)
    )
    idx = with_global_index(v, "c", ["c"], weight_col="d", cum_col="cumd")
    s = idx.agg(
        F.sum("d1").cast("long").alias("n1"),
        F.sum("d2").cast("long").alias("n2"),
        F.sum(
            F.col("d1").cast(d38) * (2 * F.col("cumd") - F.col("d") + 1)
        ).cast(d38).alias("two_r1"),
        F.sum(F.col("d").cast(d38) * F.col("d") * F.col("d") - F.col("d"))
        .cast(d38)
        .alias("tie_t"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u_stat = (dbl(F.col("two_r1")) - dbl((n1.cast(d38) * (n1 + 1)).cast(d38))) / 2
    n1n2 = dbl((n1.cast(d38) * n2).cast(d38))
    var_u = (n1n2 / 12) * (
        dbl((n1 + n2 + 1).cast(d38))
        - dbl(F.col("tie_t")) / dbl(((n1 + n2).cast(d38) * (n1 + n2 - 1)).cast(d38))
    )
    return s.select(
        n1.alias("n_a"),
        n2.alias("n_b"),
        u_stat.alias("u_stat"),
        ((u_stat - n1n2 / 2) / F.sqrt(var_u)).alias("z_stat"),
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    pairs AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (SELECT src, CAST(SUM(n_pairs) AS BIGINT) AS n_src FROM pairs GROUP BY src)
    SELECT src, dst, n_pairs,
           CAST(n_pairs AS DOUBLE) / n_src AS prob
    FROM pairs JOIN tot USING (src)
    """,
    tags=("window", "events", "stats"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: P(next = dst | current = src), the standard behavioral
    model behind next-action prediction and funnel simulation (and the
    row-normalized form of events_path_trigrams' pair counts).

    Exactness: transitions come from lead() over (ts, event_id) — an
    exact (timestamp, key) ordering identical on both engines — and
    counts are exact BIGINT; the row-normalized probability is ONE
    IEEE divide per cell.

    Scale shape: the sequence window is PARTITIONED BY user_id (per-user
    state, the scalable window class), then two map-side-partial
    aggregates on tiny key domains (|types|^2 cells); the row-total
    join broadcasts a <= |types|-row relation.  No global window, no
    unbounded state."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"), F.lead("event_type").over(w).alias("dst")
    )
    pairs = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .localCheckpoint(eager=False)
    )
    tot = pairs.groupBy("src").agg(F.sum("n_pairs").cast("long").alias("n_src"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "n_pairs",
        (F.col("n_pairs").cast("double") / F.col("n_src")).alias("prob"),
    )


@query(
    "agg_moments_skew_kurt",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DECIMAL(38,0))
                      * CAST(FLOOR(value * 100) AS BIGINT)) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DECIMAL(38,0))
                      * CAST(FLOOR(value * 100) AS BIGINT)
                      * CAST(FLOOR(value * 100) AS BIGINT)) AS DECIMAL(38,0)) AS s3,
             CAST(SUM(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS DECIMAL(38,0))
                      * CAST(FLOOR(value * 100) AS BIGINT)
                      * CAST(FLOOR(value * 100) AS BIGINT)
                      * CAST(FLOOR(value * 100) AS BIGINT)) AS DECIMAL(38,0)) AS s4
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT event_type, n,
             CAST(n AS DOUBLE) AS nd,
             CAST(CAST(s1 AS VARCHAR) AS DOUBLE) AS f1,
             CAST(CAST(s2 AS VARCHAR) AS DOUBLE) AS f2,
             CAST(CAST(s3 AS VARCHAR) AS DOUBLE) AS f3,
             CAST(CAST(s4 AS VARCHAR) AS DOUBLE) AS f4
      FROM m
    ),
    c AS (
      SELECT event_type, n, nd, f1, f2, f3, f4,
             (nd * f2) - (f1 * f1) AS b
      FROM d
    )
    SELECT event_type, n AS n_events,
           f1 / nd AS mean_cents,
           ((nd * (nd * f3)) - (3 * ((nd * f1) * f2))) + (2 * ((f1 * f1) * f1))
             AS a_num,
           b AS b_den,
           (((nd * (nd * f3)) - (3 * ((nd * f1) * f2))) + (2 * ((f1 * f1) * f1)))
             / (b * sqrt(b)) AS skewness,
           ((((nd * (nd * (nd * f4))) - (4 * ((nd * (nd * f1)) * f3)))
              + (6 * (((nd * f1) * f1) * f2))) - (3 * (((f1 * f1) * f1) * f1)))
             / (b * b) - 3 AS kurtosis_excess
    FROM c
    """,
    tags=("agg", "events", "stats"),
)
def agg_moments_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness g1 = A/B^(3/2) and excess kurtosis g2 = C/B^2 - 3 per
    event type, from raw power sums: with S1..S4 the exact sums of
    cents^1..4, A = n^2*S3 - 3n*S1*S2 + 2*S1^3, B = n*S2 - S1^2,
    C = n^3*S4 - 4n^2*S1*S3 + 6n*S1^2*S2 - 3*S1^4 (the n-scalings
    cancel exactly between numerator and denominator, so no central
    moments are ever formed).

    Exact carriers are the POWER SUMS (DECIMAL(38,0): S4 <= n*c^4
    stays exact to ~1e13 rows at c <= 56k cents); A, B, C are then a
    FIXED explicitly-parenthesized IEEE tree over the four one-cast
    doubles — deterministic cross-engine (every op is a correctly-
    rounded primitive; B^(3/2) is b*sqrt(b), never pow()), though not
    exact — which is the right trade at scale, where A and C as
    integers would overflow any fixed decimal by ~1e50.

    Scale shape: ONE scan, one map-side-partial aggregate keyed by
    event_type; everything after runs on a |types|-row relation."""
    cents = F.floor(F.col("value") * 100).cast("long")
    d38 = "decimal(38,0)"
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents.cast(d38)).cast(d38).alias("s1"),
        F.sum(cents.cast(d38) * cents).cast(d38).alias("s2"),
        F.sum(cents.cast(d38) * cents * cents).cast(d38).alias("s3"),
        F.sum(cents.cast(d38) * cents * cents * cents).cast(d38).alias("s4"),
    )
    nd = F.col("n").cast("double")
    f1, f2, f3, f4 = (dbl(F.col(c)) for c in ("s1", "s2", "s3", "s4"))
    b = (nd * f2) - (f1 * f1)
    a = ((nd * (nd * f3)) - (3 * ((nd * f1) * f2))) + (2 * ((f1 * f1) * f1))
    c4 = (
        ((nd * (nd * (nd * f4))) - (4 * ((nd * (nd * f1)) * f3)))
        + (6 * (((nd * f1) * f1) * f2))
    ) - (3 * (((f1 * f1) * f1) * f1))
    return m.select(
        "event_type",
        F.col("n").alias("n_events"),
        (f1 / nd).alias("mean_cents"),
        a.alias("a_num"),
        b.alias("b_den"),
        (a / (b * F.sqrt(b))).alias("skewness"),
        (c4 / (b * b) - 3).alias("kurtosis_excess"),
    )


@query(
    "ts_autocorr_lag1",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(FLOOR(value * 100) AS BIGINT) AS c
      FROM events
    ),
    p AS (
      SELECT event_type,
             lag(c) OVER (PARTITION BY event_type ORDER BY ts_us, event_id) AS x,
             c AS y
      FROM base
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM p WHERE x IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_pairs,
           CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS VARCHAR) AS DOUBLE)
           / (sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS VARCHAR) AS DOUBLE))
              * sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS VARCHAR) AS DOUBLE)))
             AS acf1
    FROM s
    """,
    tags=("window", "events", "timeseries", "stats"),
)
def ts_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the event-value series per event type:
    Pearson r between consecutive values in (ts, event_id) order — the
    standard first diagnostic for serial dependence (and the term an
    AR(1) fit would estimate).

    Exact carriers: consecutive pairs' moment sums (n, Sx, Sy, Sxy,
    Sxx, Syy) in DECIMAL(38,0) over exact cents; r is then a fixed
    IEEE tree with one VARCHAR-hop cast per exact numerator and the
    denominator written sqrt(a)*sqrt(b) on both engines.

    Scale shape: the oracle's lag() window PARTITION BY event_type is
    the low-cardinality-partition trap (5 types = 5 tasks forever), so
    the Spark plan pairs consecutive rows through the distributed
    global-index primitive GROUPED by type (the cusum/gapfill recipe):
    index once, localCheckpoint, then self-join (type, i) to
    (type, i+1) — a shuffle on the high-cardinality (type, index) key —
    and one map-side-partial aggregate.  Bound: n*Sxy stays inside
    DECIMAL(38,0) to ~1e9 rows/type at c <= 56k cents; past that the
    engine raises (ANSI), never corrupts."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    d38 = "decimal(38,0)"
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("c"),
    )
    idx = with_global_index(
        base, "ts_us", ["event_id"], group_cols=["event_type"]
    ).localCheckpoint(eager=False)
    prev = idx.select("event_type", F.col("_gidx").alias("i"), F.col("c").alias("x"))
    nxt = idx.select(
        "event_type", (F.col("_gidx") - 1).alias("i"), F.col("c").alias("y")
    )
    pairs = prev.join(nxt, ["event_type", "i"])
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast(d38)).cast(d38).alias("sx"),
        F.sum(F.col("y").cast(d38)).cast(d38).alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y")).cast(d38).alias("syy"),
    )
    n = F.col("n")
    num = dbl((n.cast(d38) * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d38))
    denx = dbl((n.cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d38))
    deny = dbl((n.cast(d38) * F.col("syy") - F.col("sy") * F.col("sy")).cast(d38))
    return s.select(
        "event_type",
        n.alias("n_pairs"),
        (num / (F.sqrt(denx) * F.sqrt(deny))).alias("acf1"),
    )


@query(
    "events_audience_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
    sz AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY t),
    inter AS (
      SELECT a.t AS type_a, b.t AS type_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard,
           CAST(n_common AS DOUBLE) / least(sa.n, sb.n) AS overlap_coef
    FROM inter
    JOIN sz sa ON sa.t = type_a
    JOIN sz sb ON sb.t = type_b
    """,
    tags=("agg", "events", "join", "similarity"),
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every pair of event types: Jaccard and
    overlap (Szymkiewicz-Simpson) coefficients of the user sets — the
    segment-similarity readout behind "do viewers convert" questions,
    and the set-overlap primitive under co-engagement matrices.

    Exact integers (distinct-user sets, wedge-counted intersections,
    inclusion-exclusion union) with ONE IEEE divide per coefficient.

    Scale shape: distinct on (type, user) — one map-side-partial
    shuffle keyed by the pair; the intersection wedge joins through the
    USER key with per-user fan-out <= C(|types|, 2) (bounded by the
    tiny type domain squared, the graph_neighbor_jaccard degree
    argument), and the size join broadcasts a |types|-row relation."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select(F.col("event_type").alias("t"), F.col("user_id").alias("u")).distinct()
    sz = ut.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = ut.select(F.col("t").alias("type_a"), "u")
    b = ut.select(F.col("t").alias("type_b"), F.col("u").alias("u2"))
    inter = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sz.select(F.col("t").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("t").alias("type_b"), F.col("n").alias("n_b"))
    j = inter.join(F.broadcast(sa), "type_a").join(F.broadcast(sb), "type_b")
    union = F.col("n_a") + F.col("n_b") - F.col("n_common")
    return j.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_common",
        (F.col("n_common").cast("double") / union).alias("jaccard"),
        (F.col("n_common").cast("double") / F.least("n_a", "n_b")).alias("overlap_coef"),
    )


@query(
    "events_conversion_lag_percentiles",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t_buy
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    l AS (
      SELECT v.user_id, t_buy - t_view AS lag_us
      FROM v JOIN p USING (user_id) WHERE t_buy >= t_view
    ),
    r AS (
      SELECT user_id, lag_us,
             row_number() OVER (ORDER BY lag_us, user_id) - 1 AS i,
             COUNT(*) OVER () AS n
      FROM l
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_users,
           CAST(MAX(CASE WHEN i = CAST(floor(((n - 1) * 50) / 100.0) AS BIGINT)
                         THEN lag_us END) AS BIGINT) AS median_lag_us,
           CAST(MAX(CASE WHEN i = CAST(floor(((n - 1) * 90) / 100.0) AS BIGINT)
                         THEN lag_us END) AS BIGINT) AS p90_lag_us
    FROM r
    """,
    tags=("events", "window", "stats", "agg", "skew-source"),
)
def events_conversion_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user with both a view and
    a later-or-equal purchase, the lag between their FIRST view and
    FIRST purchase, summarized as exact median and p90 — the funnel
    latency readout next to events_funnel's conversion rates.

    Exactness: lags are exact integer microseconds; the percentiles are
    DISCRETE order statistics selected by index (i = floor((n-1)*p)),
    not interpolated — so the entire query is integer-only and the
    oracle states the identical selection with a row_number window.

    Scale shape: ONE user-keyed conditional-MIN aggregate (min view
    time and min purchase time in the same map-side-partial pass — no
    self-join of the event stream), then the order statistics come from
    the distributed global-index primitive (ungrouped, like the KS/MW
    callers — its <= 64-row bucket-offsets window is allowlisted) and a
    final 1-row conditional fold — never Spark's percentile() buffer
    aggregate, which materializes every value in one reducer's memory."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lags = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", us)).alias("t_view"),
            F.min(F.when(F.col("event_type") == "purchase", us)).alias("t_buy"),
        )
        .where(
            F.col("t_view").isNotNull()
            & F.col("t_buy").isNotNull()
            & (F.col("t_buy") >= F.col("t_view"))
        )
        .select("user_id", (F.col("t_buy") - F.col("t_view")).alias("lag_us"))
    )
    # quantile bucketer: first-view -> first-purchase lags are
    # classically heavy-tailed (most users convert fast, a long tail
    # takes days), so equi-width min/max bucketing would pile nearly
    # every user into the low buckets — the round-6 verdict's
    # partial-straggler gap.  The index is bucketer-invariant, so the
    # oracle is untouched.
    idx = with_global_index(lags, "lag_us", ["user_id"], bucketer="quantile")

    def at(pct: int):
        k = F.floor(((F.col("_gn") - 1) * pct) / 100.0).cast("long")
        return F.max(F.when(F.col("_gidx") == k, F.col("lag_us"))).cast("long")

    return idx.agg(
        F.max("_gn").cast("long").alias("n_users"),
        at(50).alias("median_lag_us"),
        at(90).alias("p90_lag_us"),
    )


@query(
    "events_bot_regularity",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    a AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(gap_us AS HUGEINT)) AS s,
             SUM(CAST(gap_us AS HUGEINT) * gap_us) AS ssq
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id HAVING COUNT(*) >= 12
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           CAST(s // n AS BIGINT) AS mean_gap_us,
           CAST((1000 * n * (n * ssq - s * s))
                // nullif((n - 1) * s * s, 0) AS BIGINT) AS cv2_milli,
           CASE WHEN s = 0 THEN TRUE
                ELSE (1000 * n * (n * ssq - s * s)) // ((n - 1) * s * s) < 100
           END AS is_bot
    FROM a
    """,
    tags=("events", "agg", "window", "clean"),
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation screen on inter-arrival regularity: per user, the
    squared coefficient of variation of the gaps between consecutive
    events — humans are bursty (cv ~ 1 for Poisson arrivals, higher
    with sessions), schedulers and scrapers are metronomic (cv near 0).
    The standard pre-training curation gate that drops machine-generated
    interaction logs before they poison engagement-weighted sampling.

    cv^2 = n(n*ssq - s^2) / ((n-1) s^2) on exact microsecond gaps, all
    in 128-bit integers (DECIMAL(38,0) / HUGEINT — s^2 reaches ~1e32 for
    month-long spans) with one integer division to milli units, so both
    engines agree bit-for-bit; s = 0 (all gaps zero) is the perfectly
    regular degenerate flagged directly.

    Scale shape: the lag window and the moment aggregate are both keyed
    by user_id (map-side partial for the latter); nothing global."""
    ev = load_table(spark, sf_dir, "events")
    d38 = "decimal(38,0)"
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", (ts_us - F.lag(ts_us).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    gap38 = F.col("gap_us").cast(d38)
    a = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(gap38).alias("s"),
            F.sum((gap38 * F.col("gap_us")).cast(d38)).alias("ssq"),
        )
        .where(F.col("n") >= 12)
    )
    return a.select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.expr("CAST(s div n AS BIGINT)").alias("mean_gap_us"),
        F.expr(
            "CAST((1000 * n * (n * ssq - s * s)) "
            "div nullif((n - 1) * s * s, CAST(0 AS decimal(38,0))) AS BIGINT)"
        ).alias("cv2_milli"),
        F.when(F.col("s") == 0, F.lit(True))
        .otherwise(
            F.expr("(1000 * n * (n * ssq - s * s)) div ((n - 1) * s * s)") < 100
        )
        .alias("is_bot"),
    )


@query(
    "events_markov_top1_accuracy",
    oracle="""
    WITH p AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    pairs AS (SELECT prev_type, event_type, ts_us FROM p WHERE prev_type IS NOT NULL),
    b AS (
      SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS split_us
      FROM events, LATERAL (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us) t
    ),
    train AS (
      SELECT prev_type, event_type, COUNT(*) AS cnt
      FROM pairs, b WHERE ts_us <= split_us GROUP BY prev_type, event_type
    ),
    model AS (
      SELECT prev_type, event_type AS predicted
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
                                         ORDER BY cnt DESC, event_type) AS rn
            FROM train)
      WHERE rn = 1
    ),
    ev AS (SELECT prev_type, event_type FROM pairs, b WHERE ts_us > split_us)
    SELECT CAST((SELECT SUM(cnt) FROM train) AS BIGINT) AS n_train_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_eval_pairs,
           CAST(SUM(CASE WHEN predicted = event_type THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           CAST((1000 * SUM(CASE WHEN predicted = event_type THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS acc_milli
    FROM ev LEFT JOIN model USING (prev_type)
    """,
    tags=("events", "window", "agg", "eval"),
)
def events_markov_top1_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the first-order Markov next-event model under a
    TEMPORAL split: transitions in the first half of the time range
    train the per-state argmax predictor, transitions in the second
    half score it — top-1 accuracy in exact milli units.  The eval twin
    of events_markov_transitions: the pattern every sequence-model
    data pipeline needs (train/eval leakage control by time, not by
    random row).

    Scale shape: ONE pass over data rows — the user-keyed lag window
    feeds a single (prev, next, is_train) aggregate, so train counting
    AND eval scoring both run on the tiny #states^2 counts relation
    (prediction depends only on prev_type, so identical eval pairs
    score identically — no per-row join needed).  The split point is a
    1-row broadcast min/max fold; the argmax is a partitioned window
    over the counts relation."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type"),
            ts_us.alias("ts_us"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    b = ev.agg(
        F.expr(
            "CAST((MIN(unix_micros(CAST(ts AS TIMESTAMP)))"
            " + MAX(unix_micros(CAST(ts AS TIMESTAMP)))) div 2 AS BIGINT)"
        ).alias("split_us")
    )
    counts = (
        pairs.crossJoin(F.broadcast(b))
        .groupBy(
            "prev_type",
            "event_type",
            (F.col("ts_us") <= F.col("split_us")).alias("is_train"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        # tiny (#states^2 x 2) but referenced by both the train and the
        # eval branch — checkpoint so events is scanned ONCE
        .localCheckpoint(eager=False)
    )
    train = counts.where("is_train").select("prev_type", "event_type", "cnt")
    mw = W.partitionBy("prev_type").orderBy(F.col("cnt").desc(), "event_type")
    model = (
        train.withColumn("rn", F.row_number().over(mw))
        .where(F.col("rn") == 1)
        .select("prev_type", F.col("event_type").alias("predicted"))
    )
    tt = train.agg(F.sum("cnt").cast("long").alias("n_train_pairs"))
    evl = counts.where(~F.col("is_train")).join(
        F.broadcast(model), "prev_type", "left"
    )
    hit = F.when(F.col("predicted") == F.col("event_type"), F.col("cnt")).otherwise(0)
    return (
        evl.agg(
            F.sum("cnt").alias("n_eval"),
            F.sum(hit).alias("n_correct"),
        )
        .crossJoin(F.broadcast(tt))
        .select(
            "n_train_pairs",
            F.col("n_eval").cast("long").alias("n_eval_pairs"),
            F.col("n_correct").cast("long").alias("n_correct"),
            F.expr("CAST((1000 * n_correct) div n_eval AS BIGINT)").alias(
                "acc_milli"
            ),
        )
    )


@query(
    "events_halflife_engagement",
    oracle="""
    WITH b AS (
      SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS tmax FROM events
    ),
    d AS (
      SELECT user_id,
             (1000 * CAST(round(value * 100) AS BIGINT))
               // (CAST(1 AS BIGINT) << CAST(least(
                    (tmax - epoch_us(CAST(ts AS TIMESTAMP)))
                      // 604800000000, 40) AS INT)) AS dv
      FROM events, b
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(dv) AS BIGINT) AS engagement_milli
    FROM d GROUP BY user_id
    """,
    tags=("events", "agg", "timeseries"),
)
def events_halflife_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement score with a one-week half-life:
    each event contributes value / 2^age_weeks, so activity decays
    geometrically toward the newest timestamp — the standard freshness
    prior for ranking users (or documents) in curation and retrieval.

    Exactness: the decay is a power of two, so it is an integer SHIFT,
    not a float exp() — value in milli-cents integer-divided by
    (1 << min(age_weeks, 40)); the cap is semantics-free (the largest
    numerator is < 2^37 milli-cents, so any shift past 40 is already
    zero) and keeps the shift inside 64-bit for arbitrarily old data.
    The whole query is 64-bit integer arithmetic;
    no libm, no summation-order sensitivity, bit-identical across
    engines.

    Scale shape: a 1-row max-timestamp broadcast, then one map-side-
    partial user-keyed aggregate.  Nothing else."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(F.max(ts_us).alias("tmax"))
    d = ev.crossJoin(F.broadcast(b)).select(
        "user_id",
        F.expr(
            "(1000 * CAST(round(value * 100) AS BIGINT))"
            " div shiftleft(CAST(1 AS BIGINT),"
            " CAST(least((tmax - unix_micros(CAST(ts AS TIMESTAMP)))"
            " div 604800000000L, 40L) AS INT))"
        ).alias("dv"),
    )
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("dv").cast("long").alias("engagement_milli"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences — the workhorse causal estimator when the
# treatment rollout has a before/after boundary (no reference-repo
# analog; completes the experiment panel next to Welch and CUPED).
# ---------------------------------------------------------------------------

DID_VARIANTS = 2  # deterministic assignment: user_id % DID_VARIANTS


@query(
    "events_did_estimator",
    oracle=f"""
    WITH p AS (
      SELECT user_id % {DID_VARIANTS} AS treat,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    b AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM p),
    g AS (
      SELECT treat,
             CASE WHEN 2 * ts_us >= mn + mx THEN 1 ELSE 0 END AS post,
             COUNT(*) AS n,
             CAST(SUM(cents) AS DECIMAL(38,0)) AS s
      FROM p CROSS JOIN b GROUP BY 1, 2
    ),
    m AS (
      SELECT MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_tp,
             MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
             MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_cp,
             MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0,
             MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s_tp,
             MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s_t0,
             MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s_cp,
             MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s_c0
      FROM g
    ),
    v AS (
      SELECT n_tp, n_t0, n_cp, n_c0,
             CAST(CAST(s_tp AS VARCHAR) AS DOUBLE) / n_tp AS m_tp,
             CAST(CAST(s_t0 AS VARCHAR) AS DOUBLE) / n_t0 AS m_t0,
             CAST(CAST(s_cp AS VARCHAR) AS DOUBLE) / n_cp AS m_cp,
             CAST(CAST(s_c0 AS VARCHAR) AS DOUBLE) / n_c0 AS m_c0
      FROM m
    )
    SELECT CAST(n_tp AS BIGINT) AS n_treat_post, CAST(n_t0 AS BIGINT) AS n_treat_pre,
           CAST(n_cp AS BIGINT) AS n_ctrl_post, CAST(n_c0 AS BIGINT) AS n_ctrl_pre,
           m_tp AS mean_treat_post_cents, m_t0 AS mean_treat_pre_cents,
           m_cp AS mean_ctrl_post_cents, m_c0 AS mean_ctrl_pre_cents,
           (m_tp - m_t0) - (m_cp - m_c0) AS did_cents
    FROM v
    """,
    tags=("agg", "events", "stats", "experiment"),
    bench=True,
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over purchase values: treatment by
    deterministic user parity (user_id % {DID_VARIANTS}, the CUPED
    assignment convention), pre/post split at the exact midpoint of the
    purchase-event time range (2*ts_us >= min+max — all-integer, no
    division).  DiD = (treat_post - treat_pre) - (ctrl_post -
    ctrl_pre): the parallel-trends estimator that strips the secular
    time trend a naive post-only comparison absorbs (Card & Krueger
    1994 shape).

    Float portability (events_welch_ttest recipe): only exact integer
    moments per (treat, post) cell — count and DECIMAL(38,0) cents sum —
    reach the final projection; each decimal enters the double world
    through one correctly-rounded cast (VARCHAR hop in the oracle) and
    the four means combine in an identical op tree, so did_cents is
    bit-identical across engines.

    Scale shape: pushed event_type filter, one 1-row min/max broadcast,
    ONE map-side-partial aggregate keyed by (treat, post) = 4 groups;
    everything after runs on a 4-row relation folded to 1 row.  No
    window, no data-sized join, no Python."""
    d38 = "decimal(38,0)"
    p = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = p.select(
        (F.col("user_id") % DID_VARIANTS).alias("treat"),
        ts_us.alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = p.agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
    g = (
        p.crossJoin(F.broadcast(b))
        .withColumn(
            "post",
            F.when(2 * F.col("ts_us") >= F.col("mn") + F.col("mx"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("treat", "post")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").cast(d38).alias("s"))
    )

    def pick(t: int, post: int, c: str):
        return F.max(F.when((F.col("treat") == t) & (F.col("post") == post), F.col(c)))

    m = g.agg(
        pick(1, 1, "n").alias("n_tp"),
        pick(1, 0, "n").alias("n_t0"),
        pick(0, 1, "n").alias("n_cp"),
        pick(0, 0, "n").alias("n_c0"),
        pick(1, 1, "s").alias("s_tp"),
        pick(1, 0, "s").alias("s_t0"),
        pick(0, 1, "s").alias("s_cp"),
        pick(0, 0, "s").alias("s_c0"),
    )
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    v = m.select(
        "n_tp",
        "n_t0",
        "n_cp",
        "n_c0",
        (dbl(F.col("s_tp")) / F.col("n_tp")).alias("m_tp"),
        (dbl(F.col("s_t0")) / F.col("n_t0")).alias("m_t0"),
        (dbl(F.col("s_cp")) / F.col("n_cp")).alias("m_cp"),
        (dbl(F.col("s_c0")) / F.col("n_c0")).alias("m_c0"),
    )
    return v.select(
        F.col("n_tp").cast("long").alias("n_treat_post"),
        F.col("n_t0").cast("long").alias("n_treat_pre"),
        F.col("n_cp").cast("long").alias("n_ctrl_post"),
        F.col("n_c0").cast("long").alias("n_ctrl_pre"),
        F.col("m_tp").alias("mean_treat_post_cents"),
        F.col("m_t0").alias("mean_treat_pre_cents"),
        F.col("m_cp").alias("mean_ctrl_post_cents"),
        F.col("m_c0").alias("mean_ctrl_pre_cents"),
        ((F.col("m_tp") - F.col("m_t0")) - (F.col("m_cp") - F.col("m_c0"))).alias(
            "did_cents"
        ),
    )


# ---------------------------------------------------------------------------
# Population Stability Index — the ML-ops drift metric between two
# periods of a categorical distribution.
# ---------------------------------------------------------------------------


@query(
    "events_psi_category_drift",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    ),
    b AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM e),
    g AS (
      SELECT event_type,
             SUM(CASE WHEN 2 * ts_us < mn + mx THEN 1 ELSE 0 END) AS n_pre,
             SUM(CASE WHEN 2 * ts_us >= mn + mx THEN 1 ELSE 0 END) AS n_post
      FROM e CROSS JOIN b GROUP BY event_type
    ),
    t AS (SELECT SUM(n_pre) AS tot_pre, SUM(n_post) AS tot_post,
                 COUNT(*) AS k FROM g),
    terms AS (
      SELECT event_type, n_pre, n_post,
             CAST(round((((n_post + 1.0) / (tot_post + k)) - ((n_pre + 1.0) / (tot_pre + k)))
                  * ln(((n_post + 1.0) / (tot_post + k)) / ((n_pre + 1.0) / (tot_pre + k)))
                  * 1000000) AS BIGINT) AS psi_term_micro
      FROM g CROSS JOIN t
    ),
    tot AS (SELECT SUM(psi_term_micro) AS s FROM terms)
    SELECT event_type, CAST(n_pre AS BIGINT) AS n_pre,
           CAST(n_post AS BIGINT) AS n_post,
           psi_term_micro,
           CAST(s AS BIGINT) AS psi_total_micro
    FROM terms CROSS JOIN tot
    """,
    tags=("agg", "events", "stats", "drift"),
)
def events_psi_category_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event stream (midpoint split, the events_did_estimator
    boundary): per event type the PSI term (q - p)·ln(q/p) with
    add-one (Laplace) smoothing so a category that vanishes from one
    period contributes a finite term instead of a division by zero —
    the standard scorecard drift monitor (PSI > 0.25 ≈ major shift).

    Determinism: p and q are exact-integer ratios evaluated in ONE
    shared double expression, integerized to micro-nats (the
    text_perplexity_unigram convention), so terms and total are
    bit-identical across engines.

    Scale shape: one scan, a 1-row min/max broadcast, one map-side-
    partial aggregate keyed by event_type (bounded domain); the PSI
    terms and the total live on a <= #types relation crossJoined
    against two broadcast 1-row aggregates.  No window, no Python."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    b = e.agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
    # The <= #types relation feeds THREE consumers (totals, terms, the
    # grand total); truncate lineage once so the event scan + aggregate
    # run once instead of being re-derived per consumer (the
    # agg_mannwhitney_u convention for tiny fan-out relations).
    g = (
        e.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(2 * F.col("ts_us") < F.col("mn") + F.col("mx"), 1).otherwise(0)
            ).alias("n_pre"),
            F.sum(
                F.when(2 * F.col("ts_us") >= F.col("mn") + F.col("mx"), 1).otherwise(0)
            ).alias("n_post"),
        )
        .localCheckpoint(eager=False)
    )
    t = g.agg(
        F.sum("n_pre").alias("tot_pre"),
        F.sum("n_post").alias("tot_post"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_pre") + F.lit(1.0)) / (F.col("tot_pre") + F.col("k"))
    q = (F.col("n_post") + F.lit(1.0)) / (F.col("tot_post") + F.col("k"))
    terms = g.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        F.round((q - p) * F.log(q / p) * 1000000).cast("long").alias("psi_term_micro"),
    )
    tot = terms.agg(F.sum("psi_term_micro").cast("long").alias("s"))
    return terms.crossJoin(F.broadcast(tot)).select(
        "event_type", "n_pre", "n_post", "psi_term_micro", F.col("s").alias("psi_total_micro")
    )


@query(
    "events_jsd_drift",
    oracle="""
    WITH e AS (
      SELECT event_type, epoch_us(ts) AS ts_us FROM events
    ),
    b AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM e),
    g AS (
      SELECT event_type,
             SUM(CASE WHEN 2 * ts_us < mn + mx THEN 1 ELSE 0 END) AS n_pre,
             SUM(CASE WHEN 2 * ts_us >= mn + mx THEN 1 ELSE 0 END) AS n_post
      FROM e CROSS JOIN b GROUP BY event_type
    ),
    t AS (SELECT SUM(n_pre) AS tot_pre, SUM(n_post) AS tot_post,
                 COUNT(*) AS k FROM g),
    terms AS (
      SELECT event_type, n_pre, n_post,
             CAST(round((
               0.5 * ((n_pre + 1.0) / (tot_pre + k))
                   * ln(((n_pre + 1.0) / (tot_pre + k))
                        / (0.5 * ((n_pre + 1.0) / (tot_pre + k))
                           + 0.5 * ((n_post + 1.0) / (tot_post + k))))
             + 0.5 * ((n_post + 1.0) / (tot_post + k))
                   * ln(((n_post + 1.0) / (tot_post + k))
                        / (0.5 * ((n_pre + 1.0) / (tot_pre + k))
                           + 0.5 * ((n_post + 1.0) / (tot_post + k))))
             ) * 1000000) AS BIGINT) AS jsd_term_micro
      FROM g CROSS JOIN t
    ),
    tot AS (SELECT SUM(jsd_term_micro) AS s FROM terms)
    SELECT event_type, CAST(n_pre AS BIGINT) AS n_pre,
           CAST(n_post AS BIGINT) AS n_post,
           jsd_term_micro,
           CAST(s AS BIGINT) AS jsd_total_micro
    FROM terms CROSS JOIN tot
    """,
    tags=("agg", "events", "stats", "drift"),
)
def events_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the first and second half of
    the event stream (same midpoint split and Laplace smoothing as
    events_psi_category_drift): per category the JSD term
    ½·p·ln(p/m) + ½·q·ln(q/m) with m = (p+q)/2.  JSD complements PSI
    where PSI misbehaves: it is SYMMETRIC, bounded by ln 2, and finite
    even for categories absent from one side pre-smoothing — the
    drift score to alert on when category churn is expected (new event
    types appearing mid-stream), while PSI's unbounded terms make
    better leaderboards for stable vocabularies.

    Determinism: the smoothed p, q, m ratios are evaluated in one
    shared double expression and integerized to micro-nats (the PSI
    convention), bit-identical across engines.

    Scale shape: identical to PSI — one scan, 1-row min/max broadcast,
    one map-side partial aggregate to the <= #types relation, terms and
    total on bounded rows.  No window, no Python."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    b = e.agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
    g = (
        e.crossJoin(F.broadcast(b))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(2 * F.col("ts_us") < F.col("mn") + F.col("mx"), 1).otherwise(0)
            ).alias("n_pre"),
            F.sum(
                F.when(2 * F.col("ts_us") >= F.col("mn") + F.col("mx"), 1).otherwise(0)
            ).alias("n_post"),
        )
        .localCheckpoint(eager=False)
    )
    t = g.agg(
        F.sum("n_pre").alias("tot_pre"),
        F.sum("n_post").alias("tot_post"),
        F.count(F.lit(1)).alias("k"),
    )
    p = (F.col("n_pre") + F.lit(1.0)) / (F.col("tot_pre") + F.col("k"))
    q = (F.col("n_post") + F.lit(1.0)) / (F.col("tot_post") + F.col("k"))
    m = F.lit(0.5) * p + F.lit(0.5) * q
    terms = g.crossJoin(F.broadcast(t)).select(
        "event_type",
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        F.round((F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m)) * 1000000)
        .cast("long")
        .alias("jsd_term_micro"),
    )
    tot = terms.agg(F.sum("jsd_term_micro").cast("long").alias("s"))
    return terms.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_pre",
        "n_post",
        "jsd_term_micro",
        F.col("s").alias("jsd_total_micro"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap — the at-scale bootstrap (Chamandy et al. 2012,
# "Estimating Uncertainty for Massive Data Streams" / Kleiner's BLB
# lineage): resample weights are independent Poisson(1) draws per
# (row, replicate), so a replicate never needs the global row count and
# every weight is computable map-side from the row's own key.
# ---------------------------------------------------------------------------

BOOT_B = 32  # replicates
# Cumulative Poisson(1) CDF thresholds P(X <= k), k = 0..7: a uniform
# u in [0,1) maps to weight w = #{thresholds <= u} (inverse CDF;
# truncated at 8, total mass beyond ~1e-5).  Literals are shortest-repr
# doubles so both engines parse the identical IEEE value.
BOOT_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def _boot_oracle() -> str:
    wsum = " + ".join(f"CAST(u >= {c!r} AS INT)" for c in BOOT_CDF)
    return f"""
    WITH p AS (
      SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    pt AS (
      SELECT COUNT(*) AS n,
             CAST(CAST(CAST(SUM(cents) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS point_mean_cents
      FROM p
    ),
    ex AS (
      SELECT b.b, p.cents,
             ('0x' || substring(md5(CAST(p.event_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 15))::BIGINT
               / 1152921504606846976.0 AS u
      FROM p CROSS JOIN (SELECT unnest(range({BOOT_B})) AS b) b
    ),
    w AS (SELECT b, cents, {wsum} AS w FROM ex),
    g AS (
      SELECT b, SUM(w) AS n_eff,
             CAST(SUM(w * cents) AS DECIMAL(38,0)) AS s
      FROM w GROUP BY b
    )
    SELECT CAST(b AS INT) AS b, CAST(n_eff AS BIGINT) AS n_eff,
           CAST(CAST(s AS VARCHAR) AS DOUBLE) / n_eff AS mean_cents,
           point_mean_cents
    FROM g CROSS JOIN pt
    """


@query(
    "agg_bootstrap_poisson_means",
    oracle=_boot_oracle(),
    tags=("agg", "events", "stats", "sketch"),
    bench=True,
)
def agg_bootstrap_poisson_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{BOOT_B} Poisson-bootstrap replicate means of the purchase value
    (cents) plus the point estimate — the distribution an analyst reads
    a confidence interval off without any normality assumption.  Each
    (row, replicate) weight is Poisson(1) by inverse-CDF over the
    DETERMINISTIC md5-prefix uniform (the agg_kmv_distinct hash
    convention), so the "random" resample is bit-identical across
    engines and runs — a reproducible bootstrap.

    Why Poisson and not multinomial: a true n-out-of-n resample needs
    the global n per draw; Poisson(1) weights are independent per row,
    so every weight is computed MAP-SIDE from the row's own key and the
    replicate index, and the plan is one explode x{BOOT_B} followed by
    a {BOOT_B}-group partial aggregate — the only shape that scales to
    100 TB (Chamandy et al. 2012).  The x{BOOT_B} explode is the
    bootstrap's intrinsic cost, paid in map work, never shuffled: the
    exchange carries {BOOT_B} rows per task.

    Determinism: weights are exact integers, replicate sums are
    DECIMAL(38,0), and each mean is one correctly-rounded decimal->
    double division (VARCHAR hop in the oracle)."""
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", F.floor(F.col("value") * 100).cast("long").alias("cents"))
    )
    pt = p.agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("cents").cast("decimal(38,0)").cast("string").cast("double")
            / F.count(F.lit(1))
        ).alias("point_mean_cents"),
    )
    ex = p.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("b"),
        F.col("event_id"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit("_"),
                        F.col("b").cast("string"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(1 << 60))
    )
    w = ex.select(
        "b",
        "cents",
        sum(
            (u >= F.lit(c)).cast("int") for c in BOOT_CDF
        ).alias("w"),
    )
    g = w.groupBy("b").agg(
        F.sum("w").alias("n_eff"),
        F.sum(F.col("w") * F.col("cents")).cast("decimal(38,0)").alias("s"),
    )
    return g.crossJoin(F.broadcast(pt)).select(
        F.col("b").cast("int").alias("b"),
        F.col("n_eff").cast("long").alias("n_eff"),
        (F.col("s").cast("string").cast("double") / F.col("n_eff")).alias("mean_cents"),
        "point_mean_cents",
    )


# ---------------------------------------------------------------------------
# Uplift by targeting decile — the Qini-curve table behind uplift
# modeling evaluation (Radcliffe 2007): rank users by a targeting
# score, then per decile compare treated vs control response.
# ---------------------------------------------------------------------------


@query(
    "events_uplift_by_decile",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    b AS (SELECT MIN(ts_us) AS mn, MAX(ts_us) AS mx FROM e),
    u AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'view' AND 2 * ts_us < mn + mx
                      THEN 1 ELSE 0 END) AS score,
             CAST(SUM(CASE WHEN event_type = 'purchase' AND 2 * ts_us >= mn + mx
                           THEN cents ELSE 0 END) AS DECIMAL(38,0)) AS resp
      FROM e CROSS JOIN b GROUP BY user_id
    ),
    r AS (
      SELECT user_id % {DID_VARIANTS} AS treat, resp,
             ROW_NUMBER() OVER (ORDER BY score DESC, user_id) - 1 AS idx,
             COUNT(*) OVER () AS n
      FROM u
    ),
    g AS (
      SELECT (10 * idx) // n AS decile, treat, COUNT(*) AS cnt,
             CAST(SUM(resp) AS DECIMAL(38,0)) AS s
      FROM r GROUP BY 1, 2
    ),
    m AS (
      SELECT decile,
             MAX(CASE WHEN treat = 1 THEN cnt END) AS n_treat,
             MAX(CASE WHEN treat = 0 THEN cnt END) AS n_ctrl,
             CAST(CAST(MAX(CASE WHEN treat = 1 THEN s END) AS VARCHAR) AS DOUBLE)
               / MAX(CASE WHEN treat = 1 THEN cnt END) AS m_t,
             CAST(CAST(MAX(CASE WHEN treat = 0 THEN s END) AS VARCHAR) AS DOUBLE)
               / MAX(CASE WHEN treat = 0 THEN cnt END) AS m_c
      FROM g GROUP BY decile
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_treat AS BIGINT) AS n_treat, CAST(n_ctrl AS BIGINT) AS n_ctrl,
           m_t AS mean_treat_cents, m_c AS mean_ctrl_cents,
           m_t - m_c AS uplift_cents
    FROM m
    """,
    tags=("agg", "events", "stats", "experiment", "window"),
)
def events_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift (incremental response) by targeting decile: users ranked
    by pre-period view count (the targeting score), split into 10
    population deciles, and within each decile the post-period purchase
    response of treated (user parity, the events_did_estimator
    assignment) vs control users is compared — the table a Qini curve
    integrates (Radcliffe 2007).  A useful score concentrates positive
    uplift in the top deciles; a useless one is flat.

    Scale shape: ONE event scan collapses to a per-user relation
    (score, response) via a map-side-partial aggregate; the population
    decile comes from the DISTRIBUTED global index over (-score,
    user_id) — `(10*idx) div n`, no single-partition window anywhere —
    and the final aggregate runs on 20 (decile, arm) cells.  Ties in
    the small-count score domain share deciles deterministically via
    the user_id tiebreak.

    Determinism: score and index are exact integers; response sums are
    DECIMAL(38,0) entering doubles through one correctly-rounded cast
    (VARCHAR hop in the oracle); a decile missing one arm yields NULL
    mean and NULL uplift in both engines identically."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = e.agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
    pre = 2 * F.col("ts_us") < F.col("mn") + F.col("mx")
    u = (
        e.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when((F.col("event_type") == "view") & pre, 1).otherwise(0)
            ).alias("score"),
            F.sum(
                F.when((F.col("event_type") == "purchase") & ~pre, F.col("cents")).otherwise(
                    0
                )
            )
            .cast("decimal(38,0)")
            .alias("resp"),
        )
        .withColumn("neg_score", -F.col("score"))
        # the per-user relation feeds the index primitive's multiple
        # consumers (bounds, bucket counts, bucketed rows); truncate
        # lineage once so the event scan + aggregate run once (the
        # events_rfm_segments convention for global-index inputs)
        .localCheckpoint(eager=False)
    )
    r = with_global_index(u, "neg_score", ["user_id"])
    g = (
        r.select(
            F.expr("(10 * _gidx) div _gn").alias("decile"),
            (F.col("user_id") % DID_VARIANTS).alias("treat"),
            "resp",
        )
        .groupBy("decile", "treat")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("resp").cast("decimal(38,0)").alias("s"))
    )

    def pick(t: int, c: str):
        return F.max(F.when(F.col("treat") == t, F.col(c)))

    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    m = g.groupBy("decile").agg(
        pick(1, "cnt").alias("n_treat"),
        pick(0, "cnt").alias("n_ctrl"),
        (dbl(pick(1, "s")) / pick(1, "cnt")).alias("m_t"),
        (dbl(pick(0, "s")) / pick(0, "cnt")).alias("m_c"),
    )
    return m.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_treat").cast("long").alias("n_treat"),
        F.col("n_ctrl").cast("long").alias("n_ctrl"),
        F.col("m_t").alias("mean_treat_cents"),
        F.col("m_c").alias("mean_ctrl_cents"),
        (F.col("m_t") - F.col("m_c")).alias("uplift_cents"),
    )


# ---------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution — the 40/20/40
# credit split the marketing stack runs next to last-touch.
# ---------------------------------------------------------------------------


@query(
    "events_attribution_u_shape",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS conv_id
      FROM events
    ),
    conv AS (SELECT user_id, conv_id FROM seq WHERE event_type = 'purchase'),
    t AS (
      SELECT user_id, conv_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, conv_id
                                ORDER BY ts, event_id) AS pos,
             COUNT(*) OVER (PARTITION BY user_id, conv_id) AS n
      FROM seq WHERE event_type IN ('click', 'view')
    ),
    closed AS (SELECT t.* FROM t JOIN conv USING (user_id, conv_id)),
    credited AS (
      SELECT event_type,
             CASE WHEN n = 1 THEN 1000000
                  WHEN n = 2 THEN 500000
                  WHEN pos = 1 OR pos = n THEN 400000
                  WHEN pos = 2 THEN 200000 // (n - 2) + 200000 - (n - 2) * (200000 // (n - 2))
                  ELSE 200000 // (n - 2) END AS credit
      FROM closed
    ),
    direct AS (
      SELECT COUNT(*) AS n_direct FROM conv
      WHERE NOT EXISTS (SELECT 1 FROM t
                        WHERE t.user_id = conv.user_id AND t.conv_id = conv.conv_id)
    )
    SELECT event_type AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(credit) AS BIGINT) AS credit_micro
    FROM credited GROUP BY event_type
    UNION ALL
    SELECT 'direct', CAST(n_direct AS BIGINT), CAST(n_direct AS BIGINT) * 1000000
    FROM direct WHERE n_direct > 0
    """,
    tags=("window", "events", "agg"),
)
def events_attribution_u_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each purchase
    closes the journey of click/view touches since the user's previous
    purchase; credit splits 40% first touch / 40% last / 20% across the
    middles (100% and 50/50 for 1- and 2-touch journeys; touchless
    purchases fall in the 'direct' bucket) — the standard position
    model next to events_attribution_last_touch's winner-takes-all.

    Exactness: credit is integer MICRO-shares; the middle share uses
    truncating division with the remainder assigned to the FIRST middle
    touch (a deterministic rule both engines replay), so every closed
    journey's credit sums to exactly 1,000,000 — the planted-test
    invariant — and the aggregate is pure BIGINT.

    Scale shape: journeys are built from ONE per-user ordered window
    pass (conv_id = running purchase count), positions from a window
    partitioned by (user, journey); all windows key on user_id —
    no single-partition operator.  The close-check is a broadcast-able
    semi join on (user, conv_id) and the final aggregate has <= #touch
    -type groups."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn(
        "conv_id",
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
                w.rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    conv = seq.where(F.col("event_type") == "purchase").select("user_id", "conv_id")
    wj = W.partitionBy("user_id", "conv_id").orderBy("ts", "event_id")
    wn = W.partitionBy("user_id", "conv_id")
    t = (
        seq.where(F.col("event_type").isin(*ATTR_TOUCH_TYPES))
        .select("user_id", "conv_id", "event_type", "ts", "event_id")
        .withColumn("pos", F.row_number().over(wj))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    closed = t.join(conv, ["user_id", "conv_id"], "semi")
    mid = F.expr("200000 div (n - 2)")
    credit = (
        F.when(F.col("n") == 1, F.lit(1000000))
        .when(F.col("n") == 2, F.lit(500000))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), F.lit(400000))
        .when(F.col("pos") == 2, mid + 200000 - (F.col("n") - 2) * mid)
        .otherwise(mid)
    )
    credited = closed.select("event_type", credit.alias("credit")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.sum("credit").cast("long").alias("credit_micro"),
    ).select(F.col("event_type").alias("touch_type"), "n_touches", "credit_micro")
    direct = (
        conv.join(t.select("user_id", "conv_id"), ["user_id", "conv_id"], "anti")
        .agg(F.count(F.lit(1)).alias("n_direct"))
        .where(F.col("n_direct") > 0)
        .select(
            F.lit("direct").alias("touch_type"),
            F.col("n_direct").cast("long").alias("n_touches"),
            (F.col("n_direct") * 1000000).cast("long").alias("credit_micro"),
        )
    )
    return credited.unionAll(direct)


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch guard — the first sanity check of any A/B
# readout (Fabijan et al. 2019): if the observed assignment split
# deviates from the design ratio, every downstream metric is suspect.
# ---------------------------------------------------------------------------

SRM_CHI2_CRIT_MICRO = 3_841_459  # chi-square 1-df 95th percentile, micro


@query(
    "events_ab_srm_check",
    oracle=f"""
    WITH u AS (
      SELECT DISTINCT user_id, user_id % {DID_VARIANTS} AS variant FROM events
    ),
    c AS (
      SELECT SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_treat,
             SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_ctrl
      FROM u
    )
    SELECT CAST(n_treat AS BIGINT) AS n_treat, CAST(n_ctrl AS BIGINT) AS n_ctrl,
           CAST(round((n_treat - n_ctrl) * (n_treat - n_ctrl) * 1000000.0
                      / (n_treat + n_ctrl)) AS BIGINT) AS chi2_micro,
           round((n_treat - n_ctrl) * (n_treat - n_ctrl) * 1000000.0
                 / (n_treat + n_ctrl)) > {SRM_CHI2_CRIT_MICRO} AS srm_detected
    FROM c
    """,
    tags=("agg", "events", "stats", "experiment"),
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch test for the 50/50 parity assignment
    (the events_did_estimator/CUPED design): chi-square goodness of
    fit with expected n/2 per arm simplifies EXACTLY to
    (n_t - n_c)^2 / (n_t + n_c) — one integer-ratio expression,
    integerized to micro-units and compared against the 1-df 95%
    critical value (3.841).  A triggered flag means the assignment or
    logging pipeline is dropping one arm's users and every A/B metric
    downstream is invalid (Fabijan et al. 2019's top experiment bug).

    Scale shape: one scan -> distinct users (map-side combined) ->
    2-cell conditional count -> 1 row.  No window, no join."""
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id", (F.col("user_id") % DID_VARIANTS).alias("variant"))
        .distinct()
    )
    c = u.agg(
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_treat"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_ctrl"),
    )
    chi2 = F.round(
        (F.col("n_treat") - F.col("n_ctrl"))
        * (F.col("n_treat") - F.col("n_ctrl"))
        * 1000000.0
        / (F.col("n_treat") + F.col("n_ctrl"))
    )
    return c.select(
        F.col("n_treat").cast("long").alias("n_treat"),
        F.col("n_ctrl").cast("long").alias("n_ctrl"),
        chi2.cast("long").alias("chi2_micro"),
        (chi2 > SRM_CHI2_CRIT_MICRO).alias("srm_detected"),
    )


# ---------------------------------------------------------------------------
# Power analysis: minimum detectable effect for the standing A/B design.
# ---------------------------------------------------------------------------

# z_{1-alpha/2} for alpha=0.05 and z_{1-beta} for 80% power — the
# standard design constants, written as shortest-repr doubles so both
# engines parse identical IEEE values.
Z_ALPHA_2 = 1.959963984540054
Z_BETA = 0.8416212335729143


@query(
    "events_power_mde",
    oracle=f"""
    WITH p AS (
      SELECT user_id % {DID_VARIANTS} AS variant,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    g AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS q
      FROM p GROUP BY variant
    ),
    m AS (
      SELECT MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 0 THEN n END) AS n2,
             MAX(CASE WHEN variant = 1 THEN q END) AS q1,
             MAX(CASE WHEN variant = 0 THEN q END) AS q2,
             MAX(CASE WHEN variant = 1 THEN s END) AS s1,
             MAX(CASE WHEN variant = 0 THEN s END) AS s2
      FROM g
    ),
    v AS (
      SELECT n1, n2,
             CAST(CAST(n1 * q1 - s1 * s1 AS VARCHAR) AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * (n1 - 1)) AS var1,
             CAST(CAST(n2 * q2 - s2 * s2 AS VARCHAR) AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * (n2 - 1)) AS var2
      FROM m
    )
    SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n2 AS BIGINT) AS n_ctrl,
           var1 AS var_treat, var2 AS var_ctrl,
           ({Z_ALPHA_2!r} + {Z_BETA!r}) * sqrt(var1 / n1 + var2 / n2) AS mde_cents
    FROM v
    """,
    tags=("agg", "events", "stats", "experiment"),
)
def events_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect of the standing parity A/B at
    alpha = 0.05 / power = 0.80: MDE = (z_0.975 + z_0.80) ·
    sqrt(var_t/n_t + var_c/n_c) over purchase cents — the design
    number an experimenter reads BEFORE launching ("can this test even
    see the effect size we care about?"), completing the experiment
    panel next to SRM, Welch, CUPED, DiD and uplift deciles.

    Float portability: sample variances come from exact DECIMAL(38,0)
    moments via the (n·q - s²)/(n·(n-1)) identity with one
    correctly-rounded cast each (events_welch_ttest recipe); the z
    constants are shortest-repr double literals shared by both
    engines; the final expression is a single identical op tree.

    Scale shape: pushed type filter, ONE 2-group map-side-partial
    moment aggregate, then scalar algebra on a 1-row relation."""
    d38 = "decimal(38,0)"
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            (F.col("user_id") % DID_VARIANTS).alias("variant"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    g = p.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast(d38).alias("s"),
        F.sum(F.col("cents").cast(d38) * F.col("cents")).cast(d38).alias("q"),
    )

    def pick(t: int, c: str):
        return F.max(F.when(F.col("variant") == t, F.col(c)))

    m = g.agg(
        pick(1, "n").alias("n1"),
        pick(0, "n").alias("n2"),
        pick(1, "q").alias("q1"),
        pick(0, "q").alias("q2"),
        pick(1, "s").alias("s1"),
        pick(0, "s").alias("s2"),
    )
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    v = m.select(
        "n1",
        "n2",
        (
            dbl(F.col("n1") * F.col("q1") - F.col("s1") * F.col("s1"))
            / (F.col("n1").cast("double") * (F.col("n1") - 1))
        ).alias("var1"),
        (
            dbl(F.col("n2") * F.col("q2") - F.col("s2") * F.col("s2"))
            / (F.col("n2").cast("double") * (F.col("n2") - 1))
        ).alias("var2"),
    )
    return v.select(
        F.col("n1").cast("long").alias("n_treat"),
        F.col("n2").cast("long").alias("n_ctrl"),
        F.col("var1").alias("var_treat"),
        F.col("var2").alias("var_ctrl"),
        (
            (F.lit(Z_ALPHA_2) + F.lit(Z_BETA))
            * F.sqrt(F.col("var1") / F.col("n1") + F.col("var2") / F.col("n2"))
        ).alias("mde_cents"),
    )


ANYORDER_WINDOW_HOURS = 72


@query(
    "events_funnel_any_order",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT user_id,
             (CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS n_steps,
             t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
             AND greatest(t_view, t_click, t_purchase)
                 - least(t_view, t_click, t_purchase)
                 <= INTERVAL {ANYORDER_WINDOW_HOURS} HOUR AS completed
      FROM firsts
    )
    SELECT n_steps, completed, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM c GROUP BY n_steps, completed
    """,
    tags=("agg", "events"),
)
def events_funnel_any_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANY-ORDER funnel: a user completes when all three step types
    occur within {ANYORDER_WINDOW_HOURS}h of each other, in whatever
    sequence — the unordered counterpart of the strictly-sequenced
    events_window_funnel_3step (product analytics ships both; e.g.
    docs-read/trial/invite onboarding checklists are unordered).

    Scale shape: ONE map-side-partial aggregate collapses each user to
    three first-occurrence timestamps (conditional MIN — no joins, vs
    the ordered funnel's three-way self-join), then pure row-local
    interval algebra and a <= 8-cell final count.  The
    events_conversion_lag_percentiles single-pass trick applied to a
    whole funnel."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    n_steps = (
        F.col("t_view").isNotNull().cast("int")
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    completed = (
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (
            F.unix_micros(F.greatest("t_view", "t_click", "t_purchase").cast("timestamp"))
            - F.unix_micros(F.least("t_view", "t_click", "t_purchase").cast("timestamp"))
            <= ANYORDER_WINDOW_HOURS * 3600 * 1_000_000
        )
    )
    return (
        firsts.select(n_steps.alias("n_steps"), completed.alias("completed"))
        .groupBy("n_steps", "completed")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


# Wald SPRT constants (Wald 1945): H0 p=0.4 vs H1 p=0.6 purchase share,
# alpha=0.05, beta=0.2.  The per-observation log-likelihood increments
# and the decision thresholds are PYTHON-COMPUTED literal doubles, so
# neither engine ever evaluates ln() on data — only IEEE multiply/add on
# exact-integer-valued doubles, bit-identical across engines; decisions
# compare the micro-nat INTEGER against integer thresholds.
SPRT_L1 = 0.4054651081081642  # ln(p1/p0) = ln(1.5)
SPRT_L0 = -0.4054651081081643  # ln((1-p1)/(1-p0)) = ln(2/3)
SPRT_A_MICRO = 2772589  # round(ln((1-beta)/alpha) * 1e6) = ln(16)
SPRT_B_MICRO = -1558145  # round(ln(beta/(1-alpha)) * 1e6)


@query(
    "events_sprt_sequential",
    oracle=f"""
    WITH e AS (
      SELECT (user_id % 2) AS arm, CAST(ts AS DATE) AS d,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS k
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    g AS (
      SELECT arm, d, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS k
      FROM e GROUP BY arm, d
    ),
    cum AS (
      SELECT arm, d,
             SUM(n) OVER (PARTITION BY arm ORDER BY d) AS n_cum,
             SUM(k) OVER (PARTITION BY arm ORDER BY d) AS k_cum
      FROM g
    ),
    llr AS (
      SELECT arm, d, CAST(n_cum AS BIGINT) AS n_cum,
             CAST(k_cum AS BIGINT) AS k_cum,
             CAST(round((CAST(k_cum AS DOUBLE) * {SPRT_L1!r}
                         + CAST(n_cum - k_cum AS DOUBLE) * {SPRT_L0!r})
                        * 1000000) AS BIGINT) AS llr_micro
      FROM cum
    )
    SELECT arm, strftime(d, '%Y-%m-%d') AS day, n_cum, k_cum, llr_micro,
           CASE WHEN llr_micro >= {SPRT_A_MICRO} THEN 'reject_h0'
                WHEN llr_micro <= {SPRT_B_MICRO} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr
    """,
    tags=("events", "experiment", "stats", "window"),
)
def events_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential A/B monitor (Wald 1945; the always-valid
    peeking answer the fixed-horizon t-test family cannot give): per
    arm (user_id % 2, the repo's assignment convention) and calendar
    day, cumulative trials (view+purchase events), cumulative successes
    (purchases), the sequential log-likelihood ratio
    LLR = k·ln(p1/p0) + (n-k)·ln((1-p1)/(1-p0)) in micro-nats, and the
    Wald decision at each day — the dashboard that lets an experimenter
    STOP THE TEST the first day the boundary is crossed instead of
    waiting out the horizon (and unlike repeated t-tests, crossing
    guarantees the alpha/beta the thresholds encode).

    Determinism: the ln() increments and thresholds are Python-computed
    LITERALS (module constants) — the engines only multiply/add exact
    integer counts as doubles in one shared op tree, then integerize to
    micro-nats; decisions compare integers to integer thresholds.

    Scale shape: pushed event_type IN-filter, ONE map-side-partial
    aggregate to the (2 arms x calendar days) relation; the cumulative
    window runs per arm over that bounded relation (never raw events).
    No join, no Python."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            (F.col("user_id") % 2).alias("arm"),
            F.to_date("ts").alias("d"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("k"),
        )
    )
    g = e.groupBy("arm", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("k").cast("long").alias("k")
    )
    w = W.partitionBy("arm").orderBy("d")
    cum = g.select(
        "arm",
        "d",
        F.sum("n").over(w).cast("long").alias("n_cum"),
        F.sum("k").over(w).cast("long").alias("k_cum"),
    )
    llr_micro = F.round(
        (
            F.col("k_cum").cast("double") * F.lit(SPRT_L1)
            + (F.col("n_cum") - F.col("k_cum")).cast("double") * F.lit(SPRT_L0)
        )
        * 1000000
    ).cast("long")
    out = cum.select(
        "arm",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_cum",
        "k_cum",
        llr_micro.alias("llr_micro"),
    )
    return out.select(
        "arm",
        "day",
        "n_cum",
        "k_cum",
        "llr_micro",
        F.when(F.col("llr_micro") >= SPRT_A_MICRO, F.lit("reject_h0"))
        .when(F.col("llr_micro") <= SPRT_B_MICRO, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


# --- bloom-filter semi-join reduction (returning-user screen) ---------------

BLOOM_M = 1048576  # 2^20 bit positions
BLOOM_WORDS = 63  # word width; 1 << 63 overflows DuckDB's BIGINT


def _bloom_pos_sql(key_expr: str, lo: int) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({key_expr} AS VARCHAR)), {lo}, 5)) "
        f"AS BIGINT) % {BLOOM_M}"
    )


@query(
    "events_bloom_returning_users",
    oracle=f"""
    WITH cutoff AS (SELECT CAST(MAX(ts) AS DATE) AS d FROM events),
    hist AS (SELECT DISTINCT user_id FROM events, cutoff WHERE CAST(ts AS DATE) < d),
    hpos AS (
      SELECT {_bloom_pos_sql('user_id', 1)} AS p1,
             {_bloom_pos_sql('user_id', 6)} AS p2
      FROM hist
    ),
    words AS (
      SELECT w, bit_or(b) AS word FROM (
        SELECT p1 // {BLOOM_WORDS} AS w,
               CAST(1 AS BIGINT) << CAST(p1 % {BLOOM_WORDS} AS INT) AS b FROM hpos
        UNION ALL
        SELECT p2 // {BLOOM_WORDS}, CAST(1 AS BIGINT) << CAST(p2 % {BLOOM_WORDS} AS INT)
        FROM hpos
      ) GROUP BY w
    ),
    probe AS (
      SELECT user_id FROM (
        SELECT DISTINCT user_id FROM events, cutoff WHERE CAST(ts AS DATE) = d
      )
      UNION ALL
      SELECT user_id + 10000000 FROM (
        SELECT DISTINCT user_id FROM events, cutoff WHERE CAST(ts AS DATE) = d
      )
    ),
    ppos AS (
      SELECT user_id, {_bloom_pos_sql('user_id', 1)} AS p1,
             {_bloom_pos_sql('user_id', 6)} AS p2
      FROM probe
    )
    SELECT p.user_id,
           COALESCE((w1.word >> CAST(p.p1 % {BLOOM_WORDS} AS INT)) & 1, 0) = 1 AND
           COALESCE((w2.word >> CAST(p.p2 % {BLOOM_WORDS} AS INT)) & 1, 0) = 1
             AS bloom_hit,
           (h.user_id IS NOT NULL) AS is_returning
    FROM ppos p
    LEFT JOIN words w1 ON w1.w = p.p1 // {BLOOM_WORDS}
    LEFT JOIN words w2 ON w2.w = p.p2 // {BLOOM_WORDS}
    LEFT JOIN hist h ON h.user_id = p.user_id
    """,
    tags=("events", "sketch", "join"),
)
def events_bloom_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SEMI-JOIN REDUCTION, evaluated: a 2^20-bit Bloom
    filter (two md5-derived hash positions per key, 63-bit words via
    BIT_OR — the agg_bitmap_distinct word convention) is built over
    every user active BEFORE the last day, then the last day's users
    (plus key-shifted synthetic novels, so the negative path is
    exercised) probe it.  Output is the evaluation ledger: per probe
    key, the bloom verdict AND the exact truth — the no-false-negative
    invariant (bloom_hit >= is_returning) is the planted test.

    Why this is THE 100 TB trick: the words relation is <= m/63 =
    16,645 rows REGARDLESS of history size — it broadcasts forever,
    so a petabyte of history reduces a new batch by one map-side probe
    with zero history shuffle; only bloom-positive keys proceed to the
    exact (expensive) join.  This query keeps the exact join on ALL
    probes because it is measuring the filter (FP accounting), exactly
    as sim_recall_eval keeps brute force to measure the ANN index.

    Mechanics note: probe bits use (word >> pos) & 1 rather than a
    shifted-constant AND, so the 63-bit convention never builds
    1 << 63 on either engine."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg(F.max(F.to_date("ts")).alias("d"))
    with_day = ev.select("user_id", F.to_date("ts").alias("day")).crossJoin(
        F.broadcast(cutoff)
    )
    # hist/today are tiny (O(distinct users)) but feed 2-3 branches
    # each; lazy localCheckpoints truncate the lineage so the events
    # scan + cutoff fold run ONCE, not once per branch (the
    # banded_buckets convention, functions/lsh.py)
    hist = (
        with_day.where(F.col("day") < F.col("d"))
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def pos(lo: int):
        return F.expr(
            f"CAST(conv(substring(md5(CAST(user_id AS STRING)), {lo}, 5), 16, 10) "
            f"AS BIGINT) % {BLOOM_M}"
        )

    hpos = hist.select(pos(1).alias("p1"), pos(6).alias("p2"))
    words = (
        hpos.select(
            (F.col("p1") / BLOOM_WORDS).cast("long").alias("w"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p1 % {BLOOM_WORDS} AS INT))").alias("b"),
        )
        .unionAll(
            hpos.select(
                (F.col("p2") / BLOOM_WORDS).cast("long").alias("w"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(p2 % {BLOOM_WORDS} AS INT))"
                ).alias("b"),
            )
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("word"))
    )
    today = (
        with_day.where(F.col("day") == F.col("d"))
        .select("user_id")
        .distinct()
        .localCheckpoint(eager=False)
    )
    probe = today.unionAll(today.select((F.col("user_id") + 10000000).alias("user_id")))
    ppos = probe.select("user_id", pos(1).alias("p1"), pos(6).alias("p2"))
    w1 = words.select(F.col("w").alias("w1"), F.col("word").alias("word1"))
    w2 = words.select(F.col("w").alias("w2"), F.col("word").alias("word2"))
    hit1 = F.coalesce(
        F.expr(f"(word1 >> CAST(p1 % {BLOOM_WORDS} AS INT)) & 1"), F.lit(0)
    ) == 1
    hit2 = F.coalesce(
        F.expr(f"(word2 >> CAST(p2 % {BLOOM_WORDS} AS INT)) & 1"), F.lit(0)
    ) == 1
    h = hist.select(F.col("user_id").alias("h_uid"))
    return (
        ppos.join(F.broadcast(w1), (ppos.p1 / BLOOM_WORDS).cast("long") == F.col("w1"), "left")
        .join(F.broadcast(w2), (ppos.p2 / BLOOM_WORDS).cast("long") == F.col("w2"), "left")
        .join(h, ppos.user_id == F.col("h_uid"), "left")
        .select(
            "user_id",
            (hit1 & hit2).alias("bloom_hit"),
            F.col("h_uid").isNotNull().alias("is_returning"),
        )
    )


# --- burst detection (rate-ratio screen) ------------------------------------

BURST_RATIO = 2  # flag hours running at >= 2x the type's mean hourly rate


@query(
    "events_burst_hours",
    oracle=f"""
    WITH h AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_hours
      FROM h GROUP BY 1
    )
    SELECT h.event_type, hr AS hour, n, total, n_hours
    FROM h JOIN t USING (event_type)
    WHERE n * n_hours >= {BURST_RATIO} * total
    """,
    tags=("events", "agg", "window"),
)
def events_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection, rate-ratio form: flag the hours in which an
    event type ran at >= {BURST_RATIO}x its own mean hourly rate — the
    first-line traffic-anomaly screen (spike alerting, bot-wave
    triage) and the cheap stand-in for Kleinberg's state machine when
    all you need is WHICH hours burst.

    The test is pure integer cross-multiplication
    (n * n_hours >= {BURST_RATIO} * total): no rate division, no float
    threshold, so both engines agree exactly — the
    ts_anomaly_rolling_zscore convention applied to rates.

    Scale shape: events fold map-side to one row per (type, hour)
    (bounded by the time span, not the event count); the per-type
    totals relation is <= #types rows and broadcasts; flagged hours
    are a filter over the already-bounded hour relation."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = h.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    return h.join(F.broadcast(t), "event_type").where(
        F.col("n") * F.col("n_hours") >= BURST_RATIO * F.col("total")
    ).select("event_type", "hour", "n", "total", "n_hours")


# --- seasonal decomposition (trend / weekday seasonal / residual) -----------

DECOMP_HALF_WIN = 3  # centered 7-day trend window


@query(
    "events_seasonal_decompose",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, d, n,
             CAST(SUM(n) OVER w AS BIGINT) AS wsum,
             CAST(COUNT(*) OVER w AS BIGINT) AS wn
      FROM s
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN {DECOMP_HALF_WIN} PRECEDING AND {DECOMP_HALF_WIN} FOLLOWING)
    ),
    det AS (
      SELECT event_type, d, n, (1000 * wsum) // wn AS trend_milli,
             1000 * n - (1000 * wsum) // wn AS detr_milli,
             dayofweek(d) AS dow
      FROM tr
    ),
    seas AS (
      SELECT event_type, dow, median(detr_milli) AS seasonal_milli
      FROM det GROUP BY 1, 2
    )
    SELECT det.event_type, strftime(det.d, '%Y-%m-%d') AS day, n, trend_milli,
           seasonal_milli, detr_milli - seasonal_milli AS residual_milli
    FROM det JOIN seas ON det.event_type = seas.event_type AND det.dow = seas.dow
    """,
    tags=("events", "window", "agg", "timeseries"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the per-type daily event
    series: trend = centered 7-day moving average, seasonal = per-
    weekday MEDIAN of the detrended series (median, not mean, so one
    outlier day cannot smear into the weekly profile — the robust
    choice STL makes), residual = remainder.  The screen that turns
    'traffic looks weird' into WHICH component moved.

    Determinism: trend is integer milli-units via (1000*sum) div n;
    the weekday median comes from global_index.weighted_quantiles over
    the (type, dow, detr_milli)-count relation — Spark percentile()
    cont semantics == DuckDB quantile_cont(0.5) == median, exact on
    integer inputs (middle-pair average, representable at .5 in a
    double), so seasonal/residual are bit-portable doubles while the
    per-task state is a bucket of DISTINCT values, never raw rows
    (the audit's exact-percentile rule).  Weekday keys differ in
    convention between engines (Sun=1 vs Sun=0) but are
    grouping-internal — only the partition STRUCTURE matters, and it
    is identical.

    Scale shape: events fold map-side to the (type, day) grid, and
    every window/median/join after that runs on grid-sized relations
    (<= types x days rows) — cost is bounded by the calendar, not the
    event volume."""
    s = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-DECOMP_HALF_WIN, DECOMP_HALF_WIN)
    )
    det = s.select(
        "event_type",
        "d",
        "n",
        F.expr(
            f"CAST(1000 * sum(n) OVER (PARTITION BY event_type ORDER BY d "
            f"ROWS BETWEEN {DECOMP_HALF_WIN} PRECEDING AND {DECOMP_HALF_WIN} FOLLOWING) AS BIGINT) div "
            f"count(*) OVER (PARTITION BY event_type ORDER BY d "
            f"ROWS BETWEEN {DECOMP_HALF_WIN} PRECEDING AND {DECOMP_HALF_WIN} FOLLOWING)"
        ).alias("trend_milli"),
        F.dayofweek("d").alias("dow"),
    ).withColumn("detr_milli", 1000 * F.col("n") - F.col("trend_milli"))
    from oracle_parquet_dumper_spark.operators.global_index import weighted_quantiles

    vc = det.groupBy("event_type", "dow", "detr_milli").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    seas = weighted_quantiles(
        vc,
        "detr_milli",
        "cnt",
        group_cols=["event_type", "dow"],
        cont={"seasonal_milli": 0.5},
    )
    return det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        "trend_milli",
        "seasonal_milli",
        (F.col("detr_milli") - F.col("seasonal_milli")).alias("residual_milli"),
    )


# --- seasonal-residual anomaly alerts ---------------------------------------

ANOM_K_MILLI = 3000  # flag |residual| > 3 x residual MAD (milli-scaled)
MAD_FLOOR_MILLI = 1000  # scale floor: a near-constant series has MAD ~ 0,
# and any epsilon residual would alert; floor the scale at one event


@query(
    "events_seasonal_anomaly",
    oracle=f"""
    WITH s AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tr AS (
      SELECT event_type, d, n,
             CAST(SUM(n) OVER w AS BIGINT) AS wsum,
             CAST(COUNT(*) OVER w AS BIGINT) AS wn
      FROM s
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN {DECOMP_HALF_WIN} PRECEDING AND {DECOMP_HALF_WIN} FOLLOWING)
    ),
    det AS (
      SELECT event_type, d, n,
             1000 * n - (1000 * wsum) // wn AS detr_milli,
             dayofweek(d) AS dow
      FROM tr
    ),
    seas AS (
      SELECT event_type, dow, median(detr_milli) AS seasonal_milli
      FROM det GROUP BY 1, 2
    ),
    res AS (
      SELECT det.event_type, det.d, det.n,
             det.detr_milli - seas.seasonal_milli AS residual_milli
      FROM det JOIN seas ON det.event_type = seas.event_type AND det.dow = seas.dow
    ),
    mad AS (
      SELECT event_type, median(abs(residual_milli)) AS mad_milli
      FROM res GROUP BY 1
    )
    SELECT res.event_type, strftime(res.d, '%Y-%m-%d') AS day, n,
           residual_milli, mad_milli
    FROM res JOIN mad ON res.event_type = mad.event_type
    WHERE abs(residual_milli) * 1000 > {ANOM_K_MILLI} * GREATEST(mad_milli, {MAD_FLOOR_MILLI})
    """,
    tags=("events", "window", "agg", "timeseries"),
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-aware anomaly alerts: the days whose DECOMPOSITION
    residual (events_seasonal_decompose) exceeds {ANOM_K_MILLI}/1000 x
    the per-type residual MAD — the alert rule that does not page on
    Mondays for being Mondays (raw z-scores alarm on weekly structure;
    subtracting trend + weekday seasonal first leaves only genuine
    surprises, and MAD keeps one outlier from inflating its own
    threshold).

    Both medians ride global_index.weighted_quantiles over value-count
    relations (exact, distinct-value state); the alert test is
    |residual| * 1000 > K * MAD in exact milli-unit arithmetic
    (doubles at worst x.5, cross-multiplied, no division).

    Scale shape: identical to events_seasonal_decompose — everything
    after the first fold is calendar-bounded."""
    s = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    det = s.select(
        "event_type",
        "d",
        "n",
        (
            1000 * F.col("n")
            - F.expr(
                f"CAST(1000 * sum(n) OVER (PARTITION BY event_type ORDER BY d "
                f"ROWS BETWEEN {DECOMP_HALF_WIN} PRECEDING AND {DECOMP_HALF_WIN} FOLLOWING) AS BIGINT) div "
                f"count(*) OVER (PARTITION BY event_type ORDER BY d "
                f"ROWS BETWEEN {DECOMP_HALF_WIN} PRECEDING AND {DECOMP_HALF_WIN} FOLLOWING)"
            )
        ).alias("detr_milli"),
        F.dayofweek("d").alias("dow"),
    ).localCheckpoint(eager=False)  # grid-sized; feeds seas AND res
    from oracle_parquet_dumper_spark.operators.global_index import weighted_quantiles

    seas = weighted_quantiles(
        det.groupBy("event_type", "dow", "detr_milli").agg(
            F.count(F.lit(1)).alias("cnt")
        ),
        "detr_milli",
        "cnt",
        group_cols=["event_type", "dow"],
        cont={"seasonal_milli": 0.5},
    )
    res = det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "d",
        "n",
        (F.col("detr_milli") - F.col("seasonal_milli")).alias("residual_milli"),
    ).localCheckpoint(eager=False)  # grid-sized; feeds mad AND the alert join
    mad = weighted_quantiles(
        res.select("event_type", F.abs("residual_milli").alias("a"))
        .groupBy("event_type", "a")
        .agg(F.count(F.lit(1)).alias("cnt")),
        "a",
        "cnt",
        group_cols=["event_type"],
        cont={"mad_milli": 0.5},
    )
    return (
        res.join(F.broadcast(mad), "event_type")
        .where(
            F.abs("residual_milli") * 1000
            > ANOM_K_MILLI * F.greatest("mad_milli", F.lit(float(MAD_FLOOR_MILLI)))
        )
        .select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            "residual_milli",
            "mad_milli",
        )
    )


# --- ratio-metric inference: delta method over user clusters (r11) ----------

RM_NUM = "purchase"  # numerator event (value in cents)
RM_DEN = "view"      # denominator event (exposure count)


@query(
    "events_ratio_metric_delta_method",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CASE WHEN event_type = '{RM_NUM}'
                           THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END)
                  AS DECIMAL(38,0)) AS y,
             CAST(SUM(CASE WHEN event_type = '{RM_DEN}' THEN 1 ELSE 0 END)
                  AS DECIMAL(38,0)) AS nv
      FROM events WHERE event_type IN ('{RM_NUM}', '{RM_DEN}')
      GROUP BY user_id
    ),
    m AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(nv) AS DECIMAL(38,0)) AS sn,
             CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(nv * nv) AS DECIMAL(38,0)) AS snn,
             CAST(SUM(y * nv) AS DECIMAL(38,0)) AS syn
      FROM per_user GROUP BY arm
    ),
    v AS (
      SELECT arm, n,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) / CAST(CAST(sn AS VARCHAR) AS DOUBLE) AS r,
             CAST(CAST(sn AS VARCHAR) AS DOUBLE) / n AS nbar,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * (n - 1)) AS vy,
             CAST(CAST(n * snn - sn * sn AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * (n - 1)) AS vn,
             CAST(CAST(n * syn - sy * sn AS VARCHAR) AS DOUBLE)
               / (CAST(n AS DOUBLE) * n * (n - 1)) AS vyn
      FROM m
    )
    SELECT arm, n AS n_users, r AS ratio_cents_per_view,
           sqrt((vy - 2 * r * vyn + r * r * vn) / (n * nbar * nbar)) AS se_delta
    FROM v ORDER BY arm
    """,
    tags=("agg", "events", "stats", "experiment"),
)
def events_ratio_metric_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric A/B inference by the DELTA METHOD over user
    clusters: revenue-per-view R = sum(purchase cents)/sum(views) per
    arm (user_id % 2), with the standard error that accounts for
    within-user correlation of numerator and denominator — the
    variance formula every experimentation platform uses for ratio
    metrics (Deng, Knoblich & Lu, KDD'18), where naive row-level
    variance is WRONG because the randomization unit is the user, not
    the event:

        Var(R) = (var(Y) - 2 R cov(Y,N) + R^2 var(N)) / (n * Nbar^2)

    Float portability (the events_welch_ttest recipe): all inputs are
    EXACT per-user integer moments — per-arm n, and the five sums
    SUM(Y), SUM(N), SUM(Y^2), SUM(N^2), SUM(Y*N) carried as
    DECIMAL(38,0) — combined in one identical final op tree, each
    decimal entering doubles through ONE correctly-rounded cast
    (VARCHAR hop on DuckDB, the registry convention).

    Scale shape: two map-side-partial aggregates — events -> per-user
    (keyed on user_id, the natural high-cardinality key) -> per-arm
    (2 groups); no window, no join, no Python.  At 100 TB the per-user
    fold is the only real shuffle and it is exactly the metric's
    clustering unit."""
    d38 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(RM_NUM, RM_DEN)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == RM_NUM, cents).otherwise(0))
        .cast(d38)
        .alias("y"),
        F.sum(F.when(F.col("event_type") == RM_DEN, 1).otherwise(0))
        .cast(d38)
        .alias("nv"),
    )
    m = per_user.groupBy((F.col("user_id") % 2).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum("nv").cast(d38).alias("sn"),
        F.sum(F.col("y") * F.col("y")).cast(d38).alias("syy"),
        F.sum(F.col("nv") * F.col("nv")).cast(d38).alias("snn"),
        F.sum(F.col("y") * F.col("nv")).cast(d38).alias("syn"),
    )
    dbl = lambda c: c.cast("string").cast("double")  # noqa: E731
    nD = F.col("n").cast("double")
    v = m.select(
        "arm",
        "n",
        (dbl(F.col("sy")) / dbl(F.col("sn"))).alias("r"),
        (dbl(F.col("sn")) / F.col("n")).alias("nbar"),
        (
            dbl(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            / (nD * F.col("n") * (F.col("n") - 1))
        ).alias("vy"),
        (
            dbl(F.col("n") * F.col("snn") - F.col("sn") * F.col("sn"))
            / (nD * F.col("n") * (F.col("n") - 1))
        ).alias("vn"),
        (
            dbl(F.col("n") * F.col("syn") - F.col("sy") * F.col("sn"))
            / (nD * F.col("n") * (F.col("n") - 1))
        ).alias("vyn"),
    )
    r = F.col("r")
    return v.select(
        "arm",
        F.col("n").alias("n_users"),
        r.alias("ratio_cents_per_view"),
        F.sqrt(
            (F.col("vy") - F.lit(2.0) * r * F.col("vyn") + r * r * F.col("vn"))
            / (F.col("n") * F.col("nbar") * F.col("nbar"))
        ).alias("se_delta"),
    ).orderBy("arm")


# --- session bounce rate (30-min sessionization rollup) ---------------------

BOUNCE_GAP_MIN = 30


@query(
    "events_bounce_rate_sessions",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) > {BOUNCE_GAP_MIN * 60} * 1000000::BIGINT
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    ),
    per_sess AS (
      SELECT user_id, sess, MIN(ts) AS t0, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM s GROUP BY user_id, sess
    )
    SELECT strftime(date_trunc('day', t0), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)) // COUNT(*)
             AS BIGINT) AS bounce_ppm
    FROM per_sess GROUP BY 1 ORDER BY day
    """,
    tags=("events", "window", "agg"),
)
def events_bounce_rate_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day session BOUNCE RATE: sessionize each user's event stream
    with a {BOUNCE_GAP_MIN}-minute inactivity gap, then report per
    session-start day how many sessions contained exactly ONE event —
    the engagement-quality headline metric next to DAU
    (events_dau_wau) and session length (window_sessionize_30min,
    which emits the sessions themselves; this is the bounded daily
    rollup a dashboard reads).

    Exact integers end to end: gap comparison in whole seconds, bounce
    share as integer ppm (the div convention).  The (ts, event_id)
    window order makes sessionization deterministic under same-second
    events.

    Scale shape: both windows (lag + running session counter) ride ONE
    user-partitioned sort; the per-session fold reuses the same
    user-keyed clustering (session key is user-local), then the final
    day rollup is calendar-bounded.  No join, no Python."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
                > BOUNCE_GAP_MIN * 60 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    s = o.select(
        "user_id",
        "ts",
        F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("sess"),
    )
    per_sess = s.groupBy("user_id", "sess").agg(
        F.min("ts").alias("t0"), F.count(F.lit(1)).cast("long").alias("n_events")
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_sess.groupBy(
            F.date_format(F.date_trunc("day", "t0"), "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            bounces.cast("long").alias("n_bounces"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))"
                " div COUNT(*) AS BIGINT)"
            ).alias("bounce_ppm"),
        )
        .orderBy("day")
    )


# --- ingest out-of-order diagnostic (watermark sizing) ----------------------


@query(
    "events_out_of_order_lag",
    oracle="""
    WITH o AS (
      SELECT event_type, ts,
             MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS high_water
      FROM events
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts < high_water THEN 1 ELSE 0 END) AS BIGINT)
             AS n_out_of_order,
           CAST(COALESCE(MAX(CASE WHEN ts < high_water
                         THEN date_diff('microsecond', ts, high_water) // 1000000
                         END), 0) AS BIGINT)
             AS max_lag_s,
           CAST((1000000 * SUM(CASE WHEN ts < high_water THEN 1 ELSE 0 END))
             // COUNT(*) AS BIGINT) AS ooo_ppm
    FROM o GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "window", "agg", "streaming"),
)
def events_out_of_order_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order ARRIVAL diagnostic: treating event_id as the ingest
    (arrival) order, how many events arrive with an event-time ts
    EARLIER than the user's running high-water mark, and by how much —
    exactly the distribution a streaming pipeline reads to size its
    watermark (stream_* kernels here use 10-minute delays; this query
    measures what the data actually needs).  Per event_type: event
    count, out-of-order count/ppm, and the worst lag in seconds.

    Exact integers (second-granularity lags, ppm div convention); the
    running max is a ROWS window ending 1 PRECEDING so an event is
    never compared against itself.

    Scale shape: one user-partitioned window sort (user_id is the
    high-cardinality key), then a map-side-partial fold to the
    event-type domain (~12 rows).  No join, no Python."""
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ev = load_table(spark, sf_dir, "events")
    o = ev.select(
        "event_type", "ts", F.max("ts").over(w).alias("high_water")
    )
    late = F.col("ts") < F.col("high_water")
    return (
        o.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_out_of_order"),
            F.coalesce(
                F.max(
                    F.when(
                        late,
                        F.expr(
                            "timestampdiff(MICROSECOND, ts, high_water) div 1000000"
                        ),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("max_lag_s"),
            F.expr(
                "CAST((1000000 * SUM(CASE WHEN ts < high_water THEN 1 ELSE 0 END))"
                " div COUNT(*) AS BIGINT)"
            ).alias("ooo_ppm"),
        )
        .orderBy("event_type")
    )


# --- growth accounting: new / returning / resurrected (r11) -----------------

RES_GAP_DAYS = 7


@query(
    "events_growth_accounting",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    lagged AS (
      SELECT user_id, d,
             lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM days
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN prev_d IS NOT NULL
                         AND date_diff('day', prev_d, d) <= {RES_GAP_DAYS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN prev_d IS NOT NULL
                         AND date_diff('day', prev_d, d) > {RES_GAP_DAYS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
    FROM lagged GROUP BY d ORDER BY day
    """,
    tags=("events", "window", "agg"),
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING: each day's active users split into NEW (first
    day ever), RETURNING (last active <= {RES_GAP_DAYS} days ago) and
    RESURRECTED (a gap longer than {RES_GAP_DAYS} days) — the
    DAU-decomposition every growth team tracks (the "growth accounting
    identity" popularized by the a16z/Social Capital frameworks), and
    the piece events_dau_wau (volume) and events_retention_cohorts
    (fixed cohorts) don't give: WHY today's active count moved.

    Exact integers: day-granularity dates, calendar-day differences,
    counts — no floats anywhere.  The identity n_active = n_new +
    n_returning + n_resurrected holds row-for-row (the three CASEs
    partition the lag domain) and is pinned in tests.

    Scale shape: one distinct on (user, day) — map-side partial over
    the natural user-keyed shuffle; ONE lag window riding the same
    user partitioning; then a calendar-bounded day rollup.  No join,
    no Python."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    lagged = days.select("user_id", "d", F.lag("d").over(w).alias("prev_d"))
    gap = F.datediff("d", "prev_d")
    return (
        lagged.groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("prev_d").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(
                F.when(F.col("prev_d").isNotNull() & (gap <= RES_GAP_DAYS), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_returning"),
            F.sum(
                F.when(F.col("prev_d").isNotNull() & (gap > RES_GAP_DAYS), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_resurrected"),
        )
        .orderBy("day")
    )


# --- DAU/MAU stickiness (rolling 28-day distinct actives, r11) --------------

MAU_WINDOW_DAYS = 28


@query(
    "events_stickiness_dau_mau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    obs AS (SELECT DISTINCT d FROM ud),
    support AS (
      SELECT ud.user_id, ud.d + CAST(i.i AS INTEGER) AS day_at
      FROM ud, LATERAL unnest(generate_series(0, {MAU_WINDOW_DAYS - 1})) AS i(i)
    ),
    mau AS (
      SELECT s.day_at AS d, CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS mau
      FROM support s JOIN obs ON obs.d = s.day_at
      GROUP BY s.day_at
    ),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, mau.mau,
           CAST((1000000 * dau.dau) // mau.mau AS BIGINT) AS stickiness_ppm
    FROM dau JOIN mau ON dau.d = mau.d
    ORDER BY day
    """,
    tags=("events", "agg", "join"),
    bench=True,  # standing number for the bounded support-explode rolling distinct
)
def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per day: daily actives over trailing
    {MAU_WINDOW_DAYS}-day actives — the engagement-quality ratio (a
    product whose users show up 20 of 28 days has stickiness ~0.7; a
    monthly-bill checker ~0.04) that events_dau_wau's fixed-window
    counts don't normalize into.

    The rolling DISTINCT is the hard part at scale: a naive sliding
    window would re-scan {MAU_WINDOW_DAYS} days of events per output
    day.  Here each (user, active-day) row SUPPORTS the
    {MAU_WINDOW_DAYS} calendar days it counts toward — a bounded
    explode (constant x{MAU_WINDOW_DAYS} amplification of the
    user-day relation, NOT of events) — and one distinct-count per
    day closes the window.  Supported days outside the observed
    calendar are semi-joined away so both engines emit the same day
    set.  Exact integers; ppm by integer division.

    Scale shape: events fold to user-days once (map-side partial on
    the user-day key); the x{MAU_WINDOW_DAYS} support explode is
    row-local; the per-day distinct shuffles (day, user) pairs — the
    same order of magnitude as the user-day relation itself.  No
    window function, no per-day rescans."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    obs = ud.select("d").distinct()
    support = ud.select(
        "user_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {MAU_WINDOW_DAYS - 1}),"
                " i -> date_add(d, i))"
            )
        ).alias("day_at"),
    )
    mau = (
        support.join(obs.withColumnRenamed("d", "day_at"), "day_at", "left_semi")
        .groupBy("day_at")
        .agg(F.count_distinct("user_id").cast("long").alias("mau"))
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    return (
        dau.join(mau, dau.d == mau.day_at)
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            F.expr("CAST((1000000 * dau) div mau AS BIGINT)").alias("stickiness_ppm"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Fixed-grid periodogram (round 12)
# ---------------------------------------------------------------------------

# Candidate cycle lengths in HOURS (quarter-day, half-day, daily, weekly):
# spectral power at the fundamental frequency of each tells an analyst
# which seasonality actually dominates the event stream.
PERIODOGRAM_PERIODS = (6, 12, 24, 168)
# cos/sin are quantized to integer MICRO-UNITS before any aggregation —
# the PR_SCALE convention (graph.py): libm cos/sin may differ in the
# last ulp across engines, and summing doubles is order-dependent, so
# the only portable form is ROUND(trig * 1e6) -> exact integer sums.
# A 1-ulp libm disagreement flips the rounded integer only if cos*1e6
# sits within 1 ulp of a .5 boundary (measure-zero; the angle grid has
# < 200 distinct values, swept green at 4 SFs).
TRIG_SCALE = 1_000_000

_PERIODOGRAM_SQL = f"""
    WITH hrs AS MATERIALIZED (
      SELECT CAST(date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            date_trunc('hour', ts)) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    terms AS (
      SELECT p.p, h.x,
             CAST(ROUND(cos(2 * pi() * (h.t % p.p) / p.p) * {TRIG_SCALE})
                  AS BIGINT) AS c6,
             CAST(ROUND(sin(2 * pi() * (h.t % p.p) / p.p) * {TRIG_SCALE})
                  AS BIGINT) AS s6
      FROM hrs h CROSS JOIN (VALUES (6), (12), (24), (168)) p(p)
    ),
    agg AS (
      SELECT p AS period_hours,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(x) AS BIGINT) AS total_events,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(c6 AS DECIMAL(8,0))) AS sc,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(s6 AS DECIMAL(8,0))) AS ss
      FROM terms GROUP BY 1
    )
    SELECT period_hours, n_hours, total_events,
           CAST(sc AS BIGINT) AS s_cos6, CAST(ss AS BIGINT) AS s_sin6,
           ((CAST(CAST(sc AS VARCHAR) AS DOUBLE) / {TRIG_SCALE})
              * (CAST(CAST(sc AS VARCHAR) AS DOUBLE) / {TRIG_SCALE})
            + (CAST(CAST(ss AS VARCHAR) AS DOUBLE) / {TRIG_SCALE})
              * (CAST(CAST(ss AS VARCHAR) AS DOUBLE) / {TRIG_SCALE}))
           / n_hours AS power
    FROM agg ORDER BY period_hours
    """


@query(
    "ts_periodogram_fixed_grid",
    oracle=_PERIODOGRAM_SQL,
    tags=("timeseries", "agg", "stats"),
)
def ts_periodogram_fixed_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier spectral power of the hourly event-count series
    at a FIXED grid of candidate cycle lengths (6 h, 12 h, 24 h, 1 week)
    — the classical periodogram P(f) = ((Σx·cos)² + (Σx·sin)²)/N restricted
    to the periods an analyst actually asks about, which is what makes
    it both scale-safe (4 output rows regardless of data size) and
    oracle-checkable (the trig inputs 2πj/p come from < 200 distinct
    rational angles, quantized to exact integer micro-units — see
    TRIG_SCALE note; every aggregation is then exact DECIMAL).

    Scale shape: ONE map-side-partial groupBy to hourly counts (the
    calendar-bounded relation every ts_* query reduces to), a 4-way
    constant explode, and a 4-group aggregate — no window, no join
    against data-sized relations.  At 100 TB the hourly rollup is the
    only shuffle and its cardinality is the calendar, not the data."""
    ev = load_table(spark, sf_dir, "events")
    hrs = (
        ev.select(
            F.expr(
                "timestampdiff(HOUR, TIMESTAMP'2024-01-01 00:00:00', "
                "date_trunc('hour', ts))"
            ).cast("long").alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    periods = F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS])
    terms = hrs.select(
        "t", "x", F.explode(periods).alias("p")
    ).select(
        "p",
        "x",
        F.round(
            F.cos(F.lit(2.0) * F.lit(math.pi) * (F.col("t") % F.col("p")) / F.col("p"))
            * TRIG_SCALE
        ).cast("long").alias("c6"),
        F.round(
            F.sin(F.lit(2.0) * F.lit(math.pi) * (F.col("t") % F.col("p")) / F.col("p"))
            * TRIG_SCALE
        ).cast("long").alias("s6"),
    )
    agg = terms.groupBy(F.col("p").alias("period_hours")).agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("x").cast("long").alias("total_events"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("c6").cast("decimal(8,0)")).alias("sc"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("s6").cast("decimal(8,0)")).alias("ss"),
    )
    scd = F.col("sc").cast("double") / TRIG_SCALE
    ssd = F.col("ss").cast("double") / TRIG_SCALE
    return agg.select(
        "period_hours",
        "n_hours",
        "total_events",
        F.col("sc").cast("long").alias("s_cos6"),
        F.col("ss").cast("long").alias("s_sin6"),
        ((scd * scd + ssd * ssd) / F.col("n_hours")).alias("power"),
    ).orderBy("period_hours")


# ---------------------------------------------------------------------------
# Engagement concentration — Lorenz top-share points (round 12)
# ---------------------------------------------------------------------------

CONC_TIERS = ((1, "top_1pct"), (10, "top_10pct"), (50, "top_50pct"))


@query(
    "events_engagement_concentration",
    oracle=f"""
    WITH uc AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY c DESC, user_id) AS r,
             SUM(c) OVER (PARTITION BY event_type
                          ORDER BY c DESC, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM uc
    ),
    stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(c) AS BIGINT) AS total_events
      FROM uc GROUP BY 1
    ),
    tiers AS (
      SELECT s.event_type, s.n_users, s.total_events, t.pct, t.tier,
             GREATEST(1, (s.n_users * t.pct) // 100) AS k
      FROM stats s CROSS JOIN (VALUES {", ".join(f"({p}, '{name}')" for p, name in CONC_TIERS)}) t(pct, tier)
    )
    SELECT t.event_type, t.tier, t.n_users, CAST(t.k AS BIGINT) AS k_users,
           t.total_events, CAST(r.cum AS BIGINT) AS events_from_top,
           CAST(r.cum * 1000000 // t.total_events AS BIGINT) AS share_ppm
    FROM tiers t JOIN ranked r ON r.event_type = t.event_type AND r.r = t.k
    ORDER BY t.event_type, t.tier
    """,
    tags=("events", "window", "agg"),
)
def events_engagement_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz top-share points per event type: what share of the type's
    volume comes from its top 1% / 10% / 50% most-active users — the
    concentration diagnostic behind both abuse review (one user = half
    the traffic?) and skew planning (these ARE the hot keys a salted
    aggregate defends against).

    Exact integers end to end: per-user counts, a (count DESC, user_id)
    rank + running sum INSIDE each event_type partition, tier cutoffs
    by floor division, and a ppm share by integer floor division in
    DECIMAL(38,0) (cum*1e6 wraps BIGINT past ~9.2e12 events per type —
    the same headroom widening profile_gini_concentration carries;
    ADVICE r12) — no float anywhere, bit-exact oracle.

    Scale shape (round-13 rewrite): the map-side-partial (type, user)
    groupBy is the only data-sized shuffle; the per-type rank and
    running sum then come from the weighted bucket-offset global index
    (value = -c so the index ascends the DESC order, weight = c for the
    running sum) — NOT a window partitioned only by the ~12-value type
    domain.  The rollup already deferred that hazard by orders of
    magnitude (measured 1.17x/decade, SCALING.md r12), but at extreme
    user counts the rollup is user-sized and the window would cap
    parallelism at |types|; the index form stays bucket-parallel.
    Tiers is a bounded 3-way constant explode over the ~12-row stats
    relation, and the final join keys on (type, rank) against exactly
    3 ranks per type."""
    from oracle_parquet_dumper_spark.operators.global_index import with_global_index

    ev = load_table(spark, sf_dir, "events")
    # the (type, user) rollup feeds THREE consumers (index bounds, the
    # bucketed index join, stats); plan-level exchange reuse does not
    # fire across their differently-pruned subtrees, so the rollup is
    # lazily checkpointed once — the audit's exchange budget caught the
    # 5x events re-scan of the uncheckpointed form.
    uc = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("_negc", -F.col("c"))
        .localCheckpoint(eager=False)
    )
    ranked = with_global_index(
        uc,
        "_negc",
        ["user_id"],
        group_cols=["event_type"],
        weight_col="c",
    ).select(
        "event_type",
        "c",
        (F.col("_gidx") + 1).alias("r"),
        F.col("_gcum").alias("cum"),
    )
    stats = uc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("c").cast("long").alias("total_events"),
    )
    tiers_arr = F.array(
        *[
            F.struct(F.lit(p).alias("pct"), F.lit(name).alias("tier"))
            for p, name in CONC_TIERS
        ]
    )
    tiers = stats.select(
        "event_type",
        "n_users",
        "total_events",
        F.explode(tiers_arr).alias("t"),
    ).select(
        "event_type",
        "n_users",
        "total_events",
        F.col("t.tier").alias("tier"),
        F.greatest(F.lit(1).cast("long"), F.expr("(n_users * t.pct) div 100")).alias("k_users"),
    )
    r2 = ranked.select(
        F.col("event_type").alias("r_type"), F.col("r").alias("rr"), "cum"
    )
    return (
        tiers.join(
            r2,
            (F.col("event_type") == F.col("r_type")) & (F.col("rr") == F.col("k_users")),
        )
        .select(
            "event_type",
            "tier",
            "n_users",
            "k_users",
            "total_events",
            F.col("cum").cast("long").alias("events_from_top"),
            # widen BEFORE the multiply: cum*1e6 wraps int64 past ~9.2e12
            # events per type; DECIMAL(38,0) `div` truncates toward zero
            # exactly like DuckDB's hugeint `//` on the non-negative
            # operands here (probed r12, memory gotcha)
            F.expr("CAST(cum AS DECIMAL(38,0)) * 1000000 div total_events")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("event_type", "tier")
    )


# ---------------------------------------------------------------------------
# Multi-lag autocorrelation (round 12)
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 3, 7)


@query(
    "ts_acf_multi_lag",
    oracle=f"""
    WITH daily AS MATERIALIZED (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily
    ),
    pairs AS (
      SELECT l.lag, a.x AS xa, b.x AS xb
      FROM daily a
      CROSS JOIN (VALUES {", ".join(f"({k})" for k in ACF_LAGS)}) l(lag)
      JOIN daily b ON b.t = a.t + l.lag
    ),
    per AS (
      SELECT lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(xa * xb) AS BIGINT) AS sxy,
             CAST(SUM(xa) AS BIGINT) AS sa,
             CAST(SUM(xb) AS BIGINT) AS sb
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, g.n AS n_days, per.n_pairs,
           (CAST(sxy AS DOUBLE)
              - (CAST(sx AS DOUBLE) / g.n) * (CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE))
              + per.n_pairs * (CAST(sx AS DOUBLE) / g.n) * (CAST(sx AS DOUBLE) / g.n))
           / (CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / g.n) AS acf
    FROM per CROSS JOIN g
    ORDER BY lag
    """,
    tags=("timeseries", "agg", "stats"),
)
def ts_acf_multi_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags
    {ACF_LAGS} in ONE pass — the correlogram view behind seasonality
    and mean-reversion reads (ts_autocorr_lag1 generalized: all lags
    share one daily rollup and one global-moment fold; the standard
    estimator normalizes every lag by the FULL-series variance, so the
    denominator is computed once).  Calendar gaps are skipped, not
    zero-filled (pairs join on t+lag over observed days) — the
    ts_gapfill_interpolate convention.

    Determinism: daily counts are integers; per-lag Σxy/Σx/Σx̄ and the
    global moments are exact integer sums crossing to double once; the
    mean-centering identity is then one shared IEEE tree.

    Scale shape: the daily rollup is the only data-sized shuffle
    (map-side partial, calendar-bounded output); the lag self-join and
    both folds run on the day-grid relation."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    g = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    lags = F.explode(F.array(*[F.lit(k) for k in ACF_LAGS])).alias("lag")
    a = daily.select("t", F.col("x").alias("xa"), lags)
    b = daily.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("tb") == F.col("t") + F.col("lag"))
    per = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sxy"),
        F.sum("xa").cast("long").alias("sa"),
        F.sum("xb").cast("long").alias("sb"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").alias("n_days"),
            "n_pairs",
            (
                (
                    F.col("sxy").cast("double")
                    - mean * (F.col("sa").cast("double") + F.col("sb").cast("double"))
                    + F.col("n_pairs") * mean * mean
                )
                / (
                    F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double") / F.col("n")
                )
            ).alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Mann–Kendall trend test (round 12)
# ---------------------------------------------------------------------------
@query(
    "agg_mann_kendall_trend",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON b.t > a.t
    ),
    n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
    ties AS (
      SELECT CAST(COALESCE(SUM(c * (c - 1) * (2 * c + 5)), 0) AS BIGINT) AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY x) g
      WHERE c > 1
    )
    SELECT n AS n_days, s_stat,
           CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var_18,
           CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1)
                     / sqrt((CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)) / 18)
                WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1)
                     / sqrt((CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)) / 18)
                ELSE 0.0 END AS z_score
    FROM s CROSS JOIN n1 CROSS JOIN ties
    """,
    tags=("timeseries", "agg", "stats"),
)
def agg_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall nonparametric trend test on the daily event-count
    series: S = Σ_{i<j} sign(x_j − x_i), tie-corrected variance
    n(n−1)(2n+5)/18 − Σ_t t(t−1)(2t+5)/18, continuity-corrected Z —
    the distribution-free "is traffic trending?" answer (|Z| > 1.96 ≈
    95%), robust to the outliers and non-normality that break an OLS
    slope test.

    The O(days²) pair join is over the CALENDAR-BOUNDED day grid, not
    the data — a decade of days is 3650 rows / ~6.7M sign pairs
    regardless of event volume, the same boundedness argument as every
    ts_* day-grid query.  S, n and the tie term are exact integers;
    Z is assembled from them in one shared IEEE tree (the /18 lives
    inside the sqrt on both engines).

    Scale shape: one map-side-partial daily rollup (the only data-sized
    shuffle), then grid-sized joins and three 1-row folds."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    a = daily.select(F.col("t").alias("ta"), F.col("x").alias("xa"))
    b = daily.select(F.col("t").alias("tb"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("tb") > F.col("ta"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n1 = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ).cast("long")
    sd = F.sqrt(var18.cast("double") / 18)
    return (
        s.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            var18.alias("var_18"),
            F.when(F.col("s_stat") > 0, (F.col("s_stat").cast("double") - 1) / sd)
            .when(F.col("s_stat") < 0, (F.col("s_stat").cast("double") + 1) / sd)
            .otherwise(F.lit(0.0))
            .alias("z_score"),
        )
    )


# ---------------------------------------------------------------------------
# Time-decay attribution (round 12)
# ---------------------------------------------------------------------------

ATTR_DECAY_LOOKBACK_DAYS = 7
ATTR_DECAY_SCALE = 1_000_000


@query(
    "events_attribution_time_decay",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id AS pid, epoch_us(CAST(ts AS TIMESTAMP)) AS p_us,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             event_type AS touch_type
      FROM events WHERE event_type IN ('click', 'view')
    ),
    j AS (
      SELECT p.pid, p.cents, t.touch_type,
             CAST({ATTR_DECAY_SCALE} //
                  (1 + (p.p_us - t.t_us) // 86400000000) AS BIGINT) AS w
      FROM p LEFT JOIN t
        ON t.user_id = p.user_id
       AND t.t_us < p.p_us
       AND t.t_us >= p.p_us - {ATTR_DECAY_LOOKBACK_DAYS}::BIGINT * 86400000000
    ),
    c AS (
      SELECT pid, cents, touch_type, w,
             CAST(SUM(w) OVER (PARTITION BY pid) AS BIGINT) AS tw
      FROM j
    )
    SELECT COALESCE(touch_type, 'direct') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(CASE WHEN touch_type IS NULL THEN cents
                         ELSE CAST(cents AS HUGEINT) * w // tw END)
                AS BIGINT) AS credited_cents
    FROM c GROUP BY 1 ORDER BY touch_type
    """,
    tags=("events", "window", "join", "agg"),
)
def events_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution, completing the family (last-touch /
    U-shape / decay): every touch in the {ATTR_DECAY_LOOKBACK_DAYS}-day
    window before a purchase earns credit that DECAYS with age, and the
    purchase's cents are split in proportion.

    The decay is harmonic — weight = {ATTR_DECAY_SCALE} div (1 +
    days_back) — rather than the textbook 2^(−Δ/halflife): an exponent
    would put pow() (libm, last-ulp-divergent) inside a ROUND on ~10^5
    distinct deltas, while the reciprocal form keeps EVERY number in
    the query an exact integer (weights, per-purchase weight total via
    a pid-partitioned window, and floor-division credit splitting).
    Floor division under-credits each channel by < 1 cent per
    (purchase, touch) pair — the residue stays unassigned by design.
    Purchases with no prior touch in the window credit 'direct' in
    full.

    Scale shape: one user-keyed range join with a bounded
    {ATTR_DECAY_LOOKBACK_DAYS}-day lookback (the join explosion is
    bounded by touches-per-user-week, not history length), one
    purchase-keyed window over that bounded fan-out, one bounded-domain
    channel rollup."""
    ev = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; session TZ is UTC so the cast is the identity
    # instant and unix_micros is well-defined (the ts_us convention above)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        us.alias("p_us"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.where(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        us.alias("t_us"),
        F.col("event_type").alias("touch_type"),
    )
    lookback_us = ATTR_DECAY_LOOKBACK_DAYS * 86_400_000_000
    j = p.join(
        t,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - F.lit(lookback_us)),
        "left",
    ).select(
        "pid",
        "cents",
        "touch_type",
        F.expr(
            f"CAST({ATTR_DECAY_SCALE} div (1 + (p_us - t_us) div 86400000000) AS BIGINT)"
        ).alias("w"),
    )
    c = j.select(
        "pid",
        "cents",
        "touch_type",
        "w",
        F.sum("w").over(W.partitionBy("pid")).cast("long").alias("tw"),
    )
    return (
        c.groupBy(F.coalesce("touch_type", F.lit("direct")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            F.sum(
                F.when(F.col("touch_type").isNull(), F.col("cents")).otherwise(
                    F.expr("CAST(cents AS DECIMAL(38,0)) * w div tw")
                )
            )
            .cast("long")
            .alias("credited_cents"),
        )
        .orderBy("touch_type")
    )
