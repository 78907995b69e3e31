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

from pyspark.sql import DataFrame, SparkSession
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

    Scale shape: the event log is reduced map-side FIRST — the partial
    (user_id, hour) max combines before anything shuffles, so both
    exchanges move per-hour rows, not raw events.  Every later stage
    keys on a user_id prefix (bounds agg, spine join, both window
    frames), so the join output's user_id partitioning feeds the window
    sorts with no further exchange; the spine explode is map-side over
    the one-row-per-user bounds relation.
    The hour bucket value is MAX(value) (order-independent, bit-exact
    cross-engine); the interpolation arithmetic mirrors the oracle
    expression shape exactly so both engines emit identical doubles.
    No reference counterpart (the reference exports tables as-is,
    main.py:144-146); Part B timeseries extension."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id") % GAPFILL_USER_MOD == GAPFILL_USER_REM
    )
    present = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.max("value").alias("v"))
    spine = (
        present.groupBy("user_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "user_id",
            F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    wo = W.partitionBy("user_id").orderBy("h")
    g = spine.join(present, ["user_id", "h"], "left").withColumn(
        "idx", F.row_number().over(wo)
    )
    wp = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    wn = wo.rowsBetween(W.currentRow, W.unboundedFollowing)
    idx_if_present = F.when(F.col("v").isNotNull(), F.col("idx"))
    f = g.select(
        "user_id",
        "h",
        "v",
        "idx",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(idx_if_present, ignorenulls=True).over(wp).alias("pi"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(idx_if_present, ignorenulls=True).over(wn).alias("ni"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("idx") - F.col("pi")).cast("double")
        / (F.col("ni") - F.col("pi")).cast("double")
    )
    return f.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:00").alias("hour"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
        .alias("v_filled"),
        F.when(F.col("v").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_present"),
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
    tags=("window", "events", "stats", "timeseries"),
)
def events_inter_arrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival latency distribution: per event type, exact
    p50/p90/p99/max of the seconds between a user's consecutive events
    of that type — the ops-dashboard staple (think: time between
    heartbeats, purchases, errors).

    Gaps are integer seconds from one lag() pass keyed by (user_id,
    event_type); the exact interpolated percentiles reuse the proven
    Spark percentile == DuckDB quantile_cont convention
    (agg_percentile_exact).  Two exchanges: the lag window's
    (user, type) shuffle, then a K-group percentile aggregate — the
    percentile state is per-group sorted gaps, bounded by each group's
    gap count; for truly unbounded groups the approx_percentile twin
    (agg_approx) is the documented fallback."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.percentile("gap_s", 0.5).alias("p50_s"),
        F.percentile("gap_s", 0.9).alias("p90_s"),
        F.percentile("gap_s", 0.99).alias("p99_s"),
        F.max("gap_s").cast("long").alias("max_s"),
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
