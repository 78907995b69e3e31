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
