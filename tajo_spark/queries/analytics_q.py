"""Event-analytics queries: ordered funnels and pivot tables.

Beyond-reference capability (the reference has neither a funnel
primitive nor PIVOT — SURVEY.md §2 inventory ends at classic
relational ops). Both are pure DataFrame compositions: keyed joins +
conditional aggregation, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tajo_spark.catalog import load_table
from tajo_spark.queries.registry import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "events_funnel",
    "analytics",
    doc="Ordered 3-step funnel view→click→purchase: each stage is the "
    "user's earliest qualifying event STRICTLY AFTER the previous "
    "stage's timestamp. Per-stage min-aggregation keyed on user_id — "
    "every join/agg shuffles on the same key, so at scale the chain is "
    "one partitioning reused across stages.",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS v_ts FROM events
            WHERE event_type = 'view' GROUP BY user_id),
        c AS (
            SELECT e.user_id, min(e.ts) AS c_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.v_ts
            GROUP BY e.user_id),
        p AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
            GROUP BY e.user_id)
        SELECT '1_view' AS stage, count(*) AS n_users FROM v
        UNION ALL
        SELECT '2_click' AS stage, count(*) AS n_users FROM c
        UNION ALL
        SELECT '3_purchase' AS stage, count(*) AS n_users FROM p
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )

    return (
        stage(v, "1_view").unionAll(stage(c, "2_click")).unionAll(
            stage(p, "3_purchase")
        )
    )


@query(
    "events_pivot_type_counts",
    "analytics",
    doc="PIVOT: per-user event counts fanned into one column per event "
    "type. The pivot value list is EXPLICIT — with it, Spark skips the "
    "extra distinct-scan job and the output schema is static (the only "
    "scale-safe way to pivot). Superset: reference has no PIVOT.",
    oracle="""
        SELECT user_id,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        FROM events GROUP BY user_id
    """,
)
def events_pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "events_retention_cohorts",
    "analytics",
    doc="Weekly cohort retention matrix: users grouped by first-active "
    "week, activity counted at each week offset — the standard "
    "retention triangle. Shuffles: distinct (user, week), min-week per "
    "user (both partial-agg'd), user-keyed join, final groupBy. Week "
    "offsets are exact multiples of 7 days because both sides are "
    "Monday-truncated.",
    oracle="""
        WITH uw AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', ts) AS wk
            FROM events),
        coh AS (
            SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY user_id)
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, u.wk) / 7 AS BIGINT)
                   AS week_offset,
               count(DISTINCT u.user_id) AS active_users
        FROM uw u JOIN coh c USING (user_id)
        GROUP BY c.cohort_week, week_offset
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    uw = events.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    coh = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    return (
        uw.join(coh, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
