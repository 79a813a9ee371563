"""Driver-facing relational/temporal queries over the ``events`` table,
with paired DuckDB oracle SQL.

Oracle design notes:

- sessionization / as-of / range join / top-k are deterministic relational
  ops — the oracles recompute them with DuckDB's independent machinery
  (native ``ASOF JOIN``, a plain inequality join instead of the bucketed
  rewrite, the same window SQL for sessions).
- double sums are decimal-cast on both engines (partition-order-dependent
  float summation would flip the value hash).
- ``approx_distinct_daily`` is probabilistic (HLL++) -> no oracle entry;
  tests assert relative error vs the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import relational as rel


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # single tiny file at test SFs: spread rows so windows/joins parallelize
    return df.repartition(spark.sparkContext.defaultParallelism)


def q_sessionized_events(spark, sf_dir):
    # presentation sort lives in the wrapper: library callers of the
    # operator get the unsorted frame (no global sort at scale)
    return rel.sessionize(_events(spark, sf_dir)).orderBy(
        "user_id", "ts", "event_id"
    )


def q_session_stats(spark, sf_dir):
    # presentation sort in the wrapper only: the per-session rollup is
    # corpus-scale at 10^12 turns, a global sort there is a scale-killer
    return rel.session_stats(_events(spark, sf_dir)).orderBy(
        "user_id", "session_seq"
    )


def q_asof_error_click(spark, sf_dir):
    return rel.asof_join(_events(spark, sf_dir), "error", "click").orderBy(
        "event_id"
    )


def q_range_follow_counts(spark, sf_dir):
    return rel.range_join_follow_counts(_events(spark, sf_dir)).orderBy(
        "event_id"
    )


def q_topk_users_per_type(spark, sf_dir):
    return rel.topk_users_per_type(_events(spark, sf_dir))


def q_value_percentiles(spark, sf_dir):
    return rel.value_percentiles(_events(spark, sf_dir))


def q_approx_distinct_daily(spark, sf_dir):
    return rel.approx_distinct_daily(_events(spark, sf_dir))


def q_session_window_stats(spark, sf_dir):
    return rel.session_window_stats(_events(spark, sf_dir))


def q_props_key_stats(spark, sf_dir):
    return rel.props_key_stats(_events(spark, sf_dir))


def q_funnel_stages(spark, sf_dir):
    return rel.funnel_stages(_events(spark, sf_dir)).orderBy("user_id")


def q_value_histogram(spark, sf_dir):
    return rel.value_histogram(_events(spark, sf_dir)).orderBy("bin")


def q_value_percentiles_approx(spark, sf_dir):
    # sketch-based -> approximate -> no oracle row (driver records
    # rows-only); tests bound the error against the exact operator
    return rel.value_percentiles_approx(_events(spark, sf_dir))


def q_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts (first-event week x activity offset)."""
    return rel.retention_cohorts(_events(spark, sf_dir)).orderBy(
        "cohort_week", "week_offset"
    )


def q_ewma_traffic(spark, sf_dir):
    """EWMA-smoothed hourly traffic + spike flags (applyInPandas state)."""
    return rel.ewma_traffic(_events(spark, sf_dir)).orderBy(
        "event_type", "hour"
    )


QUERIES = {
    "sessionized_events": q_sessionized_events,
    "session_stats": q_session_stats,
    "asof_error_click": q_asof_error_click,
    "range_follow_counts": q_range_follow_counts,
    "topk_users_per_type": q_topk_users_per_type,
    "value_percentiles": q_value_percentiles,
    "approx_distinct_daily": q_approx_distinct_daily,
    "session_window_stats": q_session_window_stats,
    "props_key_stats": q_props_key_stats,
    "funnel_stages": q_funnel_stages,
    "value_histogram": q_value_histogram,
    "value_percentiles_approx": q_value_percentiles_approx,
    "retention_cohorts": q_retention_cohorts,
    "ewma_traffic": q_ewma_traffic,
}

_GAP = rel.SESSION_GAP_MINUTES
_WH = rel.RANGE_JOIN_WINDOW_HOURS
_K = rel.TOPK_PER_GROUP

# WHERE ts IS NOT NULL mirrors the operators' convention: an event
# without a timestamp cannot be placed on the session timeline (and the
# two engines disagree on NULL placement in window sorts).
_SESSIONIZE_CTE = f"""
lagged AS (
  SELECT event_id, user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NOT NULL
                  AND ts <= prev_ts + INTERVAL {_GAP} MINUTES
             THEN 0 ELSE 1 END AS is_new
  FROM lagged
),
sess AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_seq
  FROM flagged
)"""

ORACLES = {
    "sessionized_events": f"""
WITH {_SESSIONIZE_CTE}
SELECT * FROM sess ORDER BY user_id, ts, event_id
""",
    "session_stats": f"""
WITH {_SESSIONIZE_CTE}
SELECT user_id, session_seq,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       round(epoch(max(ts) - min(ts)), 6) AS duration_sec,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
FROM sess GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
""",
    # native ASOF JOIN — an independent engine mechanism from the
    # union-tag running-last formulation the Spark operator uses
    "asof_error_click": """
WITH r AS (
  SELECT user_id, ts,
         max(event_id) AS r_event_id,
         max_by(value, event_id) AS r_value
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
  GROUP BY user_id, ts
),
l AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'error' AND ts IS NOT NULL)
SELECT l.event_id, l.user_id, l.ts,
       r.r_event_id AS matched_event_id,
       r.ts AS matched_ts,
       round(r.r_value, 6) AS matched_value,
       round(epoch(l.ts - r.ts), 6) AS lag_sec
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
""",
    # plain inequality join — the bucketed equi-join rewrite must agree
    "range_follow_counts": f"""
WITH tv AS (SELECT * FROM events WHERE ts IS NOT NULL),
hits AS (
  SELECT a.event_id, count(*) AS n_follow
  FROM tv a JOIN tv b
    ON a.user_id = b.user_id
   AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL {_WH} HOURS
  GROUP BY a.event_id
)
SELECT e.event_id, e.user_id, e.ts,
       coalesce(h.n_follow, 0) AS n_follow
FROM tv e LEFT JOIN hits h USING (event_id)
ORDER BY e.event_id
""",
    "topk_users_per_type": f"""
WITH totals AS (
  SELECT event_type, user_id,
         round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6)
           AS total_value,
         count(*) AS n_events
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type
    ORDER BY total_value DESC, user_id ASC NULLS LAST
  ) AS rank
  FROM totals
)
SELECT event_type, user_id, total_value, n_events, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_K}
ORDER BY event_type, rank
""",
    "value_percentiles": """
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
""",
    # strict-< boundary (Spark session_window's half-open [ts, ts+gap)),
    # unlike the inclusive-<= manual sessionization above — two independent
    # mechanisms, one oracle family
    "session_window_stats": f"""
WITH lagged AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events WHERE ts IS NOT NULL
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NOT NULL
                  AND ts < prev_ts + INTERVAL {_GAP} MINUTES
             THEN 0 ELSE 1 END AS is_new
  FROM lagged
),
sess AS (
  SELECT user_id, ts,
         sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING
         ) AS session_seq
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_seq
ORDER BY user_id, session_start
""",
    # json_valid guard (malformed props would make json_extract_string
    # THROW, where Spark's get_json_object yields NULL) + the operator's
    # anchored integer regex (DuckDB TRY_CAST rounds '2.7' -> 3; Spark's
    # try_cast gives NULL — the shared guard removes the cast entirely)
    "props_key_stats": """
SELECT event_type,
       count(*) AS n,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM (
  SELECT event_type,
         CASE WHEN json_valid(props)
               AND regexp_matches(json_extract_string(props, '$.k'),
                                  '^-?[0-9]{1,9}$')
              THEN CAST(json_extract_string(props, '$.k') AS INT) END AS k
  FROM events
) GROUP BY event_type ORDER BY event_type
""",
    # independent formulation: Spark chains co-partitioned min-aggregates;
    # the oracle recomputes each stage as a correlated join + group-min

    # identical expression trees on both engines: w = (hi-lo)/10.0, bin =
    # least(floor((v-lo)/w), 9); the max value closes into the last bin
    "value_histogram": """
WITH rng AS (
  SELECT min(CAST(value AS DOUBLE)) AS lo,
         max(CAST(value AS DOUBLE)) AS hi,
         count(*) AS n_total,
         (max(CAST(value AS DOUBLE)) - min(CAST(value AS DOUBLE))) / 10.0 AS w
  FROM events
),
binned AS (
  SELECT CAST(CASE WHEN value IS NULL THEN -1
              WHEN hi = lo THEN 0
              ELSE least(CAST(floor((CAST(value AS DOUBLE) - lo) / w) AS INT), 9)
         END AS INT) AS bin,
         n_total, lo, w
  FROM events CROSS JOIN rng
)
SELECT bin,
       CASE WHEN bin >= 0 THEN round(lo + bin * w, 6) END AS bin_lo,
       count(*) AS n,
       round(count(*) / CAST(n_total AS DOUBLE), 6) AS share
FROM binned GROUP BY bin, n_total, lo, w ORDER BY bin
""",
    "funnel_stages": """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS INT) AS funnel_stage
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
""",
}


# Retention cohorts: NULL ts/user_id excluded (the sessionize policy);
# ISO-Monday date_trunc weeks on both engines; exact day-diff/7 offsets;
# cohort_size via the offset-0 window max (offset 0 always exists)
ORACLES["retention_cohorts"] = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
),
cells AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, uw.week) / 7 AS INT)
           AS week_offset,
         count(*)::BIGINT AS n_active
  FROM uw JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week, week_offset, n_active,
       max(CASE WHEN week_offset = 0 THEN n_active END)
         OVER (PARTITION BY cohort_week) AS cohort_size,
       round(n_active::DOUBLE
             / max(CASE WHEN week_offset = 0 THEN n_active END)
               OVER (PARTITION BY cohort_week), 6) AS retention_rate
FROM cells ORDER BY cohort_week, week_offset
"""


# EWMA via recursive CTE: the same fixed-order IEEE recurrence the
# applyInPandas operator runs (alpha 0.25 and 1-alpha 0.75 are exact
# binary fractions; the state chain is bit-identical, only the output is
# rounded — and the 4^-t value lattice provably never lands on a
# round-half boundary at 6 dp)
ORACLES["ewma_traffic"] = """
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*)::BIGINT AS n_events
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY hour) AS rn
  FROM hourly
),
rec AS (
  SELECT event_type, hour, n_events, rn,
         n_events::DOUBLE AS s, FALSE AS is_spike
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.event_type, n.hour, n.n_events, n.rn,
         0.25 * n.n_events::DOUBLE + 0.75 * r.s AS s,
         n.n_events::DOUBLE > 2.0 * r.s AS is_spike
  FROM numbered n
  JOIN rec r ON r.rn = n.rn - 1
            AND r.event_type IS NOT DISTINCT FROM n.event_type
)
SELECT event_type, hour, n_events, round(s, 6) AS ewma, is_spike
FROM rec ORDER BY event_type, hour
"""
