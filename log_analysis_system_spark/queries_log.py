"""Driver-facing log-pipeline queries with paired DuckDB oracle SQL.

Each entry is ``name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql)``.
The transcripts table is derived deterministically from the shared ``events``
parquet inside both sides (see ``sources.events_transcripts``), so every
grok-parse query has a full ANSI-SQL oracle. Aggregate doubles are rounded to
6 decimals on BOTH sides to absorb summation-order ulps.

Oracle style note: the oracle derives parsed fields from the *event formulas*
(``duckdb_parsed_cte``), never from regex — so the Spark render+grok+aggregate
round trip is checked against an independent computation path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import (
    ATTACK_PATTERNS,
    BRUTE_FORCE_STATUSES,
    BRUTE_FORCE_THRESHOLD,
    LOGIN_KEYWORDS,
    SCAN_PATTERNS,
    STATUS_DESCRIPTIONS,
    SUSPICIOUS_IPS,
)
from .functions.parse import PARSED_FIELDS, parse_transcripts
from .operators import anomaly as an
from .operators import performance as perf
from .operators import security as sec
from .operators import windows as win
from .sources.dims import enrich, role_dim, ROLE_DIM
from .sources.events_transcripts import (
    ENDPOINTS,
    oracle_prefix,
    render_transcripts,
)

P = oracle_prefix()
_ACCESS = "log_type = 'access'"


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the events file is a single tiny parquet: spread the rows before the
    # render+parse stages so their parallelism isn't capped by file layout
    events = events.repartition(spark.sparkContext.defaultParallelism)
    return render_transcripts(events)


def load_parsed(spark: SparkSession, sf_dir: str, engine: str = "sql") -> DataFrame:
    return parse_transcripts(load_transcripts(spark, sf_dir), engine=engine)


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


def _epoch(df: DataFrame, col: str = "window_start") -> DataFrame:
    return df.withColumn(col, F.col(col).cast("long"))


# ---------------------------------------------------------------- security
# Endpoint classification precomputed with Python re (the reference's exact
# engine, security.py:45 re.IGNORECASE + re.search) and embedded as CASE
# chains in the oracle — independent of Spark's rlike.
def _first_match_py(endpoint: str, patterns: list[str]) -> str | None:
    for p in patterns:
        if re.search(p, endpoint, re.IGNORECASE):
            return p
    return None


def _case_sql(mapping: dict[str, str | None]) -> str:
    whens = " ".join(
        "WHEN endpoint = '{}' THEN '{}'".format(
            e.replace("'", "''"), p.replace("'", "''")
        )
        for e, p in mapping.items()
        if p is not None
    )
    return f"(CASE {whens} END)" if whens else "(CAST(NULL AS VARCHAR))"


ATTACK_MATCH = {e: _first_match_py(e, ATTACK_PATTERNS) for e in ENDPOINTS}
SCAN_MATCH = {e: _first_match_py(e, SCAN_PATTERNS) for e in ENDPOINTS}
LOGIN_MATCH = {
    e: bool(re.search("|".join(LOGIN_KEYWORDS), e, re.IGNORECASE)) for e in ENDPOINTS
}

_ATTACK_CASE = _case_sql(ATTACK_MATCH)
_SCAN_CASE = _case_sql(SCAN_MATCH)
_LOGIN_SET = ", ".join(
    "'" + e.replace("'", "''") + "'" for e, hit in LOGIN_MATCH.items() if hit
)
_SUSP_SET = ", ".join(f"'{ip}'" for ip in SUSPICIOUS_IPS)
_BF_STATUSES = ", ".join(str(s) for s in BRUTE_FORCE_STATUSES)

_SEC_EVENTS_CTE = f"""
sec_events AS (
  SELECT ts_parsed AS event_ts, 'attack_pattern' AS event_type,
         'high' AS severity, ip_address, endpoint,
         'Potential attack pattern detected: ' || {_ATTACK_CASE} AS description,
         conv_id, turn_idx
  FROM parsed WHERE {_ACCESS} AND {_ATTACK_CASE} IS NOT NULL
  UNION ALL
  SELECT ts_parsed, 'scan_attempt', 'medium', ip_address, endpoint,
         'Potential scanning attempt detected: ' || {_SCAN_CASE},
         conv_id, turn_idx
  FROM parsed WHERE {_ACCESS} AND {_SCAN_CASE} IS NOT NULL
  UNION ALL
  SELECT event_ts, 'suspicious_ip', 'high', ip_address, endpoint,
         'Activity from known suspicious IP: ' || ip_address || ' (' ||
           CAST(n_requests AS VARCHAR) || ' requests)',
         conv_id, turn_idx
  FROM (
    SELECT ip_address, endpoint, ts_parsed AS event_ts, conv_id, turn_idx,
           row_number() OVER
             (PARTITION BY ip_address ORDER BY conv_id, turn_idx) AS rn,
           count(*) OVER (PARTITION BY ip_address) AS n_requests
    FROM parsed WHERE {_ACCESS} AND ip_address IN ({_SUSP_SET})
  ) WHERE rn = 1
  UNION ALL
  SELECT CAST(NULL AS TIMESTAMP), 'brute_force_attempt', 'high', ip_address,
         'multiple',
         'Potential brute force attempt: ' || CAST(n_failed AS VARCHAR) ||
           ' failed login attempts from ' || ip_address,
         CAST(NULL AS VARCHAR), CAST(NULL AS INT)
  FROM (
    SELECT ip_address, count(*) AS n_failed
    FROM parsed
    WHERE {_ACCESS} AND endpoint IN ({_LOGIN_SET})
      AND status IN ({_BF_STATUSES})
    GROUP BY ip_address
  ) WHERE n_failed >= {BRUTE_FORCE_THRESHOLD}
  UNION ALL
  SELECT event_ts, 'unusual_method', 'medium', ip_address, endpoint,
         'Unusual HTTP method ' || method || ' used by ' || ip_address ||
           ' (' || CAST(n_requests AS VARCHAR) || ' requests)',
         conv_id, turn_idx
  FROM (
    SELECT method, ip_address, endpoint, ts_parsed AS event_ts,
           conv_id, turn_idx,
           row_number() OVER
             (PARTITION BY method, ip_address ORDER BY conv_id, turn_idx) AS rn,
           count(*) OVER (PARTITION BY method, ip_address) AS n_requests
    FROM parsed
    WHERE {_ACCESS}
      AND method IN ('PUT', 'DELETE', 'TRACE', 'CONNECT', 'OPTIONS')
  ) WHERE rn = 1
)
"""

PS = P.rstrip() + ", " + _SEC_EVENTS_CTE + "\n"


# ------------------------------------------------------------------ queries
def q_transcripts_roundtrip(spark, sf_dir):
    """Per-turn text byte-equality under (conv_id, turn_idx) order."""
    return load_transcripts(spark, sf_dir)


def q_parsed_turns(spark, sf_dir):
    """Per-row grok round trip — the strongest per-row parity gate."""
    return load_parsed(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "tool", "text", *PARSED_FIELDS
    )


def q_parsed_turns_pandas(spark, sf_dir):
    """Same rows via the Arrow pandas-UDF engine (input_hint mandate)."""
    return load_parsed(spark, sf_dir, engine="pandas").select(
        "conv_id", "turn_idx", "role", "tool", "text", *PARSED_FIELDS
    )


def q_rejects(spark, sf_dir):
    """P7: unparseable rows are counted, not dropped silently."""
    parsed = load_parsed(spark, sf_dir)
    return parsed.where(F.col("log_format").isNull()).agg(
        F.count("*").alias("n_rejects")
    )


def q_status_counts(spark, sf_dir):
    return perf.status_counts(load_parsed(spark, sf_dir))


def q_endpoint_stats(spark, sf_dir):
    df = perf.endpoint_stats(load_parsed(spark, sf_dir))
    return _r6(df, "mean_time", "median_time", "p95_time", "error_rate")


def q_overall_response_stats(spark, sf_dir):
    df = perf.overall_response_stats(load_parsed(spark, sf_dir))
    return _r6(df, "mean", "median", "p95", "p99")


def q_slow_endpoints(spark, sf_dir):
    df = perf.slow_endpoints(load_parsed(spark, sf_dir))
    return _r6(df, "mean_time", "median_time", "p95_time", "error_rate")


def q_performance_metrics(spark, sf_dir):
    df = perf.performance_metrics(load_parsed(spark, sf_dir))
    return _r6(df, "metric_value")


def q_overall_error_rate(spark, sf_dir):
    return _r6(perf.overall_error_rate(load_parsed(spark, sf_dir)), "error_rate")


def q_error_endpoints(spark, sf_dir):
    return _r6(perf.error_endpoints(load_parsed(spark, sf_dir)), "endpoint_error_rate")


def _series_input(spark, sf_dir):
    """Parse -> prune to the 3 columns every time-series agg reads ->
    lazy localCheckpoint. Without the barrier, Catalyst substitutes the
    parse cascade into BOTH the pushed-down row filter and the window
    projection, so every row pays the regex+timestamp parse ~2x (measured
    3.5x wall-time reduction at sf0.1: traffic 3.9->1.1s). At scale the
    materialization writes 3 narrow columns, not the payload."""
    return (
        load_parsed(spark, sf_dir)
        .select("ts_parsed", "log_type", "status")
        .localCheckpoint(eager=False)
    )


def q_traffic_hourly(spark, sf_dir):
    return _epoch(perf.traffic_by_interval(_series_input(spark, sf_dir), "1 hour"))


def q_peak_traffic(spark, sf_dir):
    df = perf.peak_traffic_intervals(_series_input(spark, sf_dir), "1 hour")
    return _epoch(_r6(df, "threshold"))


def q_error_rate_5min(spark, sf_dir):
    df = perf.error_rate_by_interval(_series_input(spark, sf_dir), "5 minutes")
    return _epoch(_r6(df, "error_rate"))


def q_timeframe_logs(spark, sf_dir):
    df = perf.logs_by_timeframe(
        load_parsed(spark, sf_dir), "2024-01-02 00:00:00", "2024-01-05 00:00:00"
    )
    return df.select("conv_id", "turn_idx", "ts_parsed", "ip_address", "endpoint", "status")


def q_error_timeframe_logs(spark, sf_dir):
    """S10 over the error-log table (database.py:298-320 ``table`` param)."""
    df = perf.logs_by_timeframe(
        load_parsed(spark, sf_dir),
        "2024-01-02 00:00:00", "2024-01-05 00:00:00",
        log_type="error",
    )
    return df.select("conv_id", "turn_idx", "ts_parsed", "level", "module", "message")


def q_endpoint_stats_timeframe(spark, sf_dir):
    # pandas parse engine here on purpose: the ts_parsed BETWEEN filter
    # pushes below a SQL-engine projection by SUBSTITUTING the whole parse
    # cascade into the filter condition — an unsplittable boolean expr that
    # blows the 64KB whole-stage-codegen method limit (janino fallback to
    # interpreted, observed at sf0.01) and re-runs the regexes per row. The
    # Arrow UDF is a pushdown barrier: parse evaluates once, filter runs on
    # the materialized column.
    df = perf.response_stats_by_endpoint_timeframe(
        load_parsed(spark, sf_dir, engine="pandas"),
        "2024-01-02 00:00:00", "2024-01-05 00:00:00",
    )
    return _r6(df, "avg_response_time")


def q_daily_summary(spark, sf_dir):
    df = perf.daily_summary(load_parsed(spark, sf_dir))
    return _r6(df, "avg_response_time", "error_rate")


def q_format_detection(spark, sf_dir):
    return win.conversation_format_detection(load_parsed(spark, sf_dir))


# every column the 5 detectors and the alert-rate rollup read — the
# checkpoint materializes ONLY these (dropping text + the wide parse
# remainder halves the security_events wall time at sf0.1, and at 100 TB
# never writes the payload column to checkpoint storage at all)
DETECTOR_COLUMNS = [
    "conv_id", "turn_idx", "ip_address", "endpoint",
    "method", "status", "ts_parsed", "log_type",
]


def _detector_input(spark, sf_dir):
    """Parse -> prune to detector columns -> lazy localCheckpoint.

    localCheckpoint over persist(): its blocks are freed by the
    ContextCleaner when the frame is GC'd, so repeated registry
    invocations in a long-lived session don't accumulate CacheManager
    entries that only an explicit unpersist would release."""
    return (
        load_parsed(spark, sf_dir)
        .select(*DETECTOR_COLUMNS)
        .localCheckpoint(eager=False)
    )


def q_security_events(spark, sf_dir):
    # five detectors fan out from one parse: lazy localCheckpoint so the
    # scan+parse runs once, not per union branch (same strategy as
    # pipeline._route_stage)
    return sec.all_security_events(_detector_input(spark, sf_dir))


def q_brute_force(spark, sf_dir):
    return sec.brute_force_events(load_parsed(spark, sf_dir)).select(
        "ip_address", "description"
    )


def q_suspicious_ips(spark, sf_dir):
    return sec.suspicious_ip_events(load_parsed(spark, sf_dir))


def q_unusual_methods(spark, sf_dir):
    return sec.unusual_method_events(load_parsed(spark, sf_dir))


def q_ip_threat_scores(spark, sf_dir):
    events = sec.all_security_events(_detector_input(spark, sf_dir))
    return sec.ip_threat_scores(events)


def q_zscore_anomalies(spark, sf_dir):
    df = an.response_time_zscore_anomalies(load_parsed(spark, sf_dir))
    return _r6(df, "expected_value", "z_score")


def q_per_conv_zscore(spark, sf_dir):
    df = an.per_conv_zscore_anomalies(load_parsed(spark, sf_dir))
    return _r6(df, "expected_value", "z_score")


def q_rolling_traffic_anomalies(spark, sf_dir):
    df = an.traffic_rolling_anomalies(_series_input(spark, sf_dir), "1 hour")
    return _epoch(_r6(df, "upper_bound", "lower_bound"))


def q_iqr_anomalies(spark, sf_dir):
    df = an.error_rate_iqr_anomalies(_series_input(spark, sf_dir), "5 minutes")
    return _r6(df, "expected_value", "actual_value", "z_score").withColumn(
        "event_ts", F.col("event_ts").cast("long")
    )


def q_turns_per_conversation(spark, sf_dir):
    return win.turns_per_conversation(load_transcripts(spark, sf_dir))


def q_role_transitions(spark, sf_dir):
    return win.role_transitions(load_transcripts(spark, sf_dir)).orderBy(
        "prev_role", "role"
    )


def q_tool_invocations(spark, sf_dir):
    return win.tool_invocation_counts(load_transcripts(spark, sf_dir))


def q_turn_gaps(spark, sf_dir):
    tr = load_transcripts(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return tr.select(
        "conv_id",
        "turn_idx",
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("gap_micros"),
    )


def q_turn_ordering_check(spark, sf_dir):
    df = win.turn_ordering_check(load_transcripts(spark, sf_dir))
    return df.agg(F.count("*").alias("n_violations"))


def q_conversation_alert_rates(spark, sf_dir):
    # pruned lazy localCheckpoint (same policy as q_security_events): the
    # 5-detector union otherwise inlines the parse cascade per branch — 5x
    # the parse compute AND a >64KB whole-stage method that falls back to
    # interpreted (janino "Code grows beyond 64 KB" observed at sf0.01).
    # The turn rollup only reads conv_id, so the pruned frame serves both.
    parsed = _detector_input(spark, sf_dir)
    events = sec.all_security_events(parsed)
    return _r6(win.conversation_alert_rates(parsed, events), "alert_rate")


def q_salted_turn_counts(spark, sf_dir):
    return win.salted_turn_counts(load_transcripts(spark, sf_dir))


def q_conversation_context(spark, sf_dir):
    # presentation sort lives here, not in the operator (VERDICT r2 #7)
    return win.conversation_context(load_transcripts(spark, sf_dir)).orderBy(
        "conv_id", "turn_idx"
    )


def q_conv_skew_profile(spark, sf_dir):
    return win.key_skew_profile(load_transcripts(spark, sf_dir), "conv_id")


def q_salted_dim_join(spark, sf_dir):
    return win.salted_dim_join(load_transcripts(spark, sf_dir))


def q_endpoint_method_rollup(spark, sf_dir):
    return _r6(
        perf.endpoint_method_rollup(load_parsed(spark, sf_dir)), "mean_time"
    ).orderBy("lvl", "endpoint", "method")


def q_traffic_status_pivot(spark, sf_dir):
    return perf.traffic_status_pivot(load_parsed(spark, sf_dir))


def q_ip_overlap_sets(spark, sf_dir):
    # six set-op branches (2 sides x 3 labels) — pruned lazy checkpoint so
    # the parse cascade runs once, not per branch (same policy as
    # _detector_input)
    pruned = (
        load_parsed(spark, sf_dir)
        .select("log_type", "ip_address", "status", "response_time")
        .localCheckpoint(eager=False)
    )
    return perf.ip_overlap_sets(pruned)


def q_traffic_sliding(spark, sf_dir):
    return perf.traffic_sliding(load_parsed(spark, sf_dir))


def q_pii_redaction(spark, sf_dir):
    """PII scrub over raw turn text: typed placeholders + match counts."""
    from .operators.datapipe import pii_redaction

    return pii_redaction(load_transcripts(spark, sf_dir))


def q_enriched_status_counts(spark, sf_dir):
    enriched = enrich(load_parsed(spark, sf_dir))
    return (
        enriched.where(F.col("log_type") == "access")
        .groupBy("status", "status_description")
        .agg(F.count("*").alias("n"))
    )


def q_enriched_role_counts(spark, sf_dir):
    tr = load_transcripts(spark, sf_dir)
    dim = role_dim(spark)
    return (
        tr.join(F.broadcast(dim), "role", "left")
        .groupBy("role", "role_class")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------- oracle SQL
def _pii_oracle_sql() -> str:
    """PII-redaction oracle generated from the SAME pattern list the Spark
    operator uses (operators.datapipe.PII_PATTERNS) — counts on the
    original text, replacements chained in declaration order."""
    from .operators.datapipe import PII_PATTERNS

    counts = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    red = "text"
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return (
        f"SELECT conv_id, turn_idx,\n       {counts},\n"
        f"       {red} AS redacted\nFROM transcripts"
    )

_STATUS_DESC_CASE = "(CASE {} ELSE 'Unknown' END)".format(
    " ".join(f"WHEN status = {k} THEN '{v}'" for k, v in STATUS_DESCRIPTIONS.items())
)
_ROLE_CLASS_CASE = "(CASE {} END)".format(
    " ".join(f"WHEN role = '{r}' THEN '{c}'" for r, c, _ in ROLE_DIM)
)

_ENDPOINT_STATS_BODY = f"""
SELECT endpoint, count(*) AS n_requests,
       round((CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE) / count(response_time)), 6) AS mean_time,
       round(median(response_time), 6) AS median_time,
       max(response_time) AS max_time,
       round(quantile_cont(response_time, 0.95), 6) AS p95_time,
       round(avg(CASE WHEN status >= 400 THEN 1.0 ELSE 0.0 END), 6) AS error_rate
FROM parsed WHERE {_ACCESS} GROUP BY endpoint
"""

ORACLES: dict[str, str] = {
    "transcripts_roundtrip": P
    + "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
    "parsed_turns": P
    + "SELECT conv_id, turn_idx, role, tool, text, {} FROM parsed".format(
        ", ".join(PARSED_FIELDS)
    ),
    "parsed_turns_pandas": P
    + "SELECT conv_id, turn_idx, role, tool, text, {} FROM parsed".format(
        ", ".join(PARSED_FIELDS)
    ),
    "rejects": P
    + "SELECT count(*) AS n_rejects FROM parsed WHERE log_format IS NULL",
    "status_counts": P
    + f"SELECT status, count(*) AS n FROM parsed WHERE {_ACCESS} GROUP BY status",
    "endpoint_stats": P + _ENDPOINT_STATS_BODY,
    "overall_response_stats": P
    + f"""
SELECT round((CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE) / count(response_time)), 6) AS mean,
       round(median(response_time), 6) AS median,
       round(quantile_cont(response_time, 0.95), 6) AS p95,
       round(quantile_cont(response_time, 0.99), 6) AS p99,
       max(response_time) AS max
FROM parsed WHERE {_ACCESS}""",
    "slow_endpoints": P
    + f"SELECT * FROM ({_ENDPOINT_STATS_BODY}) WHERE mean_time > 0.5",
    "performance_metrics": P
    + f"""
, es AS (
  SELECT endpoint, count(*) AS n,
         round((CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE) / count(response_time)), 6) AS mean_v,
         round(quantile_cont(response_time, 0.95), 6) AS p95_v,
         round(avg(CASE WHEN status >= 400 THEN 1.0 ELSE 0.0 END), 6) AS er_v
  FROM parsed WHERE {_ACCESS} GROUP BY endpoint HAVING count(*) >= 5
)
SELECT endpoint, 'mean_response_time' AS metric_name, mean_v AS metric_value,
       3600 AS time_window FROM es
UNION ALL
SELECT endpoint, 'p95_response_time', p95_v, 3600 FROM es
UNION ALL
SELECT endpoint, 'error_rate', er_v, 3600 FROM es""",
    "overall_error_rate": P
    + f"""
SELECT round(avg(CASE WHEN status >= 400 THEN 1.0 ELSE 0.0 END), 6) AS error_rate,
       count(*) AS total_requests,
       CAST(sum(CASE WHEN status >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS error_count
FROM parsed WHERE {_ACCESS}""",
    "error_endpoints": P
    + f"""
SELECT endpoint, error_count, total_count,
       round(CAST(error_count AS DOUBLE) / total_count, 6) AS endpoint_error_rate
FROM (
  SELECT endpoint,
         CAST(sum(CASE WHEN status >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
         count(*) AS total_count
  FROM parsed WHERE {_ACCESS} GROUP BY endpoint
) WHERE error_count > 0""",
    "traffic_hourly": P
    + f"""
SELECT (epoch(ts_parsed)::BIGINT // 3600) * 3600 AS window_start,
       count(*) AS n_requests
FROM parsed WHERE {_ACCESS} AND ts_parsed IS NOT NULL GROUP BY 1""",
    "peak_traffic": P
    + f"""
, traffic AS (
  SELECT (epoch(ts_parsed)::BIGINT // 3600) * 3600 AS window_start,
         count(*) AS n_requests
  FROM parsed WHERE {_ACCESS} AND ts_parsed IS NOT NULL GROUP BY 1
)
SELECT window_start, n_requests,
       round((SELECT quantile_cont(n_requests, 0.95) FROM traffic), 6) AS threshold
FROM traffic
WHERE n_requests > (SELECT quantile_cont(n_requests, 0.95) FROM traffic)""",
    "error_rate_5min": P
    + f"""
SELECT (epoch(ts_parsed)::BIGINT // 300) * 300 AS window_start,
       round(avg(CASE WHEN status >= 400 THEN 1.0 ELSE 0.0 END), 6) AS error_rate
FROM parsed WHERE {_ACCESS} AND ts_parsed IS NOT NULL GROUP BY 1""",
    "timeframe_logs": P
    + f"""
SELECT conv_id, turn_idx, ts_parsed, ip_address, endpoint, status
FROM parsed
WHERE {_ACCESS} AND ts_parsed BETWEEN TIMESTAMP '2024-01-02 00:00:00'
  AND TIMESTAMP '2024-01-05 00:00:00'""",
    "error_timeframe_logs": P
    + """
SELECT conv_id, turn_idx, ts_parsed, level, module, message
FROM parsed
WHERE log_type = 'error' AND ts_parsed BETWEEN TIMESTAMP '2024-01-02 00:00:00'
  AND TIMESTAMP '2024-01-05 00:00:00'""",
    "endpoint_stats_timeframe": P
    + f"""
SELECT endpoint, count(*) AS request_count,
       round((CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE) / count(response_time)), 6) AS avg_response_time,
       min(response_time) AS min_response_time,
       max(response_time) AS max_response_time,
       CAST(sum(CASE WHEN status >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS error_count
FROM parsed
WHERE {_ACCESS} AND ts_parsed BETWEEN TIMESTAMP '2024-01-02 00:00:00'
  AND TIMESTAMP '2024-01-05 00:00:00'
GROUP BY endpoint""",
    "daily_summary": P
    + f"""
SELECT CAST(ts_parsed AS DATE) AS day,
       count(*) AS total_logs,
       count(DISTINCT ip_address) AS unique_ips,
       round((CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE) / count(response_time)), 6) AS avg_response_time,
       round(avg(CASE WHEN status >= 400 THEN 1.0 ELSE 0.0 END), 6) AS error_rate
FROM parsed WHERE {_ACCESS}
GROUP BY 1 ORDER BY 1
""",
    "format_detection": P
    + """
, counts AS (
  SELECT conv_id, count(*) AS n_sampled,
         count(*) FILTER (log_format = 'common') AS c_common,
         count(*) FILTER (log_format = 'combined') AS c_combined,
         count(*) FILTER (log_format = 'combined_time') AS c_ct,
         count(*) FILTER (log_format = 'error') AS c_error
  FROM parsed WHERE turn_idx < 100 GROUP BY conv_id
)
SELECT conv_id,
       CASE WHEN greatest(c_common, c_combined, c_ct, c_error) > 0
             AND greatest(c_common, c_combined, c_ct, c_error)::DOUBLE / n_sampled >= 0.5
            THEN CASE
              WHEN c_common >= c_combined AND c_common >= c_ct AND c_common >= c_error THEN 'common'
              WHEN c_combined >= c_ct AND c_combined >= c_error THEN 'combined'
              WHEN c_ct >= c_error THEN 'combined_time'
              ELSE 'error' END
            ELSE 'unknown' END AS detected_format,
       n_sampled
FROM counts ORDER BY conv_id
""",
    "security_events": PS + "SELECT * FROM sec_events",
    "brute_force": PS
    + "SELECT ip_address, description FROM sec_events "
    + "WHERE event_type = 'brute_force_attempt'",
    "suspicious_ips": PS
    + "SELECT * FROM sec_events WHERE event_type = 'suspicious_ip'",
    "unusual_methods": PS
    + "SELECT * FROM sec_events WHERE event_type = 'unusual_method'",
    "ip_threat_scores": PS
    + """
SELECT ip_address,
       CAST(sum(CASE severity WHEN 'low' THEN 1 WHEN 'medium' THEN 5
           WHEN 'high' THEN 10 ELSE 1 END) AS BIGINT) AS score,
       CAST(sum(CASE WHEN event_type = 'attack_pattern' THEN 1 ELSE 0 END) AS BIGINT) AS n_attack,
       CAST(sum(CASE WHEN event_type = 'scan_attempt' THEN 1 ELSE 0 END) AS BIGINT) AS n_scan,
       CAST(sum(CASE WHEN event_type = 'suspicious_ip' THEN 1 ELSE 0 END) AS BIGINT) AS n_suspicious,
       CAST(sum(CASE WHEN event_type = 'brute_force_attempt' THEN 1 ELSE 0 END) AS BIGINT) AS n_brute_force,
       CAST(sum(CASE WHEN event_type = 'unusual_method' THEN 1 ELSE 0 END) AS BIGINT) AS n_unusual_method,
       CASE WHEN sum(CASE severity WHEN 'low' THEN 1 WHEN 'medium' THEN 5
                     WHEN 'high' THEN 10 ELSE 1 END) >= 20 THEN 'high'
            WHEN sum(CASE severity WHEN 'low' THEN 1 WHEN 'medium' THEN 5
                     WHEN 'high' THEN 10 ELSE 1 END) >= 10 THEN 'medium'
            ELSE 'low' END AS threat_level
FROM sec_events WHERE ip_address IS NOT NULL GROUP BY ip_address""",
    "zscore_anomalies": P
    + f"""
, rt AS (SELECT conv_id, turn_idx, ts_parsed, response_time FROM parsed
         WHERE {_ACCESS} AND response_time IS NOT NULL),
st AS (SELECT CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE)
                / count(response_time) AS mu,
              stddev_pop(response_time) AS sigma,
              count(*) AS n FROM rt)
SELECT conv_id, turn_idx, ts_parsed AS event_ts,
       'response_time' AS metric_name,
       round(mu, 6) AS expected_value,
       response_time AS actual_value,
       round(CASE WHEN sigma > 0 THEN (response_time - mu) / sigma
             ELSE 0.0 END, 6) AS z_score
FROM rt, st
WHERE n >= 10
  AND abs(CASE WHEN sigma > 0 THEN (response_time - mu) / sigma ELSE 0.0 END) > 3.0""",
    "per_conv_zscore": P
    + f"""
, rt AS (
  SELECT conv_id, turn_idx, response_time,
         CAST(sum(CAST(response_time AS DECIMAL(18,3)))
                OVER (PARTITION BY conv_id) AS DOUBLE)
           / count(*) OVER (PARTITION BY conv_id) AS mu,
         stddev_pop(response_time) OVER (PARTITION BY conv_id) AS sigma,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM parsed WHERE {_ACCESS} AND response_time IS NOT NULL)
SELECT conv_id, turn_idx, 'response_time' AS metric_name,
       round(mu, 6) AS expected_value, response_time AS actual_value,
       round(CASE WHEN sigma > 0 THEN (response_time - mu) / sigma
             ELSE 0.0 END, 6) AS z_score
FROM rt
WHERE n >= 10
  AND abs(CASE WHEN sigma > 0 THEN (response_time - mu) / sigma ELSE 0.0 END) > 3.0""",
    "rolling_traffic_anomalies": P
    + f"""
, traffic AS (
  SELECT (epoch(ts_parsed)::BIGINT // 3600) * 3600 AS window_start,
         count(*) AS n_requests
  FROM parsed WHERE {_ACCESS} AND ts_parsed IS NOT NULL GROUP BY 1
),
rolled AS (
  SELECT window_start, n_requests,
         avg(n_requests) OVER w AS rmean_raw,
         stddev_samp(n_requests) OVER w AS rstd_raw,
         count(*) OVER w AS rcount,
         avg(n_requests) OVER () AS gmean,
         stddev_samp(n_requests) OVER () AS gstd,
         count(*) OVER () AS n_points
  FROM traffic
  WINDOW w AS (ORDER BY window_start ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
),
banded AS (
  SELECT window_start, n_requests, n_points,
         (CASE WHEN rcount >= 3 THEN rmean_raw ELSE gmean END)
           + 3.0 * coalesce(CASE WHEN rcount >= 3 THEN rstd_raw END, gstd)
           AS upper_bound,
         (CASE WHEN rcount >= 3 THEN rmean_raw ELSE gmean END)
           - 3.0 * coalesce(CASE WHEN rcount >= 3 THEN rstd_raw END, gstd)
           AS lower_bound
  FROM rolled
)
SELECT window_start, n_requests,
       round(upper_bound, 6) AS upper_bound,
       round(lower_bound, 6) AS lower_bound
FROM banded
WHERE n_points >= 10 AND (n_requests > upper_bound OR n_requests < lower_bound)""",
    "iqr_anomalies": P
    + f"""
, series AS (
  SELECT (epoch(ts_parsed)::BIGINT // 300) * 300 AS bucket,
         avg(CASE WHEN status >= 400 THEN 1.0 ELSE 0.0 END) AS error_rate
  FROM parsed WHERE {_ACCESS} AND ts_parsed IS NOT NULL GROUP BY 1
),
st AS (
  SELECT quantile_cont(error_rate, 0.75) AS q75,
         quantile_cont(error_rate, 0.25) AS q25,
         avg(error_rate) AS mu, stddev_pop(error_rate) AS sigma,
         count(*) AS n_points
  FROM series
)
SELECT bucket AS event_ts, 'error_rate' AS metric_name,
       round(mu, 6) AS expected_value,
       round(error_rate, 6) AS actual_value,
       round(CASE WHEN sigma > 0 THEN (error_rate - mu) / sigma ELSE 0.0 END, 6)
         AS z_score
FROM series, st
WHERE n_points >= 10 AND error_rate > q75 + 1.5 * (q75 - q25)""",
    "turns_per_conversation": P
    + """
SELECT conv_id, count(*) AS n_turns, max(turn_idx) AS max_turn_idx,
       CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_turns,
       CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) AS n_assistant_turns,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns,
       min(ts) AS first_ts, max(ts) AS last_ts
FROM transcripts GROUP BY conv_id""",
    "role_transitions": P
    + """
, lagged AS (
  SELECT conv_id,
         coalesce(lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                  '<start>') AS prev_role,
         role
  FROM transcripts
)
SELECT prev_role, role, count(*) AS n,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversations
FROM lagged GROUP BY prev_role, role ORDER BY prev_role, role""",
    "tool_invocations": P
    + """
SELECT tool, count(*) AS n_invocations,
       count(DISTINCT conv_id) AS n_conversations
FROM transcripts WHERE tool IS NOT NULL GROUP BY tool""",
    "turn_gaps": P
    + """
SELECT conv_id, turn_idx,
       epoch_us(ts) - lag(epoch_us(ts)) OVER
         (PARTITION BY conv_id ORDER BY turn_idx) AS gap_micros
FROM transcripts""",
    "turn_ordering_check": P
    + """
SELECT count(*) AS n_violations FROM (
  SELECT turn_idx,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
           AS expected_idx
  FROM transcripts
) WHERE turn_idx != expected_idx""",
    "conversation_alert_rates": PS
    + """
, turns AS (SELECT conv_id, count(*) AS n_turns FROM transcripts GROUP BY conv_id),
alerts AS (
  SELECT conv_id, count(*) AS n_alerts,
         CAST(sum(CASE WHEN severity = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS n_high
  FROM sec_events WHERE conv_id IS NOT NULL GROUP BY conv_id
)
SELECT t.conv_id, t.n_turns,
       CAST(coalesce(a.n_alerts, 0) AS BIGINT) AS n_alerts,
       CAST(coalesce(a.n_high, 0) AS BIGINT) AS n_high,
       round(CAST(coalesce(a.n_alerts, 0) AS DOUBLE) / t.n_turns, 6) AS alert_rate
FROM turns t LEFT JOIN alerts a USING (conv_id)""",
    "salted_turn_counts": P
    + """
SELECT conv_id, count(*) AS n_turns,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_turns
FROM transcripts GROUP BY conv_id""",
    # the salted (conv_id, salt) join must reproduce the plain per-conv
    # join: n_joined == n_turns == the unsalted rollup
    "salted_dim_join": P
    + """
SELECT conv_id, count(*) AS n_joined, count(*) AS n_turns
FROM transcripts GROUP BY conv_id""",
    "conv_skew_profile": P
    + """
, counts AS (
  SELECT conv_id, count(*) AS n_rows FROM transcripts GROUP BY conv_id
),
totals AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
         count(*) AS n_keys
  FROM counts
),
ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, conv_id) AS INT) AS rank,
         conv_id, n_rows
  FROM counts
)
SELECT rank, conv_id, n_rows,
       round(CAST(n_rows AS DOUBLE) / total_rows, 6) AS share,
       round(CAST(n_rows * n_keys AS DOUBLE) / total_rows, 6) AS x_mean,
       total_rows, n_keys
FROM ranked CROSS JOIN totals
WHERE rank <= 10 ORDER BY rank""",
    "endpoint_method_rollup": P
    + f"""
SELECT endpoint, method, count(*) AS n_requests,
       CAST(sum(CASE WHEN status >= 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       round(CAST(sum(CAST(response_time AS DECIMAL(18,3))) AS DOUBLE)
             / count(response_time), 6) AS mean_time,
       CAST(GROUPING(endpoint, method) AS INT) AS lvl
FROM parsed WHERE {_ACCESS}
GROUP BY ROLLUP(endpoint, method)
ORDER BY lvl, endpoint, method""",
    "traffic_status_pivot": P
    + f"""
SELECT CAST(hour(ts_parsed) AS INT) AS hour,
       CAST(sum(CASE WHEN status BETWEEN 200 AND 299 THEN 1 ELSE 0 END) AS BIGINT) AS c2xx,
       CAST(sum(CASE WHEN status BETWEEN 300 AND 399 THEN 1 ELSE 0 END) AS BIGINT) AS c3xx,
       CAST(sum(CASE WHEN status BETWEEN 400 AND 499 THEN 1 ELSE 0 END) AS BIGINT) AS c4xx,
       CAST(sum(CASE WHEN status BETWEEN 500 AND 599 THEN 1 ELSE 0 END) AS BIGINT) AS c5xx,
       CAST(sum(CASE WHEN status < 200 OR status >= 600 THEN 1 ELSE 0 END) AS BIGINT) AS other
FROM parsed WHERE {_ACCESS} AND ts_parsed IS NOT NULL
GROUP BY 1 ORDER BY hour""",
    "ip_overlap_sets": P
    + f"""
, error_ips AS (
  SELECT DISTINCT ip_address FROM parsed WHERE {_ACCESS} AND status >= 400
),
slow_ips AS (
  SELECT DISTINCT ip_address FROM parsed
  WHERE {_ACCESS} AND response_time > 1.0
)
SELECT 'both' AS ip_class, count(*) AS n_ips
FROM (SELECT * FROM error_ips INTERSECT SELECT * FROM slow_ips)
UNION ALL
SELECT 'error_only', count(*)
FROM (SELECT * FROM error_ips EXCEPT SELECT * FROM slow_ips)
UNION ALL
SELECT 'slow_only', count(*)
FROM (SELECT * FROM slow_ips EXCEPT SELECT * FROM error_ips)
ORDER BY ip_class""",
    # sliding windows: every ts lands in exactly duration/slide = 4
    # epoch-aligned windows — starts (floor(epoch/900) - k) * 900, k in 0..3
    "traffic_sliding": P
    + f"""
SELECT ((epoch(ts_parsed)::BIGINT // 900) - k.k) * 900 AS window_start,
       count(*) AS n_requests
FROM parsed CROSS JOIN (SELECT unnest(range(4)) AS k) k
WHERE {_ACCESS} AND ts_parsed IS NOT NULL
GROUP BY 1 ORDER BY window_start""",
    "pii_redaction": P + _pii_oracle_sql(),
    "enriched_status_counts": P
    + f"""
SELECT status, {_STATUS_DESC_CASE} AS status_description, count(*) AS n
FROM parsed WHERE {_ACCESS} GROUP BY status""",
    "enriched_role_counts": P
    + f"""
SELECT role, {_ROLE_CLASS_CASE} AS role_class, count(*) AS n
FROM transcripts GROUP BY role""",
    # string_agg / collect_list over the same ROWS frame: both engines
    # concatenate in frame (ORDER BY) order; an empty frame is NULL in both.
    "conversation_context": P
    + f"""
SELECT conv_id, turn_idx, role, text,
       string_agg(role || ': ' || text, chr(10)) OVER w AS context,
       CAST(count(*) OVER w AS INT) AS n_context_turns
FROM transcripts
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
             ROWS BETWEEN {win.CONTEXT_TURNS} PRECEDING AND 1 PRECEDING)
ORDER BY conv_id, turn_idx""",
}

QUERIES = {
    "transcripts_roundtrip": q_transcripts_roundtrip,
    "parsed_turns": q_parsed_turns,
    "parsed_turns_pandas": q_parsed_turns_pandas,
    "rejects": q_rejects,
    "status_counts": q_status_counts,
    "endpoint_stats": q_endpoint_stats,
    "overall_response_stats": q_overall_response_stats,
    "slow_endpoints": q_slow_endpoints,
    "performance_metrics": q_performance_metrics,
    "overall_error_rate": q_overall_error_rate,
    "error_endpoints": q_error_endpoints,
    "traffic_hourly": q_traffic_hourly,
    "peak_traffic": q_peak_traffic,
    "error_rate_5min": q_error_rate_5min,
    "timeframe_logs": q_timeframe_logs,
    "error_timeframe_logs": q_error_timeframe_logs,
    "endpoint_stats_timeframe": q_endpoint_stats_timeframe,
    "daily_summary": q_daily_summary,
    "format_detection": q_format_detection,
    "security_events": q_security_events,
    "brute_force": q_brute_force,
    "suspicious_ips": q_suspicious_ips,
    "unusual_methods": q_unusual_methods,
    "ip_threat_scores": q_ip_threat_scores,
    "zscore_anomalies": q_zscore_anomalies,
    "per_conv_zscore": q_per_conv_zscore,
    "rolling_traffic_anomalies": q_rolling_traffic_anomalies,
    "iqr_anomalies": q_iqr_anomalies,
    "turns_per_conversation": q_turns_per_conversation,
    "tool_invocations": q_tool_invocations,
    "role_transitions": q_role_transitions,
    "turn_gaps": q_turn_gaps,
    "turn_ordering_check": q_turn_ordering_check,
    "conversation_alert_rates": q_conversation_alert_rates,
    "salted_turn_counts": q_salted_turn_counts,
    "salted_dim_join": q_salted_dim_join,
    "conv_skew_profile": q_conv_skew_profile,
    "endpoint_method_rollup": q_endpoint_method_rollup,
    "traffic_status_pivot": q_traffic_status_pivot,
    "ip_overlap_sets": q_ip_overlap_sets,
    "traffic_sliding": q_traffic_sliding,
    "pii_redaction": q_pii_redaction,
    "enriched_status_counts": q_enriched_status_counts,
    "enriched_role_counts": q_enriched_role_counts,
    "conversation_context": q_conversation_context,
}
