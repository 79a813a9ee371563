"""Performance analyzer operators.

Spark-first re-expression of ``/root/reference/src/analyzers/performance.py``
and the canned SQL in ``/root/reference/src/storage/database.py:298-363``.
All percentiles/medians are EXACT (``F.percentile`` / ``F.median``) to match
the reference's pandas ``quantile``/``np.percentile`` (linear interpolation);
at 10^12-row scale swap for ``approx_percentile`` with documented tolerance.

All inputs are the parsed-transcripts frame (see ``functions.parse``); every
operator filters to access rows itself so callers can hand over the full
parsed frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, RuntimeConfig



def det_mean(col: str):
    """Order-independent mean of the 3-decimal response_time metric: exact
    decimal sum + one float division. A float-accumulated avg() can land on
    6-dp rounding boundaries nondeterministically (partition-order ulps)."""
    return F.sum(F.col(col).cast("decimal(18,3)")).cast("double") / F.count(col)

def access_rows(parsed: DataFrame) -> DataFrame:
    return parsed.where(F.col("log_type") == "access")


def overall_response_stats(parsed: DataFrame) -> DataFrame:
    """A1: global response-time stats (performance.py:47-53)."""
    return access_rows(parsed).agg(
        det_mean("response_time").alias("mean"),
        F.median("response_time").alias("median"),
        F.percentile("response_time", 0.95).alias("p95"),
        F.percentile("response_time", 0.99).alias("p99"),
        F.max("response_time").alias("max"),
    )


def endpoint_stats(parsed: DataFrame) -> DataFrame:
    """A2: per-endpoint count/mean/median/max/p95/error_rate
    (performance.py:60-69). One shuffle; partial aggregation map-side."""
    return (
        access_rows(parsed)
        .groupBy("endpoint")
        .agg(
            F.count("*").alias("n_requests"),
            det_mean("response_time").alias("mean_time"),
            F.median("response_time").alias("median_time"),
            F.max("response_time").alias("max_time"),
            F.percentile("response_time", 0.95).alias("p95_time"),
            F.avg((F.col("status") >= 400).cast("double")).alias("error_rate"),
        )
    )


def slow_endpoints(
    parsed: DataFrame, cfg: RuntimeConfig = DEFAULT_CONFIG
) -> DataFrame:
    """A3: HAVING mean_time > slow_endpoint_avg (performance.py:72-74)."""
    return endpoint_stats(parsed).where(
        F.col("mean_time") > F.lit(cfg.slow_endpoint_avg)
    )


def performance_metrics(
    parsed: DataFrame, cfg: RuntimeConfig = DEFAULT_CONFIG
) -> DataFrame:
    """A4+A5: long-format metric rows, 3 per endpoint with >=5 requests
    (performance.py:77-109). Unpivot via stack — no extra shuffle."""
    stats = endpoint_stats(parsed).where(
        F.col("n_requests") >= F.lit(cfg.min_endpoint_support)
    )
    return stats.select(
        "endpoint",
        F.expr(
            "stack(3, "
            "'mean_response_time', mean_time, "
            "'p95_response_time', p95_time, "
            "'error_rate', error_rate) AS (metric_name, metric_value)"
        ),
        F.lit(cfg.metric_time_window).alias("time_window"),
    )


def status_counts(parsed: DataFrame) -> DataFrame:
    """A6: frequency count of status codes (performance.py:143)."""
    return access_rows(parsed).groupBy("status").agg(F.count("*").alias("n"))


def overall_error_rate(parsed: DataFrame) -> DataFrame:
    """A7: scalar error rate (performance.py:146-148)."""
    return access_rows(parsed).agg(
        F.avg((F.col("status") >= 400).cast("double")).alias("error_rate"),
        F.count("*").alias("total_requests"),
        F.sum((F.col("status") >= 400).cast("long")).alias("error_count"),
    )


def error_endpoints(parsed: DataFrame) -> DataFrame:
    """A8: per-endpoint error/total/rate (performance.py:160-173) in a
    single pass (the reference does two groupbys)."""
    return (
        access_rows(parsed)
        .groupBy("endpoint")
        .agg(
            F.sum((F.col("status") >= 400).cast("long")).alias("error_count"),
            F.count("*").alias("total_count"),
        )
        .withColumn(
            "endpoint_error_rate",
            F.col("error_count").cast("double") / F.col("total_count"),
        )
        .where(F.col("error_count") > 0)
    )


def traffic_by_interval(parsed: DataFrame, interval: str = "1 hour") -> DataFrame:
    """A9: tumbling-window request counts (performance.py:199-208)."""
    return (
        access_rows(parsed)
        .where(F.col("ts_parsed").isNotNull())
        .groupBy(F.window("ts_parsed", interval).alias("w"))
        .agg(F.count("*").alias("n_requests"))
        .select(F.col("w.start").alias("window_start"), "n_requests")
    )


def peak_traffic_intervals(parsed: DataFrame, interval: str = "1 hour") -> DataFrame:
    """A10: intervals with traffic above their own 0.95 quantile
    (performance.py:211-212). The quantile is one scalar — broadcast it."""
    traffic = traffic_by_interval(parsed, interval)
    threshold = traffic.agg(
        F.percentile("n_requests", 0.95).alias("threshold")
    )
    return (
        traffic.crossJoin(F.broadcast(threshold))
        .where(F.col("n_requests") > F.col("threshold"))
        .select("window_start", "n_requests", "threshold")
    )


def error_rate_by_interval(
    parsed: DataFrame, interval: str = "5 minutes"
) -> DataFrame:
    """A16: 5-minute error-rate series (detector.py:242-243)."""
    return (
        access_rows(parsed)
        .where(F.col("ts_parsed").isNotNull())
        .groupBy(F.window("ts_parsed", interval).alias("w"))
        .agg(F.avg((F.col("status") >= 400).cast("double")).alias("error_rate"))
        .select(F.col("w.start").alias("window_start"), "error_rate")
    )


def response_stats_by_endpoint_timeframe(
    parsed: DataFrame, start: str, end: str
) -> DataFrame:
    """S11: the canned SQL report (database.py:322-363): per-endpoint
    COUNT/AVG/MIN/MAX + conditional error SUM within a time range,
    ORDER BY avg DESC."""
    return (
        access_rows(parsed)
        .where(F.col("ts_parsed").between(F.lit(start), F.lit(end)))
        .groupBy("endpoint")
        .agg(
            F.count("*").alias("request_count"),
            det_mean("response_time").alias("avg_response_time"),
            F.min("response_time").alias("min_response_time"),
            F.max("response_time").alias("max_response_time"),
            F.sum((F.col("status") >= 400).cast("long")).alias("error_count"),
        )
        .orderBy(F.desc("avg_response_time"), "endpoint")
    )


def logs_by_timeframe(
    parsed: DataFrame, start: str, end: str, log_type: str = "access"
) -> DataFrame:
    """S10: timeframe select ORDER BY timestamp (database.py:298-320 — the
    reference's ``table`` parameter serves access_logs *or* error_logs;
    here ``log_type`` selects the row class from the unified parsed frame).
    Secondary sort on (conv_id, turn_idx) pins a total order."""
    return (
        parsed.where(F.col("log_type") == log_type)
        .where(F.col("ts_parsed").between(F.lit(start), F.lit(end)))
        .orderBy("ts_parsed", "conv_id", "turn_idx")
    )


def daily_summary(parsed: DataFrame) -> DataFrame:
    """A15 + summary stats (notifier.py:298-307 ``send_daily_summary``):
    per-day totals, exact distinct-IP count, mean response time, error rate.
    ``countDistinct`` is exact per the reference; at 10^12 scale swap for
    ``approx_count_distinct`` with documented tolerance."""
    return (
        access_rows(parsed)
        .groupBy(F.to_date("ts_parsed").alias("day"))
        .agg(
            F.count("*").alias("total_logs"),
            F.countDistinct("ip_address").alias("unique_ips"),
            det_mean("response_time").alias("avg_response_time"),
            F.avg((F.col("status") >= 400).cast("double")).alias("error_rate"),
        )
        .orderBy("day")
    )


def endpoint_method_rollup(parsed: DataFrame) -> DataFrame:
    """Multi-granularity ROLLUP over the access rows: (endpoint, method),
    (endpoint), and grand-total cells in ONE logical aggregate, tagged by
    ``grouping_id`` — beyond the reference (SURVEY §2.4: it has no grouping
    sets), this is the drill-down cube a dashboard reads without re-scanning
    the corpus per level.

    Scale: Spark lowers rollup to an Expand (3 rows per input row here)
    feeding a single partial-aggregating exchange — the shuffle carries at
    most 3x the distinct group cells, never 3x the corpus, because partial
    aggregation collapses each level map-side. At very wide rollups prefer
    re-aggregating coarser levels FROM the finest aggregate; at this width
    Expand is the cheaper single-pass plan.
    """
    return (
        access_rows(parsed)
        .rollup("endpoint", "method")
        .agg(
            F.count("*").alias("n_requests"),
            F.sum((F.col("status") >= 400).cast("long")).alias("n_errors"),
            det_mean("response_time").alias("mean_time"),
            F.grouping_id().cast("int").alias("lvl"),
        )
    )


STATUS_CLASSES = ["c2xx", "c3xx", "c4xx", "c5xx", "other"]


def traffic_status_pivot(parsed: DataFrame) -> DataFrame:
    """PIVOT: hour-of-day x status-class traffic matrix — the wide
    dashboard layout (one row per hour, one column per class) the
    reference renders by hand from separate counts.

    Scale: the explicit pivot value list avoids the distinct-value
    discovery pass (at 100 TB that would be its own corpus scan). Spark
    lowers pivot to two agg phases — (hour, klass) counts, then a
    PivotFirst rollup to (hour) — so there are two exchanges, but BOTH
    carry only aggregated cells (<= 24 x |classes| rows), never the
    corpus; the first phase partial-aggregates map-side. Absent cells
    coalesce to 0 so the frame is dense.
    """
    klass = (
        F.when(F.col("status").between(200, 299), "c2xx")
        .when(F.col("status").between(300, 399), "c3xx")
        .when(F.col("status").between(400, 499), "c4xx")
        .when(F.col("status").between(500, 599), "c5xx")
        .otherwise("other")
    )
    base = (
        access_rows(parsed)
        .where(F.col("ts_parsed").isNotNull())
        .select(F.hour("ts_parsed").alias("hour"), klass.alias("klass"))
    )
    pivoted = base.groupBy("hour").pivot("klass", STATUS_CLASSES).count()
    return pivoted.select(
        "hour",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in STATUS_CLASSES
        ],
    ).orderBy("hour")


SLOW_IP_THRESHOLD_SEC = 1.0


def ip_overlap_sets(parsed: DataFrame) -> DataFrame:
    """Set-operation triage (INTERSECT / EXCEPT — the §2.6 op class the
    reference lacks): partition the IPs seen erroring (status >= 400) and
    the IPs seen slow (response_time > threshold) into both / error-only /
    slow-only, with member counts.

    Scale: Spark plans Intersect as a LEFT SEMI and Except as a LEFT ANTI
    hash join over map-side-distinct inputs, so the shuffle carries each
    set's distinct keys once; the three labeled branches reduce to 1-row
    counts before the final 3-row union.
    """
    acc = access_rows(parsed)
    error_ips = acc.where(F.col("status") >= 400).select("ip_address").distinct()
    slow_ips = (
        acc.where(F.col("response_time") > SLOW_IP_THRESHOLD_SEC)
        .select("ip_address")
        .distinct()
    )

    def _count(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("ip_class"), F.count("*").alias("n_ips")
        )

    return (
        _count(error_ips.intersect(slow_ips), "both")
        .unionByName(_count(error_ips.exceptAll(slow_ips), "error_only"))
        .unionByName(_count(slow_ips.exceptAll(error_ips), "slow_only"))
        .orderBy("ip_class")
    )


def traffic_sliding(parsed: DataFrame) -> DataFrame:
    """A9's sliding sibling: request counts over 1-hour windows sliding
    every 15 minutes — the overlap smooths tumbling-window edge artifacts
    in rate dashboards.

    Scale: Spark expands each row into duration/slide = 4 window copies
    BEFORE the partial aggregate (a constant fan-out, unlike a self-join
    formulation); the exchange still carries only the aggregated
    (window, count) cells. At 10^12 rows pick slide >= duration/4 so the
    expansion constant stays small.
    """
    return (
        access_rows(parsed)
        .where(F.col("ts_parsed").isNotNull())
        .groupBy(F.window("ts_parsed", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_requests"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_requests",
        )
        .orderBy("window_start")
    )
