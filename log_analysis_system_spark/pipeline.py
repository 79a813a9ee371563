"""The end-to-end batch pipeline: parse -> enrich -> route -> aggregate.

Spark-first rebuild of the reference drivers (``main.py:117-178``,
``dashboard.py:54-96``) over the transcripts payload, with the scale
engineering the north rule demands:

- **bucketing**: facts are hashed into ``n_buckets`` by ``conv_id``
  (``pmod(xxhash64(conv_id), n)``) — the unit of lineage, resume, and sink
  partitioning (Iceberg ``bucket(n, conv_id)`` on a real cluster);
- **two checkpointable stages** with different recovery granularity:

  * ``route`` (per-bucket, resumable bucket-by-bucket): parse + enrich +
    per-ROW detectors (attack/scan patterns — embarrassingly parallel),
    fanned out to parsed/error/reject sinks and per-severity event sinks,
    one persisted frame feeding every sink;
  * ``aggregate`` (global, all-or-nothing): reads BACK the completed
    parsed_turns sink (never recomputes parse) and runs the group-by
    detectors (suspicious IP / brute force / unusual method — global by
    definition: partial-bucket counts would be wrong), performance metrics
    and anomaly operators, full-overwrite sinks;

- **idempotence**: bucket sinks use dynamic-partition overwrite; rerunning
  a straggler bucket replaces its partition (the reference's rerun story
  appends duplicates — ``database.py:172``);
- **lineage/metrics**: per-bucket row counts per sink appended to the
  checkpointed state table.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from . import state as st
from .config import DEFAULT_CONFIG, RuntimeConfig
from .functions.parse import parse_transcripts
from .operators import anomaly as an
from .operators import performance as perf
from .operators import security as sec
from .sources import catalog
from .sources.dims import enrich

ROW_SINKS_BY_SEVERITY = {
    "high": "security_events_high",
    "medium": "security_events_medium",
    "low": "security_events_low",
}
AGG_SINKS_BY_SEVERITY = {
    "high": "security_events_agg_high",
    "medium": "security_events_agg_medium",
    "low": "security_events_agg_low",
}


@dataclass
class PipelineResult:
    run_id: str
    buckets_processed: list[int]
    buckets_skipped: list[int]
    aggregate_ran: bool = False
    sink_counts: dict[str, int] = field(default_factory=dict)


def _bucket(col: str, n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def _sink_concurrency() -> int:
    """How many independent sink-write jobs to have in flight at once.

    Concurrent submission overlaps job-scheduling + commit latency of the
    fan-out writes (all of which read only persisted frames). Tunable via
    SPARK_GRAFT_SINK_CONCURRENCY; 1 = fully sequential writes.
    """
    return max(1, int(os.environ.get("SPARK_GRAFT_SINK_CONCURRENCY", "6")))


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    output_dir: str,
    run_id: str,
    n_buckets: int = 32,
    parse_engine: str = "pandas",
    resume: bool = True,
    fail_after_route: bool = False,
    analyze_only: bool = False,
    cfg: RuntimeConfig = DEFAULT_CONFIG,
) -> PipelineResult:
    """``fail_after_route`` simulates a mid-run crash for resume tests.
    ``analyze_only`` skips the route stage entirely and re-runs the
    aggregate stage over the existing ``parsed_turns`` sink (the
    reference's ``main.py --analyze-only`` semantics). ``cfg`` threads
    runtime-loaded thresholds/patterns into every stage."""
    if analyze_only:
        if not catalog.table_exists(spark, output_dir, "parsed_turns"):
            raise FileNotFoundError(
                f"--analyze-only requires an existing parsed_turns sink "
                f"under {output_dir}"
            )
        result = PipelineResult(run_id, [], sorted(range(n_buckets)))
        _aggregate_stage(spark, output_dir, run_id, result, n_buckets, cfg)
        result.aggregate_ran = True
        return result

    done = (
        st.completed_buckets(spark, output_dir, run_id, "route") if resume else set()
    )
    all_buckets = set(range(n_buckets))
    pending = sorted(all_buckets - done)
    result = PipelineResult(run_id, pending, sorted(done))

    if pending:
        bucketed = transcripts.withColumn("bucket", _bucket("conv_id", n_buckets))
        if done:
            bucketed = bucketed.where(F.col("bucket").isin(pending))
        _route_stage(spark, bucketed, output_dir, run_id, result, parse_engine,
                     set(pending), n_buckets, cfg)

    if fail_after_route:
        return result

    agg_done = st.completed_buckets(spark, output_dir, run_id, "aggregate")
    if resume and -1 in agg_done:
        return result
    _aggregate_stage(spark, output_dir, run_id, result, n_buckets, cfg)
    result.aggregate_ran = True
    return result


def _sink(
    result: PipelineResult, df: DataFrame, output_dir: str, name: str, total: int
) -> None:
    """Bucket-partitioned idempotent write; counts come from the caller's
    single grouped-count pass, not a per-sink job."""
    catalog.write_table(
        df, output_dir, name, partition_cols=["bucket"], mode="overwrite_partitions"
    )
    result.sink_counts[name] = result.sink_counts.get(name, 0) + total


def _route_stage(
    spark: SparkSession,
    bucketed: DataFrame,
    output_dir: str,
    run_id: str,
    result: PipelineResult,
    parse_engine: str,
    pending: set[int],
    n_buckets: int,
    cfg: RuntimeConfig = DEFAULT_CONFIG,
) -> None:
    with st.StageTimer() as t:
        # ONE shuffle into bucket layout BEFORE the parse: raw turns are the
        # narrowest the rows ever are (cheapest point to shuffle), parse
        # parallelism is decoupled from the source file layout, and every
        # downstream sink write is narrow and bucket-aligned (<=1 file per
        # bucket per sink — the parquet analog of Iceberg
        # bucket(n, conv_id)). The bucket is the unit of parallelism,
        # lineage, and resume.
        bucketed = bucketed.repartition(n_buckets, "bucket")
        enriched = enrich(parse_transcripts(bucketed, engine=parse_engine, cfg=cfg))
        enriched.persist(StorageLevel.MEMORY_AND_DISK)

        # one grouped-count job covers parsed/error/reject lineage metrics
        cat = (
            F.when(F.col("log_type") == "access", F.lit("parsed_turns"))
            .when(F.col("log_type") == "error", F.lit("error_turns"))
            .otherwise(F.lit("rejects"))
        )
        cat_rows = (
            enriched.groupBy("bucket", cat.alias("cat"))
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        counts: dict[str, dict[int, int]] = {}
        for r in cat_rows:
            counts.setdefault(r["cat"], {})[r["bucket"]] = r["cnt"]

        def total(name: str) -> int:
            return sum(counts.get(name, {}).values())

        access = enriched.where(F.col("log_type") == "access")
        errors = enriched.where(F.col("log_type") == "error").select(
            "bucket", "conv_id", "turn_idx", "ts_parsed",
            "level", "module", "pid", "message", "text",
        )
        rejects = enriched.where(F.col("log_format").isNull()).select(
            "bucket", "conv_id", "turn_idx", "role", "tool", "ts", "text"
        )
        # per-row detectors only (global detectors run in the aggregate
        # stage); bucket survives from the enriched frame's layout
        row_events = (
            sec.attack_events(enriched, cfg)
            .unionByName(sec.scan_events(enriched, cfg))
            .withColumn("bucket", _bucket("conv_id", n_buckets))
        )
        row_events.persist(StorageLevel.MEMORY_AND_DISK)
        sev_counts: dict[str, int] = {}
        for r in row_events.groupBy("severity").agg(F.count("*").alias("cnt")).collect():
            sev_counts[r["severity"]] = r["cnt"]

        # Every sink below reads only the two persisted frames (both fully
        # materialized by the count jobs above), so the six writes are
        # independent Spark actions — submit them concurrently and let the
        # scheduler interleave; each writes a distinct sink_counts key.
        try:
            with ThreadPoolExecutor(max_workers=_sink_concurrency()) as pool:
                futures = [
                    pool.submit(_sink, result, access.drop("ts"), output_dir,
                                "parsed_turns", total("parsed_turns")),
                    pool.submit(_sink, result, errors, output_dir,
                                "error_turns", total("error_turns")),
                    pool.submit(_sink, result, rejects, output_dir,
                                "rejects", total("rejects")),
                ]
                futures += [
                    pool.submit(
                        _sink,
                        result,
                        row_events.where(F.col("severity") == severity),
                        output_dir,
                        name,
                        sev_counts.get(severity, 0),
                    )
                    for severity, name in ROW_SINKS_BY_SEVERITY.items()
                ]
                for f in futures:
                    f.result()  # re-raises the first failure
        finally:
            # always drop the cache blocks — a failed concurrent sink write
            # must not leak MEMORY_AND_DISK blocks for the session lifetime
            row_events.unpersist()
            enriched.unpersist()

    st.append_state(
        spark,
        output_dir,
        st.state_rows_from_counts(
            run_id, "route", counts.get("parsed_turns", {}), t.wall_ms, pending
        ),
    )


def _write_observed(df: DataFrame, output_dir: str, name: str) -> int:
    """Full-overwrite write with the row count observed INSIDE the write job
    (no separate count pass)."""
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    catalog.write_table(df, output_dir, name, mode="overwrite")
    return int(obs.get["n"])


def _aggregate_stage(
    spark: SparkSession,
    output_dir: str,
    run_id: str,
    result: PipelineResult,
    n_buckets: int,
    cfg: RuntimeConfig = DEFAULT_CONFIG,
) -> None:
    # A route stage whose every row was rejected writes zero parsed_turns
    # rows — and a bucket-partitioned write of an empty frame emits no
    # schema-bearing part files at all, so the sink dir is unreadable.
    # Nothing to aggregate: record the stage as done with zero counts
    # instead of crashing the run.
    if not catalog.table_exists(spark, output_dir, "parsed_turns"):
        st.append_state(
            spark,
            output_dir,
            [(run_id, "aggregate", -1, 0, "done", 0)],
        )
        return

    with st.StageTimer() as t:
        parsed = catalog.read_table(spark, output_dir, "parsed_turns")
        parsed.persist(StorageLevel.MEMORY_AND_DISK)

        agg_events = (
            sec.suspicious_ip_events(parsed, cfg=cfg)
            .unionByName(sec.brute_force_events(parsed, cfg))
            .unionByName(sec.unusual_method_events(parsed, cfg))
            .withColumn(
                "bucket",
                F.coalesce(_bucket("conv_id", n_buckets), F.lit(-1)),
            )
        )
        agg_events.persist(StorageLevel.MEMORY_AND_DISK)
        # Materialize BOTH caches with one job before the concurrent sink
        # fan-out (the detectors scan every parsed partition, so this count
        # fills parsed's blocks too). Without it the 5 concurrent jobs race
        # to compute the same cache blocks under the block-manager locks —
        # measured 2x wall-time on a cold cache. The route stage gets the
        # same effect from its lineage-count job.
        agg_events.count()

        metrics = perf.performance_metrics(parsed, cfg)
        anomalies = an.response_time_zscore_anomalies(parsed, cfg).select(
            "conv_id", "turn_idx", "event_ts", "metric_name",
            "expected_value", "actual_value", "z_score",
        ).unionByName(
            an.error_rate_iqr_anomalies(parsed, cfg=cfg).select(
                F.lit(None).cast("string").alias("conv_id"),
                F.lit(None).cast("int").alias("turn_idx"),
                "event_ts", "metric_name",
                "expected_value", "actual_value", "z_score",
            )
        )

        # Five independent full-overwrite sinks off the two persisted
        # frames; concurrent submission lets the scheduler overlap them
        # (cache blocks are computed once under Spark's block-level locks,
        # whichever job touches a partition first).
        def _observed_to(name: str, df: DataFrame) -> None:
            result.sink_counts[name] = _write_observed(df, output_dir, name)

        try:
            with ThreadPoolExecutor(max_workers=min(5, _sink_concurrency())) as pool:
                futures = [
                    pool.submit(
                        _observed_to, name,
                        agg_events.where(F.col("severity") == severity),
                    )
                    for severity, name in AGG_SINKS_BY_SEVERITY.items()
                ]
                futures.append(
                    pool.submit(_observed_to, "performance_metrics", metrics)
                )
                futures.append(pool.submit(_observed_to, "anomalies", anomalies))
                for f in futures:
                    f.result()

            # threat scores over the union of all routed events
            row_events = None
            for name in ROW_SINKS_BY_SEVERITY.values():
                if catalog.table_exists(spark, output_dir, name):
                    t_df = catalog.read_table(spark, output_dir, name)
                    row_events = t_df if row_events is None else row_events.unionByName(t_df)
            all_events = agg_events.drop("bucket")
            if row_events is not None:
                all_events = all_events.unionByName(row_events.drop("bucket"))
            scores = sec.ip_threat_scores(all_events, cfg)
            result.sink_counts["ip_threat_scores"] = _write_observed(
                scores, output_dir, "ip_threat_scores"
            )

            high_events = all_events.where(F.col("severity") == "high")
            passed_alerts = st.throttle_alerts(
                spark, output_dir, high_events, run_id, cfg=cfg,
            )
            if cfg.email.get("enabled"):
                # Delivery plane (notifier.py): O(alert types) rows leave
                # Spark; payload rows are limited in Spark before collect.
                from .notifier import EmailNotifier, deliver_throttled_alerts

                email_cfg = {"throttle_period": cfg.throttle_period, **cfg.email}
                result.sink_counts["alert_emails"] = deliver_throttled_alerts(
                    passed_alerts, EmailNotifier(email_cfg), alert_rows=high_events,
                )
        finally:
            agg_events.unpersist()
            parsed.unpersist()

    st.append_state(
        spark,
        output_dir,
        [(run_id, "aggregate", -1, sum(result.sink_counts.values()), "done", t.wall_ms)],
    )
