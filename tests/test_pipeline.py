"""End-to-end pipeline tests: fan-out sinks, lineage/state, resume
idempotence (SURVEY §5 rebuild test plan layer 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_system_spark.datagen.transcripts import synth_transcripts
from log_analysis_system_spark.functions.parse import parse_transcripts
from log_analysis_system_spark.operators import security as sec
from log_analysis_system_spark.pipeline import run_pipeline
from log_analysis_system_spark.sources import catalog


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synth_transcripts(spark, n_turns=4000, n_convs=40)
    df.persist()
    df.count()
    yield df
    df.unpersist()


def _read(spark, out, name):
    return catalog.read_table(spark, str(out), name)


def test_pipeline_fanout_counts(spark, transcripts, tmp_path_factory):
    out = tmp_path_factory.mktemp("pipe")
    res = run_pipeline(spark, transcripts, str(out), "run1", n_buckets=8)
    assert res.aggregate_ran
    assert sorted(res.buckets_processed) == list(range(8))

    parsed = parse_transcripts(transcripts)
    n_access = parsed.where(F.col("log_type") == "access").count()
    n_error = parsed.where(F.col("log_type") == "error").count()
    n_reject = parsed.where(F.col("log_format").isNull()).count()
    assert n_access + n_error + n_reject == 4000

    assert _read(spark, out, "parsed_turns").count() == n_access
    assert _read(spark, out, "error_turns").count() == n_error
    assert _read(spark, out, "rejects").count() == n_reject

    # per-severity fan-out equals the detectors run directly
    events = sec.all_security_events(parsed)
    by_sev = {
        r.severity: r.n
        for r in events.groupBy("severity").agg(F.count("*").alias("n")).collect()
    }
    got_high = (
        _read(spark, out, "security_events_high").count()
        + _read(spark, out, "security_events_agg_high").count()
    )
    got_med = (
        _read(spark, out, "security_events_medium").count()
        + _read(spark, out, "security_events_agg_medium").count()
    )
    assert got_high == by_sev.get("high", 0)
    assert got_med == by_sev.get("medium", 0)

    # state table has one 'done' row per bucket plus the aggregate stage
    state = _read(spark, out, "state_metrics")
    route_rows = state.where(F.col("stage") == "route").collect()
    assert {r.bucket for r in route_rows} == set(range(8))
    assert all(r.status == "done" for r in route_rows)
    # lineage row counts match the parsed sink per bucket
    sink_by_bucket = {
        r.bucket: r.n
        for r in _read(spark, out, "parsed_turns")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    state_by_bucket = {r.bucket: r.row_count for r in route_rows}
    assert state_by_bucket == {
        b: sink_by_bucket.get(b, 0) for b in range(8)
    }


def test_pipeline_resume_idempotent(spark, transcripts, tmp_path_factory):
    out = tmp_path_factory.mktemp("pipe_resume")
    # crash after the route stage
    res1 = run_pipeline(
        spark, transcripts, str(out), "run1", n_buckets=8, fail_after_route=True
    )
    assert not res1.aggregate_ran

    # resume: route buckets are all done -> skipped; aggregate runs
    res2 = run_pipeline(spark, transcripts, str(out), "run1", n_buckets=8)
    assert res2.buckets_processed == []
    assert res2.buckets_skipped == list(range(8))
    assert res2.aggregate_ran

    # a third full rerun must not duplicate anything (dynamic overwrite)
    n_parsed = _read(spark, out, "parsed_turns").count()
    res3 = run_pipeline(spark, transcripts, str(out), "run1", n_buckets=8)
    assert _read(spark, out, "parsed_turns").count() == n_parsed

    # and a no-resume rerun rewrites in place, still no dupes
    run_pipeline(spark, transcripts, str(out), "run1", n_buckets=8, resume=False)
    assert _read(spark, out, "parsed_turns").count() == n_parsed


def test_alert_throttling(spark, transcripts, tmp_path_factory):
    from log_analysis_system_spark import state as st

    out = tmp_path_factory.mktemp("alerts")
    parsed = parse_transcripts(transcripts)
    events = sec.all_security_events(parsed)
    high = events.where(F.col("severity") == "high")

    # first batch: every alert_type passes and is recorded
    passed1 = st.throttle_alerts(spark, str(out), high, "r1", now_epoch=1_000_000)
    types1 = {r.alert_type for r in passed1.collect()}
    assert types1

    # same types within the throttle period -> suppressed (notifier.py:50-77)
    passed2 = st.throttle_alerts(
        spark, str(out), high, "r2", now_epoch=1_000_000 + 100
    )
    assert passed2.count() == 0

    # after the period expires -> pass again
    passed3 = st.throttle_alerts(
        spark, str(out), high, "r3", now_epoch=1_000_000 + 4000
    )
    assert {r.alert_type for r in passed3.collect()} == types1


def test_bucketed_tables_join_without_exchange(spark, tmp_path_factory):
    """write_bucketed_table pays the shuffle at ingest: a fact-fact join on
    the bucket key over two co-bucketed tables must plan NO shuffle
    Exchange (the 100 TB repeated-join layout)."""
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text"
    )
    meta = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "id % 7 AS quality_bin"
    )
    catalog.write_bucketed_table(docs, "bkt_docs", "doc_id", 8, str(base / "d"))
    catalog.write_bucketed_table(meta, "bkt_meta", "doc_id", 8, str(base / "m"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join to consider a shuffle (broadcast would hide it)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_docs").join(spark.table("bkt_meta"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
        # and the bucket layout serves bucket-key aggregation shuffle-free
        agg = spark.table("bkt_docs").groupBy("doc_id").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_docs")
        spark.sql("DROP TABLE IF EXISTS bkt_meta")


def test_compact_table_one_file_per_partition(spark, tmp_path_factory):
    """Two appends fragment each bucket into >= 2 files; compaction must
    leave exactly one file per bucket with the row multiset unchanged."""
    import glob

    base = str(tmp_path_factory.mktemp("compact"))
    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(id % 4 AS INT) AS bucket", "concat('v', id) AS payload"
    )
    catalog.write_table(df, base, "t", partition_cols=["bucket"], mode="append")
    catalog.write_table(df, base, "t", partition_cols=["bucket"], mode="append")

    def files_per_bucket():
        return {
            b: len(glob.glob(f"{base}/t/bucket={b}/*.parquet")) for b in range(4)
        }

    assert all(n >= 2 for n in files_per_bucket().values())
    before = spark.read.parquet(f"{base}/t")
    before_counts = {r["id"]: r["count"] for r in before.groupBy("id").count().collect()}

    n = catalog.compact_table(spark, base, "t", partition_cols=["bucket"])
    assert n == 4000
    assert all(n == 1 for n in files_per_bucket().values()), files_per_bucket()
    after = spark.read.parquet(f"{base}/t")
    after_counts = {r["id"]: r["count"] for r in after.groupBy("id").count().collect()}
    assert after_counts == before_counts and after.count() == 4000
    # staged swap leaves no staging/retired residue behind
    import os

    assert not os.path.exists(f"{base}/t__compacting")
    assert not os.path.exists(f"{base}/t__retired")
    # idempotent: a second compaction is a no-op rewrite, same multiset
    assert catalog.compact_table(spark, base, "t", partition_cols=["bucket"]) == 4000
    assert all(n == 1 for n in files_per_bucket().values())


def test_pipeline_survives_all_rejects_input(spark, tmp_path_factory):
    """A feed where every payload is unparseable produces an empty
    parsed_turns sink — which, bucket-partitioned, contains no
    schema-bearing files. The aggregate stage must record itself done
    with zero counts instead of crashing on the unreadable table."""
    out = str(tmp_path_factory.mktemp("allrej"))
    garbage = spark.range(20).select(
        F.concat(F.lit("conv"), (F.col("id") % 4).cast("string")).alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.lit("completely unparseable payload ###").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
    )
    res = run_pipeline(spark, garbage, out, run_id="allrej-1", resume=False)
    assert res.aggregate_ran
    assert res.sink_counts["rejects"] == 20
    assert res.sink_counts["parsed_turns"] == 0
    rej = catalog.read_table(spark, out, "rejects")
    assert rej.count() == 20
