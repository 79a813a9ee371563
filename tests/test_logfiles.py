"""Raw ``.log`` directory ingest (reference ``helpers.py:95-119`` glob +
``main.py:113-145`` per-line read): round-trip fidelity, split-safe line
numbering, CLI front-door detection, and e2e sink-count parity with the
parquet input path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_system_spark.datagen.transcripts import synth_transcripts
from log_analysis_system_spark.pipeline import run_pipeline
from log_analysis_system_spark.sources.logfiles import read_log_dir, write_log_dir


@pytest.fixture(scope="module")
def log_dir_and_source(spark, tmp_path_factory):
    src = synth_transcripts(spark, n_turns=1000, n_convs=10)
    src.persist()
    src.count()
    d = tmp_path_factory.mktemp("rawlogs")
    n_files = write_log_dir(src, str(d))
    assert n_files == 10
    yield str(d), src
    src.unpersist()


def test_log_dir_roundtrip_text_and_order(spark, log_dir_and_source):
    """Per-turn text byte-equality under (conv_id, turn_idx) order — the
    BASELINE.json per-row invariant, applied to the raw-file front door."""
    d, src = log_dir_and_source
    got = read_log_dir(spark, d)
    assert got.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in got.orderBy("conv_id", "turn_idx").collect()
    ]
    b = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in src.orderBy("conv_id", "turn_idx").collect()
    ]
    assert a == b


def test_log_dir_line_numbers_survive_file_splits(spark, tmp_path):
    """A file larger than one split is read by several tasks; the
    (file_block_start, mono_id) ordering must still reconstruct exact file
    order. Force multi-split reads with a tiny maxPartitionBytes."""
    lines = [f"line-{i:06d}" for i in range(5000)]
    p = tmp_path / "big.log"
    p.write_text("\n".join(lines) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        got = read_log_dir(spark, str(tmp_path))
        assert got.rdd.getNumPartitions() >= 1
        rows = got.orderBy("turn_idx").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert [r["text"] for r in rows] == lines
    assert [r["turn_idx"] for r in rows] == list(range(5000))
    assert {r["conv_id"] for r in rows} == {"big"}


def test_cli_load_input_detects_log_dir(spark, log_dir_and_source):
    from log_analysis_system_spark.__main__ import load_input

    d, src = log_dir_and_source
    df = load_input(spark, d)
    assert df.count() == src.count()
    assert set(df.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_log_dir_pipeline_sink_counts_match_parquet_path(
    spark, log_dir_and_source, tmp_path_factory
):
    """The raw-file front door must route every line exactly like the
    parquet path: identical per-sink counts (sinks depend only on text +
    conv_id, both preserved by the round trip)."""
    d, src = log_dir_and_source
    out_a = tmp_path_factory.mktemp("pipe_parquet")
    out_b = tmp_path_factory.mktemp("pipe_logs")
    res_a = run_pipeline(spark, src, str(out_a), "runA", n_buckets=8)
    res_b = run_pipeline(
        spark, read_log_dir(spark, d), str(out_b), "runB", n_buckets=8
    )
    assert res_a.sink_counts == res_b.sink_counts
    assert res_b.aggregate_ran
    assert sum(
        v for k, v in res_b.sink_counts.items()
        if k in ("parsed_turns", "error_turns", "rejects")
    ) == src.count()


def test_cli_load_input_single_log_file(spark, log_dir_and_source):
    """Reference dashboard.py --logfile parity: a single raw log file is a
    valid --input (one conversation = that file)."""
    import glob as globmod

    from log_analysis_system_spark.__main__ import load_input

    d, _ = log_dir_and_source
    one = sorted(globmod.glob(f"{d}/*.log"))[0]
    df = load_input(spark, one)
    rows = df.select("conv_id").distinct().collect()
    assert len(rows) == 1
    assert rows[0]["conv_id"] + ".log" == one.rsplit("/", 1)[-1]
    assert df.count() > 0
