"""--report console rendering over a completed run's sinks (reference
``dashboard.py:98-222`` sections)."""

from __future__ import annotations

import pytest

from log_analysis_system_spark.datagen.transcripts import synth_transcripts
from log_analysis_system_spark.pipeline import run_pipeline
from log_analysis_system_spark.report import render_report


@pytest.fixture(scope="module")
def run_output(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("report_run")
    df = synth_transcripts(spark, n_turns=2000, n_convs=20)
    run_pipeline(spark, df, str(out), "report-run", n_buckets=4)
    return str(out)


def test_report_contains_all_sections(spark, run_output):
    text = render_report(spark, run_output)
    for section in (
        "SAMPLE OF PARSED LOG DATA",
        "PERFORMANCE ANALYSIS",
        "SECURITY ANALYSIS",
        "ANOMALY DETECTION",
    ):
        assert section in text
    # endpoint-stats content: the status table and overall stats render
    assert "Status Code Distribution:" in text
    assert "Overall Error Rate:" in text
    # threat-score section renders with the score table header
    assert "IP Threat Scores:" in text
    assert "Threat Level" in text
    assert "Potential Threats Detected:" in text


def test_report_via_cli(spark, run_output, capsys):
    """--report works without --input and prints the sections."""
    from log_analysis_system_spark.__main__ import main

    rc = main(["--report", "--output", run_output])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SECURITY ANALYSIS" in out and "PERFORMANCE ANALYSIS" in out


def test_report_on_empty_dir(spark, tmp_path):
    """No sinks -> graceful report, not an exception."""
    text = render_report(spark, str(tmp_path))
    assert "No parsed_turns sink found." in text
    assert "No security events detected" in text
