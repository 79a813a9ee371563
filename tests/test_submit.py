"""Deployment smoke test: the packaged engine runs under real
``spark-submit --py-files`` (the north-rule launch mode), with the package
imported FROM THE ZIP — not from the repo checkout.

The job subprocess gets a scrubbed PYTHONPATH and a cwd outside the repo,
so a passing run proves the zip is self-contained (no package-relative
data files, no repo-path assumptions) — the property a 1000-executor
cluster submit depends on.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = textwrap.dedent(
    """
    import sys
    # fail loudly if the repo leaked into the path: the package must come
    # from the --py-files zip
    assert not any(p.rstrip("/").endswith("/repo") for p in sys.path), sys.path
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("submit-smoke")
        .getOrCreate()
    )
    from log_analysis_system_spark.queries_log import QUERIES

    df = QUERIES["endpoint_stats"](spark, "/root/testdata/sf0.001")
    n = df.count()
    assert n > 0, "flagship query returned no rows under spark-submit"
    print(f"SUBMIT_OK rows={n} pkg={QUERIES['endpoint_stats'].__module__}")
    spark.stop()
    """
)


def test_spark_submit_pyfiles_runs_flagship_query(tmp_path):
    zip_path = tmp_path / "log_analysis_system_spark.zip"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package_pyfiles.py"),
         str(zip_path)],
        check=True,
        capture_output=True,
    )
    assert zip_path.exists() and zip_path.stat().st_size > 10_000

    job = tmp_path / "job.py"
    job.write_text(JOB)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--py-files", str(zip_path), str(job)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SUBMIT_OK rows=" in res.stdout, (res.stdout[-1000:], res.stderr[-1000:])
