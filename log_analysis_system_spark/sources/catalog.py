"""Table catalog shim: Iceberg in production, Parquet-dir fallback locally.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar (no network), so the shim exposes one write/read API with two backends:

- ``iceberg``: ``df.writeTo(f"{catalog}.{name}")`` —
  ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...``
  on a real cluster; bucketed partition spec pushed into the table DDL.
- ``parquet`` (default here): directory-per-table with hive-style
  ``bucket=`` partitions and DYNAMIC partition overwrite, which gives the
  same idempotent per-bucket replace semantics our checkpoint/resume
  protocol needs (an Iceberg ``overwritePartitions`` equivalent).

Select with env ``SPARK_GRAFT_TABLE_FORMAT=iceberg|parquet``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_format() -> str:
    return os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")


def write_table(
    df: DataFrame,
    base_dir: str,
    name: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """``mode``: 'append', 'overwrite' (full), or 'overwrite_partitions'
    (replace only the partitions present in ``df`` — the resume path)."""
    if table_format() == "iceberg":
        writer = df.writeTo(f"graft.{name}")
        if mode == "append":
            writer.append()
        elif mode == "overwrite":
            writer.using("iceberg").createOrReplace()
        else:
            writer.overwritePartitions()
        return

    path = f"{base_dir}/{name}"
    w = df.write
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if mode == "overwrite_partitions":
        # dynamic mode: only partitions present in df are replaced
        w = w.option("partitionOverwriteMode", "dynamic")
        w.mode("overwrite").parquet(path)
    else:
        w.mode(mode).parquet(path)


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    if table_format() == "iceberg":
        return spark.read.table(f"graft.{name}")
    return spark.read.parquet(f"{base_dir}/{name}")


def table_exists(spark: SparkSession, base_dir: str, name: str) -> bool:
    if table_format() == "iceberg":
        return spark.catalog.tableExists(f"graft.{name}")
    # Hadoop-FS existence probe (works for file://, hdfs://, s3a://...)
    # instead of read.parquet + catch: the JVM logs the caught
    # AnalysisException at ERROR level, which reads as a failure in logs.
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/{name}")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return False
    # An empty/metadata-only directory is not a readable table yet
    # (parquet schema inference would fail on it).
    for status in fs.listStatus(path):
        leaf = status.getPath().getName()
        if not leaf.startswith("_") and not leaf.startswith("."):
            return True
    return False
