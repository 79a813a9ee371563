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


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Spark-managed BUCKETED table: rows hash-clustered (and sorted)
    by ``bucket_col`` at write time, so every later join / groupBy on that
    key reads co-located, pre-sorted buckets and plans NO Exchange — the
    shuffle is paid once at ingest instead of per query. This is the
    co-located-join layout the 100 TB design bets on for repeated fact-
    fact joins (the Iceberg equivalent is a ``bucket(n, col)`` partition
    transform in the table DDL; ``writeTo(...).partitionedBy(bucket(...))``
    on the iceberg backend).

    Hive-style bucketing requires ``saveAsTable`` (a catalog entry carries
    the bucket spec); ``path`` makes it an external table at that location.
    """
    if table_format() == "iceberg":
        from pyspark.sql.functions import bucket, col

        df.writeTo(f"graft.{name}").partitionedBy(
            bucket(n_buckets, col(bucket_col))
        ).createOrReplace()
        return
    w = df.write.bucketBy(n_buckets, bucket_col).sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.mode("overwrite").format("parquet").saveAsTable(name)


def compact_table(
    spark: SparkSession,
    base_dir: str,
    name: str,
    partition_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a (hive-partitioned parquet) table so
    each partition holds ONE file instead of the per-append fragments the
    fan-out sinks accumulate (every pipeline run appends >= 1 file per
    bucket per sink; after N runs a 10^12-row table is N-way fragmented and
    scan planning + open() overhead dominates small queries).

    Shape: one shuffle keyed on the partition columns (each partition's
    rows converge on one task -> one output file). STAGED SWAP, not
    read-and-overwrite: the compacted copy streams executor-to-executor
    into a staging directory (never materialized in memory — a 10^12-row
    table compacts with bounded executor footprint), then two filesystem
    renames swap it in. This is the same snapshot-style pattern Iceberg's
    `rewrite_data_files` procedure uses (write new files, commit a
    pointer flip); on the iceberg backend use that procedure directly.
    Readers holding the old directory open keep a consistent view until
    the rename; the swap window is two metadata ops, not a data rewrite.
    Returns the row count rewritten (an end-to-end conservation check
    for callers).
    """
    if table_format() == "iceberg":
        raise NotImplementedError(
            "use Iceberg's rewrite_data_files procedure on the iceberg backend"
        )
    cols = partition_cols or ["bucket"]
    from pyspark.sql import functions as F

    live = f"{base_dir}/{name}"
    staging = f"{base_dir}/{name}__compacting"
    retired = f"{base_dir}/{name}__retired"
    df = spark.read.parquet(live)
    compacted = df.repartition(*[F.col(c) for c in cols])
    compacted.write.partitionBy(*cols).mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(live).getFileSystem(conf)
    fs.delete(Path(retired), True)
    if not fs.rename(Path(live), Path(retired)):
        raise IOError(f"compact_table: could not retire {live}")
    if not fs.rename(Path(staging), Path(live)):
        # roll back: put the live table back before failing
        fs.rename(Path(retired), Path(live))
        raise IOError(f"compact_table: could not swap in {staging}")
    fs.delete(Path(retired), True)
    return n


def read_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    if table_format() == "iceberg":
        return spark.read.table(f"graft.{name}")
    return spark.read.parquet(f"{base_dir}/{name}")


def table_exists(spark: SparkSession, base_dir: str, name: str) -> bool:
    if table_format() == "iceberg":
        return spark.catalog.tableExists(f"graft.{name}")
    # Hadoop-FS existence probe first (works for file://, hdfs://,
    # s3a://...): the common not-there case must not go through
    # read.parquet + catch, whose caught AnalysisException the JVM logs at
    # ERROR level. Only when the directory exists with visible entries do
    # we confirm it is actually a READABLE parquet table (a half-written
    # dir — e.g. only empty bucket= subdirs — would pass a pure listing
    # check and then crash the caller's read). Any error, filesystem or
    # parquet, means "not usable as a table": return False, as callers
    # treat this as skip-the-sink.
    try:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(f"{base_dir}/{name}")
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return False
        if not any(
            not s.getPath().getName().startswith(("_", "."))
            for s in fs.listStatus(path)
        ):
            return False
        spark.read.parquet(f"{base_dir}/{name}").schema
        return True
    except Exception:  # noqa: BLE001
        return False
