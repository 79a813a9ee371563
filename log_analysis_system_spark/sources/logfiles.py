"""Raw ``.log`` directory ingest — the reference's primary front door.

The reference globs a directory of Apache log files and reads them line by
line (``helpers.py:95-119`` glob, ``main.py:113-145`` per-line read). This
module is the Spark-native equivalent: ``spark.read.text`` over the glob,
with per-file lineage and a deterministic per-file line number, shaped into
the transcripts contract ``(conv_id, turn_idx, role, text, tool, ts)`` so
the whole existing parse -> enrich -> route -> aggregate pipeline runs on
raw log files unchanged.

Line numbering at scale: a file larger than one split is read by several
tasks, so a bare ``monotonically_increasing_id`` ordering is not enough —
partition ids are assigned by the scheduler, not by file offset. The
``_metadata.file_block_start`` hidden column gives each split's byte offset
within its file, and ``monotonically_increasing_id`` is monotone WITHIN a
split (lines of a split are read sequentially), so ordering by
``(file_block_start, mono_id)`` per file reconstructs exact file order for
any file size. One shuffle on file_name — the same key the pipeline's
bucket layout shuffles on next, and files are the natural skew unit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_log_dir(
    spark: SparkSession, path: str, pattern: str = "*.log"
) -> DataFrame:
    """Read a directory of raw log files into the transcripts shape.

    - ``conv_id``  = file name without its extension (per-file lineage;
      ``input_file_name()``'s modern replacement ``_metadata.file_name``);
    - ``turn_idx`` = 0-based line number within the file (exact file order,
      split-safe — see module docstring);
    - ``text``     = the raw line;
    - ``role``/``tool`` = ``'log'`` / NULL (raw log files carry neither);
    - ``ts``       = the file's modification time (the per-line event time
      lives inside the line and is extracted by the parse stage, exactly
      like the reference's per-line datetime parse).
    """
    lines = spark.read.text(os.path.join(path, pattern))
    meta = lines.select(
        F.col("value").alias("text"),
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.file_block_start").alias("block_start"),
        F.col("_metadata.file_modification_time").alias("ts"),
        F.monotonically_increasing_id().alias("mono"),
    )
    w = Window.partitionBy("file_name").orderBy("block_start", "mono")
    return meta.select(
        F.regexp_replace("file_name", r"\.[^.]*$", "").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("log").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )


def write_log_dir(transcripts: DataFrame, path: str) -> int:
    """Test/fixture helper: materialize a transcripts frame as one
    ``<conv_id>.log`` per conversation, lines in turn order (the inverse of
    :func:`read_log_dir`, driver-side — fixtures are small by definition).
    Returns the number of files written."""
    os.makedirs(path, exist_ok=True)
    rows = (
        transcripts.select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    files: dict[str, list[str]] = {}
    for r in rows:
        files.setdefault(r["conv_id"], []).append(r["text"])
    for conv_id, lines in files.items():
        with open(os.path.join(path, f"{conv_id}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
    return len(files)
