"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Spark-native: built from ``spark.range(n)`` + the same dual-dialect renderer
used for the oracle queries, so generation is fully distributed (no driver
materialization — scales to billions of turns for the bench tiers) and
byte-deterministic (xxhash64 has a fixed seed; no RNG state).

Skew: a ``hot_share`` fraction of turns is concentrated into ``hot_frac`` of
the conversations (FIXTURES.md: ~1% hot conversations) to exercise the
pipeline's salting/AQE paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.events_transcripts import render_transcripts

BASE_TS = "2023-10-10 13:55:36"  # the reference fixtures' epoch


def synth_events(
    spark: SparkSession,
    n_turns: int,
    n_convs: int,
    hot_frac: float = 0.01,
    hot_share: float = 0.25,
    partitions: int | None = None,
) -> DataFrame:
    """An events-shaped frame (event_id, user_id, ts) feeding the renderer."""
    n_hot = max(1, int(n_convs * hot_frac))
    n_cold = max(1, n_convs - n_hot)
    ids = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)
    hot_cut = int(hot_share * 1000)
    user_id = (
        F.when(
            F.pmod(F.col("id"), F.lit(1000)) < hot_cut,
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_hot)),
        )
        .otherwise(F.lit(n_hot) + F.pmod(F.xxhash64(F.col("id") + 7919), F.lit(n_cold)))
        .cast("long")
    )
    # ts strictly increasing in id -> monotone within every conversation
    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_dt_interval(secs=F.col("id") * 3)
    return ids.select(
        F.col("id").alias("event_id"),
        ts.alias("ts"),
        user_id.alias("user_id"),
    )


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    n_convs: int,
    hot_frac: float = 0.01,
    hot_share: float = 0.25,
    partitions: int | None = None,
) -> DataFrame:
    """Transcripts with the exact input_hint schema
    (conv_id, turn_idx, role, text, tool, ts)."""
    return render_transcripts(
        synth_events(spark, n_turns, n_convs, hot_frac, hot_share, partitions)
    )


def write_transcripts(
    spark: SparkSession, path: str, n_turns: int, n_convs: int, **kw
) -> None:
    synth_transcripts(spark, n_turns, n_convs, **kw).write.mode("overwrite").parquet(
        path
    )
