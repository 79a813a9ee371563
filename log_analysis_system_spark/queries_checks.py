"""Decidable-invariant wrapper queries for the approximate operators.

The five probabilistic operators (LSH embedding dedup, LSH/IVF ANN, HLL
distinct, KLL percentiles) cannot be value-hash-compared to a DuckDB
oracle — the sketch/bucketing machinery has no SQL analog. But each has
DECIDABLE invariants, and Spark can compute them itself: the wrapper runs
the approximate operator AND its exact counterpart in one plan and emits
the invariant verdicts (plus any exactly-recomputable scalars) as a small
frame whose oracle is the constant expected row. A broken LSH / sketch
flips a boolean and the driver gate catches it — this generalizes the
``ann_ivf_fullprobe`` trick so the gate has ZERO rows-only entries.

Invariants per operator:

- ``dedup_embedding_lsh_check``: emitted pairs are a subset of the exact
  all-pairs operator's output (the verify stage guarantees it — a
  violation means the verify threshold drifted) and recall >= 0.85 (the
  corpus's weak-pair regime measures ~0.93 at sf0.01, ~0.96 at sf0.1);
  ``n_exact_pairs`` is recomputed independently by the DuckDB oracle.
- ``ann_lsh_check`` / ``ann_ivf_check``: pair recall vs brute-force exact
  top-k >= 0.5 (floor far under the measured ~0.9+ — this is a collapse
  detector, not a tuning gate), every query returns a full-k result, and
  (IVF) the reported cosine of every returned pair equals the
  independently recomputed exact cosine at 6 dp.
- ``approx_distinct_check``: per-day HLL estimate within 10% of the exact
  distinct count (rsd=0.02 -> 10% is a >4-sigma bound); day / n_events /
  exact_users are oracle-exact columns.
- ``percentiles_approx_check``: per-type KLL percentile verified in the
  RANK domain (the sketch's actual guarantee: returned element's rank
  within n/accuracy of the target rank) — scale-free, unlike a
  value-relative bound; event_type / n are oracle-exact columns.

Scale note: each check runs the approximate operator at its normal scale
shape plus an exact baseline — the baselines are the test-scale cost; at
production scale one runs the operator, not the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import similarity as sim
from .queries_data import N_ANN_QUERIES, _COS, _NORM_POS, _emb

DEDUP_LSH_RECALL_FLOOR = 0.85
ANN_RECALL_FLOOR = 0.5
HLL_REL_ERR_BOUND = 0.10
PCTL_ACCURACY = 10000  # approx_percentile accuracy -> rank error <= n/accuracy


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


def q_dedup_embedding_lsh_check(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    exact = dd.embedding_cosine_pairs(emb).select("id_a", "id_b")
    lsh = dd.embedding_cosine_pairs_lsh(emb).select("id_a", "id_b")
    hits = lsh.join(exact, ["id_a", "id_b"], "left_semi")
    extra = lsh.join(exact, ["id_a", "id_b"], "left_anti")
    return (
        exact.agg(F.count("*").alias("n_exact_pairs"))
        .join(F.broadcast(hits.agg(F.count("*").alias("n_hit"))))
        .join(F.broadcast(extra.agg(F.count("*").alias("n_extra"))))
        .select(
            "n_exact_pairs",
            (F.col("n_extra") == 0).alias("pairs_subset_of_exact"),
            (
                F.col("n_hit")
                >= F.col("n_exact_pairs") * F.lit(DEDUP_LSH_RECALL_FLOOR)
            ).alias("recall_floor_met"),
        )
    )


def _ann_recall_frame(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """(n_queries, full_k, recall_floor_met) for an ANN result vs the
    brute-force exact top-k: pair-level recall over all queries, and every
    query must return exactly k rows (the corpus is far larger than k, so a
    short result means buckets/probes collapsed)."""
    hits = approx.join(
        exact.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    per_q = approx.groupBy("query_id").agg(F.count("*").alias("k_rows"))
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count("*").alias("n_exact"),
        )
        .join(F.broadcast(hits.agg(F.count("*").alias("n_hit"))))
        .join(
            F.broadcast(
                per_q.agg(
                    F.min("k_rows").alias("min_k"),
                    F.count("*").alias("n_q_approx"),
                )
            )
        )
        .select(
            "n_queries",
            (
                (F.col("min_k") == F.lit(sim.DEFAULT_K))
                & (F.col("n_q_approx") == F.col("n_queries"))
            ).alias("full_k"),
            (
                F.col("n_hit") >= F.col("n_exact") * F.lit(ANN_RECALL_FLOOR)
            ).alias("recall_floor_met"),
        )
    )


def q_ann_lsh_check(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES)
    exact = sim.brute_force_topk(emb, q)
    approx = sim.ann_lsh_bucketed(emb, q)
    return _ann_recall_frame(exact, approx)


def q_ann_ivf_check(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES)
    exact = sim.brute_force_topk(emb, q)
    approx = sim.ann_ivf(emb, q)
    base = _ann_recall_frame(exact, approx)
    # reported cosine must equal the independently recomputed exact cosine
    # (same sequential zip_with dot product -> bit-identical at 6 dp)
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    re_scored = (
        approx.join(
            v.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")),
            "query_id",
        )
        .join(
            v.select(
                F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ne")
            ),
            "neighbor_id",
        )
    )
    dot = F.aggregate(
        F.zip_with("qe", "ne", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda a, x: a + x * x)
    )
    n_bad = re_scored.where(
        F.col("cosine")
        != F.round(F.try_divide(dot, norm("qe") * norm("ne")), 6)
    ).agg(F.count("*").alias("n_bad_cosine"))
    return base.join(F.broadcast(n_bad)).select(
        "n_queries",
        "full_k",
        "recall_floor_met",
        (F.col("n_bad_cosine") == 0).alias("cosines_exact"),
    )


def q_approx_distinct_check(spark, sf_dir):
    ev = _events(spark, sf_dir)
    agg = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "day",
        "n_events",
        "exact_users",
        (err <= F.lit(HLL_REL_ERR_BOUND)).alias("err_ok"),
    ).orderBy("day")


def q_percentiles_approx_check(spark, sf_dir):
    """Rank-domain check of ``approx_percentile`` — the guarantee the KLL
    sketch actually makes. A value-relative bound (the first version of
    this check) is a corpus-regime claim: the element-returning sketch
    can differ from the interpolating exact percentile by the full gap
    between adjacent order statistics, which on a small or coarse group
    exceeds any fixed relative tolerance even when the sketch is
    perfect. The sketch's real contract is on RANKS: the returned
    element's rank is within ``accuracy^-1 * n`` of the target rank. So
    for each (event_type, percentile p) the check verifies

        count(value < a) <= p * n_vals + slack  AND
        count(value <= a) >= p * n_vals - slack,
        slack = max(1, ceil(n_vals / PCTL_ACCURACY))

    — exact, decidable, and scale-free (green at every SF, and on the
    hostile fixture's all-NULL-value / NULL-type groups, which yield a
    vacuous TRUE / their own group row respectively). ``n`` stays the
    oracle-exact ``count(*)``; ranks use the non-NULL value count the
    percentile functions themselves see.
    """
    pcts = [0.5, 0.95, 0.99]
    ev = _events(spark, sf_dir).select("event_type", "value")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("value").alias("n_vals"),
        F.approx_percentile(
            "value", F.array(*[F.lit(p) for p in pcts]), PCTL_ACCURACY
        ).alias("ap"),
    )
    probes = agg.select(
        "event_type", "n", "n_vals",
        F.posexplode_outer("ap").alias("pi", "a"),
    )
    # eqNullSafe: a NULL event_type is a legitimate group on both
    # engines, and a plain equi-join would silently drop its values here
    vals = ev.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("v_type"), "value"
    )
    ranks = (
        probes.join(
            vals, probes["event_type"].eqNullSafe(vals["v_type"]), "left"
        )
        .groupBy("event_type", "n", "n_vals", "pi", "a")
        .agg(
            F.sum(
                F.when(F.col("value") <= F.col("a"), 1).otherwise(0)
            ).alias("n_le"),
            F.sum(
                F.when(F.col("value") < F.col("a"), 1).otherwise(0)
            ).alias("n_lt"),
        )
    )
    target = (
        F.array(*[F.lit(p) for p in pcts])[F.col("pi")] * F.col("n_vals")
    )
    slack = F.greatest(
        F.lit(1.0),
        F.ceil(F.col("n_vals") / F.lit(PCTL_ACCURACY)).cast("double"),
    )
    ok = F.when(F.col("a").isNull(), F.lit(True)).otherwise(
        (F.col("n_lt") <= target + slack) & (F.col("n_le") >= target - slack)
    )
    per = ranks.select("event_type", "n", "pi", ok.alias("ok"))
    return (
        per.groupBy("event_type", "n")
        .agg(
            *[
                F.coalesce(
                    F.min(F.when(F.col("pi") == i, F.col("ok"))), F.lit(True)
                ).alias(name)
                for i, name in enumerate(("p50_ok", "p95_ok", "p99_ok"))
            ]
        )
        .orderBy("event_type")
    )


QUERIES = {
    "dedup_embedding_lsh_check": q_dedup_embedding_lsh_check,
    "ann_lsh_check": q_ann_lsh_check,
    "ann_ivf_check": q_ann_ivf_check,
    "approx_distinct_check": q_approx_distinct_check,
    "percentiles_approx_check": q_percentiles_approx_check,
}

ORACLES = {
    "dedup_embedding_lsh_check": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           WHERE {_NORM_POS}),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_COS.format(a="a.e", b="b.e")} AS cosine
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS pairs_subset_of_exact,
       TRUE AS recall_floor_met
FROM scored WHERE cosine >= {dd.COSINE_DUP_THRESHOLD}
""",
    "ann_lsh_check": f"""
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       TRUE AS full_k,
       TRUE AS recall_floor_met
FROM embeddings WHERE vec_id < {N_ANN_QUERIES} AND {_NORM_POS}
""",
    "ann_ivf_check": f"""
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       TRUE AS full_k,
       TRUE AS recall_floor_met,
       TRUE AS cosines_exact
FROM embeddings WHERE vec_id < {N_ANN_QUERIES} AND {_NORM_POS}
""",
    "approx_distinct_check": """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS err_ok
FROM events GROUP BY 1 ORDER BY day
""",
    "percentiles_approx_check": """
SELECT event_type, count(*) AS n,
       TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
FROM events GROUP BY event_type ORDER BY event_type
""",
}
