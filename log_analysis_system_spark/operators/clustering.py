"""Embedding clustering: deterministic Lloyd's k-means over the
``embeddings`` table.

The corpus-curation primitive behind cluster-based data selection
(semantic dedup buckets, per-cluster sampling quotas, diversity-aware
mixing): assign every embedding to one of ``k`` centroids by squared
Euclidean distance, refine centroids for a FIXED number of iterations
from a FIXED init, so the result is a pure function of the data —
cross-engine verifiable against an exactly-unrolled SQL oracle (each
iteration is one assignment CTE + one centroid-update CTE in DuckDB).

Beyond-reference operator (SURVEY §2.10): the reference has no vector
path at all; its nearest analog is the severity-bucket routing, which is
a static rule, not learned structure.

Determinism policy (the cross-engine float contract, same as
``dedup.embedding_cosine_pairs``):

- init = the ``k`` smallest vec_ids' embeddings (no rand());
- every centroid coordinate is rounded to 6 dp at every iteration
  boundary, so engine-side summation-order noise (~1 ulp) cannot
  compound across iterations;
- assignment distances are rounded to 6 dp and ties broken by the
  smaller cluster id via lexicographic [dist, cluster] min — both
  engines resolve a tie identically instead of diverging on the last
  ulp of a float compare.

Scale shape (100 TB): per iteration, assignment is a single scan with
the k centroids inlined as LITERALS (k*dim doubles — no join, no
broadcast table, whole row stays in one projection); the centroid
update is a (cluster, dim) partial aggregation — dim-bounded shuffle
keys, the same shape as ``datapipe.embedding_centroids``; the only
driver-side data is the k*dim rounded centroid matrix (metadata, not
data). Iterations are full scans by construction — that is Lloyd's
algorithm, not a plan defect; persist the input once and each scan is
cache-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KMEANS_K = 10
KMEANS_ITERS = 3


def _dist2(cent: list[float]):
    """Rounded squared L2 distance from the embedding column to one
    literal centroid: fold-left sum of per-dim squared diffs in double.
    The DuckDB oracle computes the identical comprehension; round(6)
    absorbs summation-order ulps before the argmin compares."""
    arr = F.array(*[F.lit(float(v)) for v in cent])
    return F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                arr,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def _assign(emb: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """(vec_id, cluster): argmin over literal centroids, ties to the
    smaller cluster id (lexicographic [dist, id] minimum)."""
    best = F.array_min(
        F.array(
            *[
                F.array(_dist2(cents[i]), F.lit(float(i)))
                for i in sorted(cents)
            ]
        )
    )
    return emb.select(
        "vec_id", F.element_at(best, 2).cast("int").alias("cluster")
    )


def kmeans_assignments(
    emb: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITERS
) -> DataFrame:
    """Final (vec_id, cluster) after ``n_iter`` Lloyd iterations from the
    deterministic init (see module docstring for the float contract)."""
    # eager localCheckpoint (repo cache policy — no bare persist): the
    # 2*n_iter+1 scans below all read the same pinned materialization
    emb = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    init_rows = (
        emb.where(F.col("vec_id") < k)
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.round(x.cast("double"), 6)
            ).alias("c"),
        )
        .collect()
    )
    cents = {int(r["vec_id"]): list(r["c"]) for r in init_rows}
    if len(cents) < k:
        raise ValueError(f"need vec_ids 0..{k-1} for init, got {len(cents)}")

    for _ in range(n_iter):
        assigned = _assign(emb, cents)
        # centroid update: (cluster, dim) partial agg; k*dim rows collect
        new_rows = (
            assigned.join(emb, "vec_id")
            .select("cluster", F.posexplode("embedding").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("m"))
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in new_rows:
            new.setdefault(int(r["cluster"]), [0.0] * len(cents[0]))[
                int(r["dim"])
            ] = float(r["m"])
        # empty cluster: carry the previous centroid forward
        cents = {i: new.get(i, cents[i]) for i in range(k)}

    out = _assign(emb, cents)
    return out


PER_CLUSTER = 20


def cluster_balanced_sample(
    emb: DataFrame,
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITERS,
    per_cluster: int = PER_CLUSTER,
) -> DataFrame:
    """Diversity-aware selection: k-means the corpus, then keep the top
    ``per_cluster`` vectors of EVERY cluster under a deterministic
    md5 priority — the cluster-balanced pruning shape of SemDeDup-style
    curation (Abbas et al. 2023): uniform sampling over-represents dense
    regions; sampling a fixed quota per semantic cluster flattens that.

    Priority is ``md5_hash60(vec_id)`` (tie-break vec_id) — the same
    engine-portable seeded-shuffle trick as ``datapipe.stratified_sample``.

    Output: ``(vec_id, cluster, rank)`` for kept rows, rank 1-based
    within cluster.

    Scale shape: the clustering cost is `kmeans_assignments`; the quota
    pass is ONE cluster-keyed shuffle of (vec_id, cluster, pri) scalar
    rows + a rank window — per-cluster sequential like every top-k, with
    k clusters as the parallel unit (raise k, not the quota, at corpus
    scale).
    """
    from pyspark.sql import Window

    from ..functions.texthash import md5_hash60

    assign = kmeans_assignments(emb, k, n_iter)
    pri = assign.select(
        "vec_id",
        "cluster",
        md5_hash60(F.col("vec_id").cast("string")).alias("pri"),
    )
    w = Window.partitionBy("cluster").orderBy("pri", "vec_id")
    return (
        pri.select(
            "vec_id",
            "cluster",
            F.row_number().over(w).alias("rank"),
        )
        .where(F.col("rank") <= per_cluster)
        .select("vec_id", "cluster", F.col("rank").cast("int").alias("rank"))
    )


def cluster_purity(
    emb: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITERS
) -> DataFrame:
    """Per-cluster label purity: how well the unsupervised clusters
    recover the ``label`` column — the standard clustering-quality check
    before trusting cluster-level curation decisions.

    Output: ``(cluster, n_points, majority_label, purity)`` where
    purity = majority-label count / cluster size, ties on the majority
    broken toward the SMALLER label id (the [count, -label] lexicographic
    max, computed identically in the SQL oracle).

    Scale shape: (cluster, label) partial agg — k*|labels| cells — then a
    k-row reduction; integer counts divide exactly on both engines.
    """
    assign = kmeans_assignments(emb, k, n_iter)
    cells = (
        assign.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("c"))
    )
    best = F.max(
        F.struct(
            F.col("c").alias("c"),
            (-F.col("label").cast("long")).alias("neg_label"),
        )
    )
    return cells.groupBy("cluster").agg(
        F.sum("c").cast("bigint").alias("n_points"),
        (-best.getField("neg_label")).cast("int").alias("majority_label"),
        F.round(best.getField("c") / F.sum("c"), 6).alias("purity"),
    )
