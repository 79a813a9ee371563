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

from pyspark.sql import DataFrame, Window, functions as F

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


def kmeans_fit(
    emb: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITERS
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run ``n_iter`` Lloyd iterations from the deterministic init and
    return BOTH the final (vec_id, cluster) assignment frame and the
    final rounded centroid matrix — the k*dim driver-side metadata that
    downstream diagnostics (inertia) and curation passes (semantic dedup)
    need alongside the assignment."""
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
    return out, cents


def kmeans_assignments(
    emb: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITERS
) -> DataFrame:
    """Final (vec_id, cluster) after ``n_iter`` Lloyd iterations from the
    deterministic init (see module docstring for the float contract)."""
    return kmeans_fit(emb, k, n_iter)[0]


def kmeans_inertia(
    emb: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITERS
) -> DataFrame:
    """Per-cluster within-cluster sum of squared distances to the FINAL
    centroids — the clustering-quality diagnostic (elbow curves, "did k
    under-segment this corpus?") run before trusting cluster-level
    curation quotas.

    Output: ``(cluster, n_points, sse)``, sse = sum of the same rounded
    squared distances the assignment argmin compares, summed in
    DECIMAL(18,6) (partition-order-free — each distance is already a
    6-dp value, so the decimal sum is exact) and emitted as DOUBLE.

    Scale shape: one scan with the k centroids inlined as literals (the
    `_dist2` projection — no join), then a k-row partial agg. Nothing
    beyond the `kmeans_fit` cost itself.
    """
    cents = kmeans_fit(emb, k, n_iter)[1]
    d2 = F.array_min(
        F.array(
            *[
                F.array(_dist2(cents[i]), F.lit(float(i)))
                for i in sorted(cents)
            ]
        )
    )
    per_vec = emb.select(
        F.element_at(d2, 2).cast("int").alias("cluster"),
        F.element_at(d2, 1).cast("decimal(18,6)").alias("d2"),
    )
    return per_vec.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("d2").cast("double").alias("sse"),
    )


SEMDEDUP_TAU = 0.45


def semdedup(
    emb: DataFrame,
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITERS,
    tau: float = SEMDEDUP_TAU,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication that only compares embeddings WITHIN a k-means cluster
    — the published trick that turns corpus-quadratic cosine dedup into
    sum-over-clusters quadratic.

    A vector is a semantic duplicate iff some SMALLER-vec_id vector in
    its cluster has cosine >= ``tau`` — the deterministic keep-lowest-id
    representative policy shared with ``dedup.exact_duplicates``. (The
    paper keeps the vector farthest from the centroid; keep-lowest-id is
    the engine-portable equivalent policy — which member of a dup group
    survives is arbitrary by the paper's own ablation.)

    Cosine follows the repo-wide cross-engine float contract of
    ``dedup.embedding_cosine_pairs``: dot / (||a||*||b||) with
    left-to-right fold summation, rounded to 6 dp before the threshold
    compare, so both engines resolve a borderline pair identically.

    Output: ``(vec_id, cluster, is_dup)`` — one row per input vector;
    downstream keeps ``NOT is_dup``.

    Scale shape (100 TB): the pair join is equi-keyed on ``cluster`` —
    a hash-partitioned self-join whose cost is sum(|cluster|^2), NOT
    corpus^2; at 10^12 vectors raise k ~ N/target_cluster_size so the
    per-cluster quadratic term stays constant (the paper runs k=50k on
    LAION). The dup-id set is a vec_id semi-join back to the assignment
    frame. No broadcast of the corpus, no BNLJ.
    """
    assigned = kmeans_fit(emb, k, n_iter)[0].localCheckpoint(eager=False)
    # norm computed ONCE per vector (bitwise-identical to a per-pair
    # recompute of the same fold — pure expression over the same input)
    # and the joined+normed frame pinned so the pair join's two sides
    # don't each re-run the emb x assignment join
    v = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .join(assigned, "vec_id")
        .withColumn(
            "norm",
            F.sqrt(
                F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
            ),
        )
        .localCheckpoint(eager=False)
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    dup_ids = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        # try_divide: a zero-norm member gives NULL cosine (DuckDB's x/0
        # is NULL too), and NULL >= tau filters out on both engines — a
        # degenerate vector is never a semantic dup and can't make one
        .where(
            F.round(
                F.try_divide(dot, F.col("a.norm") * F.col("b.norm")), 6
            )
            >= tau
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    return assigned.join(dup_ids, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
    )


CONTRASTIVE_POS_TAU = 0.45
CONTRASTIVE_NEG_TAU = 0.05
CONTRASTIVE_NEG_PER_ANCHOR = 2


def contrastive_pairs(
    emb: DataFrame,
    k: int = KMEANS_K,
    n_iter: int = KMEANS_ITERS,
    pos_tau: float = CONTRASTIVE_POS_TAU,
    neg_tau: float = CONTRASTIVE_NEG_TAU,
    neg_per_anchor: int = CONTRASTIVE_NEG_PER_ANCHOR,
) -> DataFrame:
    """Contrastive training-pair mining (the SimCSE/E5-style corpus prep
    for embedding-model training): positives = near-duplicate pairs
    (cosine >= ``pos_tau``), hard negatives = pairs that share a k-means
    cluster (spatially close — that's what makes them HARD) yet are
    semantically dissimilar (cosine <= ``neg_tau``), capped at
    ``neg_per_anchor`` per anchor by the deterministic
    (cosine asc, id_b asc) order.

    Both sides are cluster-bounded (the SemDeDup trick): positives that
    straddle a cluster boundary are forfeited for the same
    sum-over-clusters-quadratic cost bound — the paper-standard recall
    tradeoff, and at 10^12 vectors the k ∝ N recipe applies unchanged.
    Cosine follows the repo-wide 6-dp round-before-compare contract.

    Output: ``(id_a, id_b, cosine, label)`` with ``id_a < id_b`` and
    label ∈ {'positive', 'hard_negative'} (disjoint by threshold).

    Scale shape: one cluster-equi-keyed pair join (norms precomputed per
    vector, frame pinned — the :func:`semdedup` plan), then a per-anchor
    rank window over the already-thresholded negative candidates. No
    corpus broadcast, no BNLJ.
    """
    assigned = kmeans_fit(emb, k, n_iter)[0].localCheckpoint(eager=False)
    v = (
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .join(assigned, "vec_id")
        .withColumn(
            "norm",
            F.sqrt(
                F.aggregate(F.col("v"), F.lit(0.0), lambda acc, x: acc + x * x)
            ),
        )
        .localCheckpoint(eager=False)
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(
        b,
        (F.col("a.cluster") == F.col("b.cluster"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        # try_divide: zero-norm member -> NULL cosine -> NULL label ->
        # dropped below; DuckDB's x/0 is NULL with the same CASE outcome
        F.round(
            F.try_divide(dot, F.col("a.norm") * F.col("b.norm")), 6
        ).alias("cosine"),
    )
    # ONE pass over the pair frame: label both sides in the same
    # projection, rank within (label, id_a) — for negatives this is the
    # same per-anchor rank as a negatives-only window (the group contains
    # exactly the thresholded candidates), and positives pass unfiltered.
    # Splitting into two branches would compute the pair dots twice.
    lab = pairs.withColumn(
        "label",
        F.when(F.col("cosine") >= pos_tau, F.lit("positive")).when(
            F.col("cosine") <= neg_tau, F.lit("hard_negative")
        ),
    ).where(F.col("label").isNotNull())
    w = Window.partitionBy("label", "id_a").orderBy(
        F.asc("cosine"), F.asc("id_b")
    )
    return (
        lab.withColumn("r", F.row_number().over(w))
        .where(
            (F.col("label") == "positive") | (F.col("r") <= neg_per_anchor)
        )
        .select("id_a", "id_b", "cosine", "label")
    )


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
