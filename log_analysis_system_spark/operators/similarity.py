"""Approximate-nearest-neighbor search over an embedding column.

Three operators, all over ``embeddings (vec_id bigint, embedding
array<float>, label int)``:

- ``brute_force_topk``: exact cosine top-k via JVM expressions
  (``zip_with``/``aggregate`` dot product) + a per-query window. The
  correctness baseline; oracle-matched.
- ``brute_force_topk_np``: the same result via Arrow-batched
  ``mapInPandas`` + NumPy blocked matmul — the throughput path: the corpus
  streams through executors in Arrow batches against a broadcast query
  matrix; per-batch partial top-k then a global top-k merge. This is the
  shape that scales to 10^12 rows (no shuffle on the corpus side at all).
- ``ann_lsh_bucketed``: random-hyperplane LSH — deterministic hyperplanes
  derived from md5 hashes, signature bucketing, candidates restricted to
  same-bucket vectors (multi-table). Approximate: no SQL oracle; tests
  check recall >= 0.9 against brute force at test scale.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DEFAULT_K = 5
# Signature sizing depends on the neighbor-angle regime: recall per table is
# (1 - theta/pi)^planes. The test corpus's true neighbors sit near 60 deg
# (cosine ~0.5), so short signatures x many tables (4x16 -> ~0.96 recall)
# are right; a near-duplicate workload (theta < 15 deg) would instead use
# 12-16 planes for bucket selectivity. Both knobs are per-call parameters.
LSH_PLANES = 4
LSH_TABLES = 16


def _norm_vec(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))


# Repo-wide degenerate-vector convention: cosine similarity is UNDEFINED
# for a zero-norm vector, so every cosine operator excludes zero-norm
# vectors from both the query and corpus sides (under ANSI mode the
# division would otherwise raise DIVIDE_BY_ZERO; DuckDB would yield NULL —
# the explicit filter gives both engines, and the SQL vs NumPy paths, the
# same rows). Oracles mirror with `list_sum(list_transform(e, x->x*x)) > 0`.
def _nonzero(col) -> "F.Column":
    return F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x) > 0


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = DEFAULT_K
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast (small); the corpus side never shuffles until
    the per-query window, which runs on (n_queries x corpus) rows — at real
    scale prefer :func:`brute_force_topk_np` which folds top-k into the
    scan. Ties broken by neighbor id; cosine rounded to 6 dp.
    """
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).where(_nonzero(F.col("cv")))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).where(_nonzero(F.col("qv")))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot / (_norm_vec(F.col("qv")) * _norm_vec(F.col("cv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
        StructField("rank", IntegerType()),
    ]
)


def brute_force_topk_np(
    emb: DataFrame, queries: DataFrame, k: int = DEFAULT_K
) -> DataFrame:
    """Exact top-k cosine via mapInPandas + NumPy matmul (the scale path).

    The query matrix rides to executors inside the closure (broadcast by
    task serialization — it is k·dim floats, tiny); each Arrow batch of the
    corpus contributes a partial candidate set (per-batch exact top-k), and
    a final per-query window over ``n_batches * k`` candidates picks the
    global top-k. Corpus-side shuffle: none. Matches the SQL-expression
    operator exactly after 6-dp rounding (float64 matmul vs sequential sum
    differ at ~1e-15).
    """
    qrows = queries.select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    # zero-norm exclusion (see _nonzero): drop degenerate queries up front
    q_norm = np.linalg.norm(q_mat, axis=1, keepdims=True)
    live = q_norm[:, 0] > 0
    q_ids, q_mat, q_norm = q_ids[live], q_mat[live], q_norm[live]
    q_mat /= q_norm

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            keep = norms[:, 0] > 0
            if not keep.all():
                ids, mat, norms = ids[keep], mat[keep], norms[keep]
            if mat.shape[0] == 0:
                continue
            mat /= norms
            sims = q_mat @ mat.T  # (n_queries, batch)
            # mask self-matches
            for qi, qid in enumerate(q_ids):
                sims[qi, ids == qid] = -np.inf
            take = min(k, sims.shape[1])
            # per-query partial top-k (argpartition: O(batch) per query)
            idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            out = {
                "query_id": np.repeat(q_ids, take),
                "neighbor_id": ids[idx].ravel(),
                "cosine": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            df = pd.DataFrame(out)
            df = df[np.isfinite(df["cosine"])]
            df["rank"] = 0
            yield df

    partial = emb.select("vec_id", "embedding").mapInPandas(part, _TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def _hyperplanes(dim: int, planes: int, table: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: md5-seeded uniform in
    [-1, 1). Stable across sessions/machines (no RNG state)."""
    import hashlib

    vals = np.empty((planes, dim))
    for p in range(planes):
        for d in range(dim):
            h = hashlib.md5(f"lsh:{table}:{p}:{d}".encode()).hexdigest()
            vals[p, d] = int(h[:15], 16) / float(1 << 60) * 2.0 - 1.0
    return vals


def lsh_signature_udf_planes(dim: int, planes: int = LSH_PLANES,
                             tables: int = LSH_TABLES) -> list[np.ndarray]:
    return [_hyperplanes(dim, planes, t) for t in range(tables)]


def lsh_sig_exprs(vcol, hps: list[np.ndarray], planes: int):
    """``array<struct<tbl:int, sig:int>>`` of per-table sign signatures:
    bit p of ``sig`` is set when the vector's projection onto hyperplane p
    of that table is >= 0. Shared by the ANN query path and the
    embedding-dedup candidate generator (``dedup.embedding_cosine_pairs_lsh``)."""
    out = []
    for t, hp in enumerate(hps):
        bits = F.lit(0)
        for p in range(planes):
            # ONE py4j call per hyperplane literal: both F.lit(x) per
            # element and F.lit(list) (which expands element-wise
            # internally) cost a py4j round trip per component — 64
            # planes x 64 dims was ~4k driver calls / ~7 s of pure
            # expression construction before any data moved.
            w_arr = F.expr(
                "array(" + ",".join(f"{float(x)!r}D" for x in hp[p]) + ")"
            )
            proj = F.aggregate(
                F.zip_with(vcol, w_arr, lambda x, w: x * w),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            bits = bits + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        out.append(F.struct(F.lit(t).alias("tbl"), bits.alias("sig")))
    return F.array(*out)


def ann_lsh_bucketed(
    emb: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    dim: int = 64,
    planes: int = LSH_PLANES,
    tables: int = LSH_TABLES,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucket join.

    Each vector gets ``tables`` signature buckets (sign pattern of
    ``planes`` hyperplane projections). Candidates = corpus vectors sharing
    a bucket with the query in any table; exact cosine + top-k on the
    candidates. Recall is probabilistic — verified >= 0.9 vs brute force in
    tests; at 10^12 scale the bucket join touches ~corpus/2^planes x tables
    rows per query instead of the full corpus.
    """
    hps = lsh_signature_udf_planes(dim, planes, tables)

    def sig_exprs(vcol):
        return lsh_sig_exprs(vcol, hps, planes)

    c = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        .where(_nonzero(F.col("cv")))
        .withColumn("sigs", sig_exprs(F.col("cv")))
    )
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .where(_nonzero(F.col("qv")))
        .withColumn("sigs", sig_exprs(F.col("qv")))
    )

    ce = c.select(
        "neighbor_id", "cv", F.explode("sigs").alias("s")
    ).select("neighbor_id", "cv", "s.tbl", "s.sig")
    qe = q.select(
        "query_id", "qv", F.explode("sigs").alias("s")
    ).select("query_id", "qv", "s.tbl", "s.sig")

    cand = (
        ce.join(
            F.broadcast(qe),
            (ce["tbl"] == qe["tbl"])
            & (ce["sig"] == qe["sig"])
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot / (_norm_vec(F.col("qv")) * _norm_vec(F.col("cv")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


def knn_label_agreement(
    emb: DataFrame,
    k: int = DEFAULT_K,
    neighbors: DataFrame | None = None,
    max_brute_force_rows: int = 100_000,
) -> DataFrame:
    """Label-noise detection: each vector's label vs the majority label of
    its k nearest neighbors (cosine). A curation pipeline flags
    ``mislabeled`` rows (majority disagrees) for re-annotation or drop —
    the classic kNN-agreement screen over an embedded dataset.

    ``neighbors`` defaults to the exact :func:`brute_force_topk_np`
    (mapInPandas blocked matmul — no BroadcastNestedLoopJoin in the plan)
    with the whole corpus as the query set, and that default REFUSES
    corpora above ``max_brute_force_rows``: all-pairs exact kNN is
    O(n^2) compute and the np path collects the query side, so above the
    guard you must pass an ANN-derived neighbor frame instead (same
    (query_id, neighbor_id, rank) shape from :func:`ann_ivf` /
    :func:`ann_lsh_bucketed`). The agreement logic downstream of the
    neighbor frame is one label join + one grouped vote, shuffling only
    (vec, neighbor-label) pairs — that part scales regardless of the
    neighbor source.

    Majority tie-break: highest vote count, then smallest label (both
    engines deterministic). Output: (vec_id, label, pred_label, n_agree,
    mislabeled).
    """
    if neighbors is None:
        # bounded probe: scans at most max+1 rows, never the full corpus
        n_rows = emb.limit(max_brute_force_rows + 1).count()
        if n_rows > max_brute_force_rows:
            raise ValueError(
                f"knn_label_agreement: corpus has >{max_brute_force_rows} "
                "rows; the exact all-pairs default is O(n^2) — pass an "
                "ANN neighbor frame (ann_ivf / ann_lsh_bucketed) via "
                "neighbors=, or raise max_brute_force_rows explicitly."
            )
        neighbors = brute_force_topk_np(emb, emb, k)
    lab = emb.select("vec_id", "label")
    n = neighbors.select("query_id", "neighbor_id").join(
        lab.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("n_label"),
        ),
        "neighbor_id",
    )
    votes = n.groupBy("query_id", "n_label").agg(F.count("*").alias("c"))
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("n_label"))
    pred = (
        votes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("query_id", F.col("n_label").alias("pred_label"))
    )
    own = lab.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("label")
    )
    agree = (
        n.join(own, "query_id")
        .groupBy("query_id")
        .agg(
            F.sum((F.col("n_label") == F.col("label")).cast("long")).alias(
                "n_agree"
            )
        )
    )
    return (
        own.join(pred, "query_id")
        .join(agree, "query_id")
        .select(
            F.col("query_id").alias("vec_id"),
            "label",
            "pred_label",
            "n_agree",
            (F.col("pred_label") != F.col("label")).alias("mislabeled"),
        )
    )


IVF_LISTS = 16
IVF_NPROBE = 4
IVF_ITERATIONS = 3


def _centroid_matrix(centroids) -> np.ndarray:
    return np.array([c for _, c in centroids], dtype=np.float64)


def _assign_udf(cent_mat: np.ndarray):
    """Arrow-batched nearest-centroid assignment (argmin over squared L2).
    The centroid matrix rides in the task closure — k x dim doubles, tiny.
    (A 16-centroid x 64-dim literal expression tree took Catalyst minutes
    to analyze; the NumPy path plans instantly and is the shape that
    scales.)"""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array(list(pdf["v"]), dtype=np.float64)
            d = ((mat[:, None, :] - cent_mat[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "list_id": d.argmin(axis=1)}
            )

    return run


_ASSIGN_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("list_id", IntegerType())]
)


def ivf_assignments(
    emb: DataFrame,
    k: int = IVF_LISTS,
    iterations: int = IVF_ITERATIONS,
    train_fraction: float = 1.0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic IVF coarse quantizer: Lloyd's k-means with md5-seeded
    init (the k vectors with the smallest md5-hash of their id — stable
    across runs/machines, no RNG state), fixed iteration count.

    Returns (assignments df [vec_id, list_id], centroids as driver list).
    Each iteration: one Arrow-batched argmin pass + one posexplode/groupBy
    mean — the standard distributed Lloyd shape.

    ``train_fraction < 1`` is the 10^12-row path: seeds and every Lloyd
    iteration run on a deterministic md5-bucket sample (a vector's
    membership never changes as the corpus grows — same property as
    ``dataset_split``), and only the FINAL assignment pass touches the full
    corpus. Training cost scales with the sample, not the corpus;
    ``tests/test_dataops.py::test_ivf_sampled_training`` replays the
    sampled Lloyd loop in NumPy and asserts the Spark centroids match, so
    the iterations provably never read outside the sample.
    """
    from ..functions.texthash import md5_hash60

    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # bigint hash (NOT bare F.conv, which returns a STRING: its modulo
    # would round-trip through double and lose bits above 2^53, and its
    # orderBy would sort lexicographically)
    vhash = md5_hash60(F.col("vec_id").cast("string"))
    if train_fraction < 1.0:
        # md5-bucket sample in [0, 1000): deterministic, engine-independent
        train = v.where(vhash % 1000 < int(train_fraction * 1000))
    else:
        train = v
    seeds = (
        train.withColumn("h", vhash)
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(
            f"IVF training sample has only {len(seeds)} vectors but k={k} "
            f"inverted lists were requested — raise train_fraction "
            f"(={train_fraction}) or lower k"
        )
    centroids = [(i, list(r["v"])) for i, r in enumerate(seeds)]

    def assign(frame: DataFrame, cents) -> DataFrame:
        return frame.mapInPandas(
            _assign_udf(_centroid_matrix(cents)), _ASSIGN_SCHEMA
        )

    for _ in range(iterations):
        assigned = train.join(assign(train, centroids), "vec_id")
        means = (
            assigned.select("list_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("list_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select("list_id", F.col("pm.m").alias("centroid"))
            .collect()
        )
        new_centroids = {r["list_id"]: list(r["centroid"]) for r in means}
        centroids = [(i, new_centroids.get(i, c)) for i, c in centroids]
    return assign(v, centroids), centroids


def probe_rows_for(
    centroids, queries: DataFrame, nprobe: int = IVF_NPROBE
) -> list[tuple[int, list[float], int]]:
    """Driver-side probe-set computation: for each query vector, its
    ``nprobe`` nearest centroids (queries are few; each is one k x dim
    NumPy op). Returns (query_id, qv, list_id) rows."""
    cent_mat = _centroid_matrix(centroids)
    qrows = queries.select("vec_id", "embedding").collect()
    rows = []
    for r in qrows:
        qv = np.array(r["embedding"], dtype=np.float64)
        if not (qv @ qv) > 0:
            continue  # zero-norm exclusion (see _nonzero)
        d = ((cent_mat - qv[None, :]) ** 2).sum(axis=1)
        for li in np.argsort(d, kind="stable")[:nprobe]:
            rows.append((r["vec_id"], list(map(float, qv)), int(li)))
    return rows


def _score_probed(
    c: DataFrame, probed: DataFrame, k: int
) -> DataFrame:
    """Shared IVF tail: join corpus rows (neighbor_id, cv, list_id) to the
    broadcast probe rows on list_id, exact cosine, per-query top-k."""
    cand = c.join(
        F.broadcast(probed),
        (c["list_id"] == probed["list_id"])
        & (F.col("neighbor_id") != F.col("query_id")),
    ).select("query_id", "qv", "neighbor_id", "cv")
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        (dot / (_norm_vec(F.col("qv")) * _norm_vec(F.col("cv")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


def ann_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    lists: int = IVF_LISTS,
    nprobe: int = IVF_NPROBE,
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``lists`` inverted lists;
    each query probes its ``nprobe`` nearest centroids and scores only
    those lists' vectors exactly. Approximate (no SQL oracle); tests check
    recall + determinism vs brute force. At scale the corpus is
    partitioned BY list_id — see :func:`write_ivf_partitioned` /
    :func:`ann_ivf_partitioned` for the materialized layout where a probe
    becomes a partition-pruned scan reading ~nprobe/lists of the files
    (asserted by ``test_dataops.test_ivf_partition_pruning``)."""
    assignments, centroids = ivf_assignments(
        emb, k=lists, train_fraction=train_fraction
    )
    c = (
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        .where(_nonzero(F.col("cv")))
        .join(
            assignments.select(
                F.col("vec_id").alias("neighbor_id"), "list_id"
            ),
            "neighbor_id",
        )
    )
    probed = emb.sparkSession.createDataFrame(
        probe_rows_for(centroids, queries, nprobe),
        "query_id long, qv array<double>, list_id int",
    )
    return _score_probed(c, probed, k)


def write_ivf_partitioned(
    emb: DataFrame,
    path: str,
    lists: int = IVF_LISTS,
    iterations: int = IVF_ITERATIONS,
    train_fraction: float = 1.0,
):
    """Materialize the corpus partitioned by inverted list — the storage
    layout behind IVF at scale (parquet ``partitionBy(list_id)`` here;
    Iceberg ``PARTITIONED BY (list_id)`` on a real catalog). Returns the
    trained centroids; pair with :func:`ann_ivf_partitioned`, whose probes
    then read only the probed lists' files (partition pruning)."""
    assignments, centroids = ivf_assignments(
        emb, k=lists, iterations=iterations, train_fraction=train_fraction
    )
    (
        emb.join(assignments, "vec_id")
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    return centroids


def ann_ivf_partitioned(
    spark,
    path: str,
    centroids,
    queries: DataFrame,
    k: int = DEFAULT_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF probe over a :func:`write_ivf_partitioned` layout: the
    ``list_id IN (probe set)`` filter is a partition predicate, so the scan
    never opens files outside the probed lists (at 100 TB: I/O scales with
    nprobe/lists, not corpus size). Result-identical to :func:`ann_ivf`
    given the same centroids."""
    rows = probe_rows_for(centroids, queries, nprobe)
    need = sorted({li for _, _, li in rows})
    corpus = spark.read.parquet(path).where(F.col("list_id").isin(need))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
        "list_id",
    ).where(_nonzero(F.col("cv")))
    probed = spark.createDataFrame(
        rows, "query_id long, qv array<double>, list_id int"
    )
    return _score_probed(c, probed, k)
