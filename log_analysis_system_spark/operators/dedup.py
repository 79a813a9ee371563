"""Deduplication operators over the ``documents`` table.

Large-scale training-data dedup, Spark-first. Five families:

- exact (hash-groupBy on md5(text));
- exact n-gram Jaccard (explode-shingles + shingle equi-join — the exact
  subquadratic formulation; candidate pairs only exist where a shingle is
  shared, so the join output is bounded by shingle co-occurrence, not n²);
- MinHash + LSH (signature -> bands -> bucket join -> exact-Jaccard verify:
  emitted pairs are *verified*, so LSH is purely a candidate filter and the
  output equals the exact operator whenever band recall holds at the
  threshold — with b=12 r=3 the miss probability at s=0.9 is ~1.6e-7);
- SimHash (32-bit signature, banded Hamming join);
- embedding cosine (exact pair join at test scale; the ANN operators in
  ``similarity.py`` are the 10^12-row path).

Scale notes (100 TB design point): every self-join here keys on a
high-cardinality derived column (shingle, band bucket, simhash band), so
shuffles partition evenly; hot shingles (stop-shingles) are the skew risk —
``ngram_jaccard_pairs`` drops shingles above ``max_shingle_freq`` (standard
practice: a shingle shared by thousands of docs contributes nothing to
near-dup discrimination but creates a quadratic bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.texthash import (
    feature_hashes32,
    md5_hash60,
    minhash_signature,
    shingle_hashes,
    shingles_from_tokens,
    simhash32_from_hashes,
    tokens,
)

JACCARD_THRESHOLD = 0.8
MINHASH_BANDS = 12
MINHASH_ROWS = 3
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = 4  # 4 x 8-bit bands: Hamming<=3 pairs share >=1 exact band
COSINE_DUP_THRESHOLD = 0.45


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup via hash-groupBy: one row per duplicate doc, pointing at
    the canonical (minimum) doc_id of its text-hash group.

    Grouping on ``md5(text)`` (not raw text) keeps shuffle keys 32 bytes at
    10^12 scale. Output: (canonical_id, dup_id).

    Shape: groupBy-min + join back, NOT ``collect_list`` per group — a
    degenerate group (one boilerplate doc duplicated 10^8 times) would
    materialize a giant array on a single reducer; min/count partial-aggregate
    map-side and stay O(1) per group, and the re-join streams the big side
    against one build row per hash (AQE skew-split covers pathological keys).
    """
    # null-text rows are not duplicate-comparable (md5(NULL) is NULL, and
    # the null key would silently drop in the equi-join below anyway while
    # a GROUP-BY-based oracle would pair them) — excluded by contract
    hashed = docs.where(F.col("text").isNotNull()).select(
        F.md5("text").alias("h"), "doc_id"
    )
    groups = (
        hashed.groupBy("h")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .drop("c")
    )
    return (
        hashed.join(groups, "h")
        .where(F.col("doc_id") != F.col("canonical_id"))
        .select("canonical_id", F.col("doc_id").alias("dup_id"))
    )


def _shingle_docs(docs: DataFrame, k: int, nonempty: bool = False) -> DataFrame:
    # tokenize in its own projection: the shingle HOF runs interpreted and
    # would re-evaluate an inlined split(text) per element per gram slot
    # (see texthash.shingles_from_tokens).
    #
    # ``nonempty`` filters on the TOKEN count (size(t) >= k <=> ts != []),
    # NOT with a downstream where(size(ts) > 0): predicate pushdown would
    # substitute the full shingle expression into an interpreted Filter,
    # re-splitting the text per element — measured 0.3 s -> 4.1 s on 5k
    # sf0.1 docs for that one predicate.
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    if nonempty:
        tok = tok.where(F.size("t") >= k)
    return tok.select(
        "doc_id", shingles_from_tokens(F.col("t"), k).alias("ts")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = 3,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact near-dup pairs by word-k-gram Jaccard >= threshold.

    Explode-join formulation: intersection sizes come from a shingle
    equi-join (shuffle keyed on the shingle — subquadratic), set sizes from
    a per-doc count; Jaccard = |I| / (|A| + |B| - |I|).

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the join (skew guard for web-scale corpora). Unset at test
    scale so the DuckDB oracle (no cap) matches exactly.
    """
    # Lazy localCheckpoint — same policy (and same durability caveat) as
    # minhash_lsh_pairs. Without it the shingle frame's four consumers
    # (explode a/b + size a/b) each recompute tokenize+shingle, and worse,
    # constraint inference (InferFiltersFromGenerate's size(ts) > 0,
    # InferFiltersFromConstraints' isnotnull(size(ts))) pushes Filters below
    # BOTH projections, substituting the full shingle HOF — with split(text)
    # re-inlined per lambda element — into interpreted per-row conditions
    # (measured: 13.7 s -> 2.0 s for the whole query on 5k sf0.1 docs).
    sh = _shingle_docs(docs, k).localCheckpoint(eager=False)
    sizes = sh.select("doc_id", F.size("ts").alias("n"))
    ex = sh.select("doc_id", F.explode("ts").alias("s"))
    if max_shingle_freq is not None:
        freq = ex.groupBy("s").agg(F.count("*").alias("df"))
        ex = (
            ex.join(freq.where(F.col("df") <= max_shingle_freq), "s", "left_semi")
        )
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


CONTAMINATION_THRESHOLD = 0.5


def contamination_pairs(
    corpus_docs: DataFrame,
    probe_docs: DataFrame,
    k: int = 3,
    threshold: float = CONTAMINATION_THRESHOLD,
) -> DataFrame:
    """Benchmark decontamination: for each probe (eval-set) document, the
    corpus documents containing at least ``threshold`` of the probe's
    distinct word-k-grams.

    The metric is asymmetric CONTAINMENT ``|P ∩ D| / |P|``, not Jaccard —
    a long training document that embeds a short benchmark item wholesale
    has near-zero Jaccard but containment ~1, and it is exactly the case a
    decontamination pass must catch (the GPT-3/PaLM n-gram-overlap
    protocol).

    Scale shape: the probe side is a benchmark suite — thousands of
    documents, not billions — so its exploded shingle set is BROADCAST;
    the corpus side streams through the scan with no shuffle until the
    (doc, probe) count aggregate, which is map-side partial-aggregated and
    carries only matching pairs. Corpus shingles are never materialized as
    a joined table against anything corpus-sized.

    Output: (probe_id, doc_id, n_shared, containment >= threshold).
    """
    c_sh = _shingle_docs(corpus_docs, k).localCheckpoint(eager=False)
    p_sh = _shingle_docs(probe_docs, k).localCheckpoint(eager=False)
    p_sizes = p_sh.select(
        F.col("doc_id").alias("probe_id"), F.size("ts").alias("np")
    )
    p_ex = p_sh.select(
        F.col("doc_id").alias("probe_id"), F.explode("ts").alias("s")
    )
    c_ex = c_sh.select("doc_id", F.explode("ts").alias("s"))
    inter = (
        c_ex.join(F.broadcast(p_ex), "s")
        .groupBy("probe_id", "doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        inter.join(F.broadcast(p_sizes), "probe_id")
        .withColumn("containment", F.col("n_shared") / F.col("np"))
        .where(F.col("containment") >= threshold)
        .select(
            "probe_id",
            "doc_id",
            "n_shared",
            F.round("containment", 6).alias("containment"),
        )
    )


def _band_entries(sh: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc_id, band, bkey) LSH bucket entries from a shingle frame.

    Two projections on purpose: hash each shingle string once, then take
    the bands*rows seeded minima over the 8-byte hashes (HOFs are
    interpreted and inline their argument subtree — texthash.shingle_hashes).
    Band key = xxhash64 over the band's signature slice (array equality ->
    hash); shingle arrays are NOT carried through the x`bands` explode —
    they join back only for candidate verification.
    """
    sig = sh.select(
        "doc_id", shingle_hashes(F.col("ts")).alias("hs")
    ).select(
        "doc_id", minhash_signature(F.col("hs"), bands * rows).alias("mh")
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("mh", b * rows + 1, rows)).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bkey")


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = 3,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard-verified.

    signature (bands*rows xxhash64 minima) -> band buckets
    (hash of each r-slice) -> self-join per bucket -> distinct candidate
    pairs -> verify with exact Jaccard on the shingle arrays ->
    emit pairs >= threshold. The verify step bounds false positives at
    zero; band recall bounds false negatives (see module docstring).

    At 10^12 rows the bucket join replaces the all-pairs problem with
    per-bucket blocks; AQE skew-split handles pathological buckets.
    """
    # Lazy localCheckpoint: the shingle frame feeds the signature AND both
    # sides of the verify join below — one tokenize/shingle pass instead of
    # three (MEMORY_AND_DISK blocks, computed on first action). Unlike
    # DataFrame.persist (held by the session CacheManager until an explicit
    # unpersist), localCheckpoint blocks are freed by the ContextCleaner
    # when the returned DataFrame's RDD lineage is garbage-collected, so
    # repeated calls in a long-lived session do not accumulate caches —
    # and a fresh call never silently reuses a previous call's cache.
    # Durability trade-off: truncating lineage means an executor loss on a
    # real cluster cannot recompute the lost blocks (persist() would); at
    # the 10^12-row design point prefer reliable checkpoints to cluster
    # storage, or persist+unpersist, when executor churn is expected.
    sh = _shingle_docs(docs, k, nonempty=True).localCheckpoint(eager=False)
    band_entries = _band_entries(sh, bands, rows)

    a = band_entries.alias("a")
    b = band_entries.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand.join(sh.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a")), "id_a")
        .join(sh.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b")), "id_b")
    )
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    union = F.size("ts_a") + F.size("ts_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_lsh_incremental(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    k: int = 3,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> DataFrame:
    """Incremental (cross-corpus) MinHash+LSH dedup: which NEW documents
    are near-dups of the EXISTING corpus — the shape a daily ingest
    actually runs, as opposed to the one-shot self-join.

    Candidates come from a new-side x corpus-side band-bucket join (never
    new x new or corpus x corpus), then exact-Jaccard verification on the
    two shingle frames. Per-batch cost is proportional to the batch, not
    the corpus: at 10^12 corpus rows the corpus band-entry and shingle
    tables are written ONCE (bucketed by bkey / doc_id respectively via
    ``catalog.write_bucketed_table``) and each ingest batch probes them —
    this function expresses the per-batch plan; only the corpus-side
    scans change when the tables are pre-materialized.

    Output: one row per (new_id, corpus_id) verified pair >= threshold.
    """
    sh_new = _shingle_docs(new_docs, k, nonempty=True).localCheckpoint(eager=False)
    sh_old = _shingle_docs(corpus_docs, k, nonempty=True).localCheckpoint(eager=False)
    return _probe_corpus_lsh(
        sh_new,
        _band_entries(sh_new, bands, rows),
        sh_old,
        _band_entries(sh_old, bands, rows),
        threshold,
    )


def _probe_corpus_lsh(
    sh_new: DataFrame,
    band_new: DataFrame,
    sh_old: DataFrame,
    band_old: DataFrame,
    threshold: float,
) -> DataFrame:
    """new-side band entries probe corpus-side band entries; candidates
    verified with exact Jaccard on the two shingle frames. Shared by the
    recompute-everything path (:func:`minhash_lsh_incremental`) and the
    pre-materialized-table path (:func:`minhash_lsh_incremental_probed`)."""
    a = band_new.alias("a")
    b = band_old.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey")),
        )
        .select(
            F.col("a.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("corpus_id"),
        )
        .dropDuplicates(["new_id", "corpus_id"])
    )
    cand = (
        cand.join(
            sh_new.select(F.col("doc_id").alias("new_id"), F.col("ts").alias("ts_a")),
            "new_id",
        ).join(
            sh_old.select(F.col("doc_id").alias("corpus_id"), F.col("ts").alias("ts_b")),
            "corpus_id",
        )
    )
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    union = F.size("ts_a") + F.size("ts_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", F.round("jaccard", 6).alias("jaccard"))
    )


def materialize_corpus_lsh(
    corpus_docs: DataFrame,
    prefix: str,
    k: int = 3,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
    n_buckets: int = 32,
    path: str | None = None,
) -> tuple[str, str]:
    """ONE-TIME corpus-side materialization for incremental dedup: write
    the corpus's shingle table (bucketed by doc_id — the verify join's
    key) and band-entry table (bucketed by bkey — the probe join's key)
    via :func:`catalog.write_bucketed_table`. The 10^12-row corpus is
    shingled exactly once; every subsequent ingest batch probes these
    tables (:func:`minhash_lsh_incremental_probed`) and pays only
    batch-proportional compute. Bucketing pre-pays the corpus-side
    shuffle: probe joins against a batch repartitioned to the same key
    need no corpus-side Exchange.

    Returns the (shingle_table, band_table) names.
    """
    from ..sources import catalog

    sh_name, band_name = f"{prefix}_shingles", f"{prefix}_bands"
    sh = _shingle_docs(corpus_docs, k, nonempty=True).localCheckpoint(eager=False)
    catalog.write_bucketed_table(
        sh, sh_name, "doc_id", n_buckets,
        path=f"{path}/{sh_name}" if path else None,
    )
    catalog.write_bucketed_table(
        _band_entries(sh, bands, rows), band_name, "bkey", n_buckets,
        path=f"{path}/{band_name}" if path else None,
    )
    return sh_name, band_name


def minhash_lsh_incremental_probed(
    new_docs: DataFrame,
    spark,
    prefix: str,
    threshold: float = JACCARD_THRESHOLD,
    k: int = 3,
    bands: int = MINHASH_BANDS,
    rows: int = MINHASH_ROWS,
) -> DataFrame:
    """Per-ingest incremental dedup against the PRE-MATERIALIZED corpus
    tables written by :func:`materialize_corpus_lsh` — the corpus is never
    re-shingled: its shingle and band frames are bucketed-table SCANS
    (assert it: the plan shows FileScans of ``{prefix}_shingles`` /
    ``{prefix}_bands`` and tokenize/shingle projections only over the new
    batch). Per-batch cost ∝ batch size; identical results to
    :func:`minhash_lsh_incremental` over the same corpus (same band
    scheme, same exact-Jaccard verify — tested in
    ``test_dedup.py::test_incremental_probed_matches_one_shot``).
    """
    sh_new = _shingle_docs(new_docs, k, nonempty=True).localCheckpoint(eager=False)
    return _probe_corpus_lsh(
        sh_new,
        _band_entries(sh_new, bands, rows),
        spark.table(f"{prefix}_shingles"),
        spark.table(f"{prefix}_bands"),
        threshold,
    )


def simhash_signatures(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-doc 32-bit SimHash over word-k-gram shingles (cross-engine
    md5-derived feature hashes — the oracle recomputes the identical
    signature)."""
    sh = _shingle_docs(docs, k)
    # hash every shingle ONCE in its own projection — the 32 interpreted
    # bit-count filters would otherwise each inline (and re-run) the md5
    # transform (see texthash.feature_hashes32)
    hashed = sh.select(
        "doc_id",
        feature_hashes32(F.col("ts")).alias("hs"),
        F.size("ts").alias("n"),
    )
    return hashed.select(
        "doc_id",
        simhash32_from_hashes(F.col("hs"), F.col("n")).alias("simhash"),
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    k: int = 3,
    bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming.

    Banded join (pigeonhole: distance <= bands-1 guarantees >= 1 identical
    band; here 4 bands of 8 bits for <= 3): candidates share an exact band
    byte, then the full Hamming filter runs only on candidates. Output is
    exact for max_hamming < bands — the oracle brute-forces all pairs and
    must agree.
    """
    assert max_hamming < bands, "pigeonhole requires max_hamming < bands"
    # Lazy localCheckpoint (minhash policy): both self-join sides consume
    # the signature frame, which would otherwise recompute the full
    # tokenize/shingle/md5 pipeline per side.
    sig = simhash_signatures(docs, k).localCheckpoint(eager=False)
    width = 32 // bands
    entries = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright("simhash", b * width)
                            % F.lit(1 << width)
                        ).alias("bval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bval")
    a = entries.alias("a")
    b = entries.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    emb: DataFrame, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Exact embedding near-dup pairs: cosine >= threshold.

    Pair join at test scale (the verification baseline); at 10^12 rows use
    ``similarity.ann_lsh_bucketed`` to generate candidates and this cosine
    expression to verify. Cosine is computed as
    dot / (sqrt(sum a²) * sqrt(sum b²)) with left-to-right summation —
    bit-reproducible against the oracle's identical formula, rounded to
    6 dp on both sides.
    """
    from .similarity import _nonzero

    v = emb.select(
        F.col("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).where(_nonzero(F.col("v")))  # zero-norm exclusion: cosine undefined
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(F.col("a.v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(F.col("b.v"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (dot / (na * nb)).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    dim: int = 64,
    planes: int = 4,
    tables: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs with LSH-bucketed candidates — the 10^12-row
    path for :func:`embedding_cosine_pairs` (which is an all-pairs join).

    Candidates = vector pairs sharing a random-hyperplane sign bucket in
    any table (same deterministic hyperplanes as
    ``similarity.ann_lsh_bucketed``); every candidate is verified with the
    exact cosine, so output pairs are always a SUBSET of the exact
    operator's (zero false positives). Recall per true pair at angle θ is
    ``1 - (1 - (1 - θ/π)^planes)^tables``: near-duplicate regimes
    (cosine >= 0.9, θ <= 26°) give recall ~1-4e-6 with the 4x16 default;
    the synthetic corpus's weak pairs (cosine ~0.46, θ ~62°) sit at ~0.96
    — tests assert subset + a recall floor, not equality. At scale the
    bucket self-join touches ~n²/2^planes per table instead of n².
    """
    from .similarity import _nonzero, lsh_sig_exprs, lsh_signature_udf_planes

    hps = lsh_signature_udf_planes(dim, planes, tables)
    # As in minhash_lsh_pairs, vectors are NOT carried through the
    # x`tables` explode or the bucket self-join — only (vec_id, tbl, sig)
    # rows shuffle; the 64-double payloads are joined back onto the (tiny)
    # deduplicated candidate set for verification. The vector frame is
    # lazily checkpointed once and reused for signatures + both verify sides.
    v = (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .where(_nonzero(F.col("v")))  # zero-norm exclusion: cosine undefined
        .localCheckpoint(eager=False)
    )
    # Dimension guard: zip_with against the dim-wide hyperplane literals
    # null-pads a mismatched vector, silently clearing sign bits and
    # degrading recall with no error (the exact verify preserves the subset
    # property, so the loss would be invisible). Fail loudly instead.
    dim_ok = F.when(
        F.size("v") == dim, F.col("v")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"embedding dim mismatch: expected {dim}, got "),
                F.size("v").cast("string"),
            )
        )
    )
    e = (
        v.select(
            "vec_id",
            F.explode(lsh_sig_exprs(dim_ok, hps, planes)).alias("s"),
        )
        .select("vec_id", "s.tbl", "s.sig")
    )
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cand.join(
        v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(
        v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb")), "id_b"
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        cand.select("id_a", "id_b", (dot / (na * nb)).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def dedup_components(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    threshold: float = JACCARD_THRESHOLD,
    max_iterations: int = 20,
) -> DataFrame:
    """Near-dup group assignment: every doc gets the minimum doc_id of its
    connected component in the near-dup pair graph (singletons keep their
    own id). The keep-list of a curation pipeline is then
    ``canonical_id == doc_id``.

    Distributed algorithm: iterative label propagation — each round every
    node takes min(own label, neighbors' labels); converges in
    O(diameter) <= O(log n) rounds for near-dup clusters (which are small
    and dense). Each round is one join + one aggregation; lineage is
    truncated with localCheckpoint so plans stay flat. At 10^12 docs this
    is the standard large-scale connected-components shape (Kiveris et al.
    "Connected Components in MapReduce"-style), bounded by the pair graph,
    not the corpus.
    """
    if pairs is None:
        pairs = minhash_lsh_pairs(docs, threshold=threshold)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("canonical_id")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("canonical_id").alias("n_label"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("n_label").alias("neighbor_label"))
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("canonical_id"),
                    F.coalesce(F.col("neighbor_label"), F.col("canonical_id")),
                ).alias("canonical_id"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .where(F.col("u.canonical_id") != F.col("l.canonical_id"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    # unsorted: a global presentation sort on a corpus-sized frame would
    # dominate the plan at scale; the registry wrapper adds it for the oracle
    return labels


SPAN_W = 8


def span_dup_stats(docs: DataFrame, w: int = SPAN_W) -> DataFrame:
    """Span-level exact-duplication signals: per document, the share of its
    distinct ``w``-token spans that also occur verbatim in >= 1 OTHER
    document.

    The fixed-width approximation of suffix-array substring dedup
    ("Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022): whole-doc dedup (``exact_duplicates``) misses documents
    that merely EMBED duplicated passages — boilerplate headers, quoted
    chunks, templated sections — which span-level stats surface so a
    corpus build can drop or down-weight them. Beyond-reference operator
    (the reference dedups nothing below whole-line granularity);
    SURVEY §2.10.

    Output: ``(doc_id, n_spans, n_dup_spans, dup_span_ratio)`` — one row
    per input document; docs shorter than ``w`` tokens report 0 spans and
    ratio 0.0.

    Scale shape (100 TB): spans are reduced to 60-bit md5 hashes BEFORE
    any shuffle (8-byte keys, never span text); the duplicated-span set is
    a (hash, count>=2) partial-agg; the join back to per-doc span hashes
    keys on the same hash, so work is bounded by span co-occurrence — no
    pairwise doc comparison anywhere. The md5-60bit hash is reproduced
    exactly by the DuckDB oracle, so hash collisions (if any) collapse the
    same spans on both engines.
    """
    base = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = base.select(
        "doc_id", shingles_from_tokens(F.col("t"), w).alias("sp")
    )
    # explode_outer keeps span-less (short) docs as a NULL row so the
    # output stays one-row-per-document without a second pass over docs
    ex = sh.select("doc_id", F.explode_outer("sp").alias("s")).select(
        "doc_id", md5_hash60(F.col("s")).alias("h")
    )
    ex = ex.localCheckpoint(eager=False)
    dup = (
        ex.where(F.col("h").isNotNull())
        .groupBy("h")
        # spans are distinct per doc, so COUNT(*) == count of docs
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    n_dup = F.count("is_dup")
    n_spans = F.count("h")
    return (
        ex.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            n_spans.alias("n_spans"),
            n_dup.alias("n_dup_spans"),
            F.round(
                F.when(n_spans > 0, n_dup / n_spans).otherwise(F.lit(0.0)), 6
            ).alias("dup_span_ratio"),
        )
    )


def split_leakage(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Train/test contamination audit: every verified near-dup pair,
    annotated with the two documents' dataset splits and an ``is_leak``
    flag (splits differ) — the eval-hygiene check run before trusting any
    held-out metric (a test doc with a near-duplicate in train inflates
    eval; the GPT-3/PaLM appendices' motivating failure).

    Composition of two already-verified stages: the MinHash/LSH pair
    stream (exact-Jaccard verified, recall-gated) joined to the
    deterministic md5-bucket split assignment (``textstats.
    dataset_split``). Output: ``(id_a, id_b, jaccard, split_a, split_b,
    is_leak)`` — one row per near-dup pair; the per-(split, split) rollup
    is a trivial aggregate of this frame.

    Scale shape: the split frame is (doc_id, 8-byte split) — two
    hash-equi joins on doc_id against the (much smaller) pair frame; the
    corpus itself is only scanned by the pair stage.
    """
    from .textstats import dataset_split

    pairs = minhash_lsh_pairs(docs, threshold=threshold)
    s = dataset_split(docs).select("doc_id", "split")
    sa = s.select(F.col("doc_id").alias("id_a"), F.col("split").alias("split_a"))
    sb = s.select(F.col("doc_id").alias("id_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            "split_a",
            "split_b",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
    )


def dup_cluster_sizes(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Duplicate-cluster size histogram: how many near-dup components of
    each size the corpus contains (singletons included) — the dedup audit
    metric that distinguishes "a few giant boilerplate clusters" (one
    template stamped 10^6 times; fix the scraper) from "long tail of
    pairwise near-dups" (normal web noise), and the first thing to read
    before choosing a keep policy.

    Output: ``(cluster_size, n_clusters)``, one row per distinct size.

    Scale shape: rides :func:`dedup_components` (label propagation over
    the pair graph), then two partial aggs — (canonical_id) sizes, then a
    ≤max-size-row histogram. Nothing beyond the components cost.
    """
    comp = dedup_components(docs, threshold=threshold)
    sizes = comp.groupBy("canonical_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    )


def canonical_selection(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Canonical-document selection: within every near-dup cluster, pick
    the single document to KEEP — the longest (token count), ties broken
    by smallest doc_id — and flag all others as discards. This is the
    step after component labeling that real curation pipelines run: the
    keep policy is rarely "arbitrary member" (``dedup_components``' min
    label) but "best member", because near-dup clusters mix truncated /
    boilerplate-injected variants of one underlying page and keeping the
    longest preserves the most content.

    Output: one row per document —
    ``(doc_id, cluster_id, cluster_size, n_tokens, is_canonical)``.
    The keep-list is ``is_canonical``; exactly one true per cluster
    (singletons keep themselves).

    Scale shape: rides :func:`dedup_components` (pair-graph label
    propagation), then one (cluster_id)-keyed partial agg computing the
    per-cluster argmax as ``max(struct(n_tokens, -doc_id))`` — no window
    over the corpus, no global sort. The argmax frame is cluster-count
    sized; joining it back is a broadcast at realistic cluster counts or
    a same-key shuffle join otherwise. Deterministic: (n_tokens, -doc_id)
    is a total order because doc_id is unique.
    """
    comp = dedup_components(docs, threshold=threshold).withColumnRenamed(
        "canonical_id", "cluster_id"
    )
    lens = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    labeled = comp.join(lens, "doc_id")
    best = labeled.groupBy("cluster_id").agg(
        F.max(
            F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("b"),
        F.count("*").cast("bigint").alias("cluster_size"),
    ).select(
        "cluster_id",
        (-F.col("b.neg_id")).cast("bigint").alias("keep_id"),
        "cluster_size",
    )
    return labeled.join(best, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "n_tokens",
        (F.col("doc_id") == F.col("keep_id")).alias("is_canonical"),
    )


def cross_source_dup_rates(
    docs: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Within- vs cross-source near-duplicate matrix: for every unordered
    pair of sources, how many verified near-dup pairs straddle them. The
    cross-snapshot dedup audit (CommonCrawl dumps, wiki mirrors, forum
    scrapes): a high off-diagonal count means two "different" sources are
    substantially the same crawl and the mixture weights double-count it;
    the diagonal is ordinary intra-source duplication.

    Output: ``(source_lo, source_hi, n_pairs)`` with
    ``source_lo <= source_hi`` lexicographically.

    Scale shape: the pair frame (MinHash/LSH, exact-verified) is the
    expensive part and is bounded by true near-dups; the two source
    lookups are 8-byte-payload equi-joins on doc_id against a projection
    of the corpus, then a partial agg on a (sources²)-sized key space.
    """
    pairs = minhash_lsh_pairs(docs, threshold=threshold)
    src = docs.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("id_a"), F.col("source").alias("source_a")
    )
    sb = src.select(
        F.col("doc_id").alias("id_b"), F.col("source").alias("source_b")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("source_a", "source_b").alias("source_lo"),
            F.greatest("source_a", "source_b").alias("source_hi"),
        )
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )
