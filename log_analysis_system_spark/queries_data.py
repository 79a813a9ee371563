"""Driver-facing training-data queries (dedup — self-join, incremental,
components / similarity / text analysis / corpus-pipeline stages /
multimodal) with paired DuckDB oracle SQL.

Oracle design notes:

- The md5-60bit hash (``functions.texthash``) is computed identically on
  both engines, so hash-bearing outputs (simhash, fingerprints) are
  bit-compared.
- MinHash/LSH emits *exact-Jaccard-verified* pairs, so its oracle is the
  independent exact all-pairs SQL — the probabilistic stage must reach
  recall 1.0 on the planted near-dups (b=12, r=3: miss ~1.6e-7 at s=0.9)
  or the gate fails loudly.
- Cosines are computed with the same formula (sequential dot, sqrt-norm
  product) and rounded to 6 dp on both sides.
- ``ann_lsh_bucketed`` is genuinely approximate -> no oracle entry
  (driver records a rows-only check); tests assert recall vs brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.texthash import DUCK_HASH60, duck_shingles_cte, duck_simhash32_sql
from .operators import clustering as cl
from .operators import datapipe as dp
from .operators import dedup as dd
from .operators import multimodal as mm
from .operators import similarity as sim
from .operators import textstats as ts

N_ANN_QUERIES = 20


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # single tiny file: spread rows so signature/shingle compute parallelizes
    return df.repartition(spark.sparkContext.defaultParallelism)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


# ------------------------------------------------------------------- dedup
def q_dedup_exact(spark, sf_dir):
    # presentation sorts live in the registry wrappers (deterministic
    # oracle diffing); library callers get the unsorted frames
    return dd.exact_duplicates(_docs(spark, sf_dir)).orderBy(
        "canonical_id", "dup_id"
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dd.ngram_jaccard_pairs(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


def q_dedup_minhash_lsh(spark, sf_dir):
    return dd.minhash_lsh_pairs(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


def q_dedup_simhash(spark, sf_dir):
    return dd.simhash_pairs(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


def q_dedup_embedding_cosine(spark, sf_dir):
    return dd.embedding_cosine_pairs(_emb(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


def q_dedup_embedding_lsh(spark, sf_dir):
    # LSH-bucketed candidates + exact-cosine verify: the 10^12-row path.
    # Probabilistic recall (subset of the exact operator) -> no oracle
    # entry; tests assert subset + recall floor vs exact.
    return dd.embedding_cosine_pairs_lsh(_emb(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


def q_decontamination(spark, sf_dir):
    """Benchmark-decontamination shape: every 10th doc plays the eval set
    (probes), the rest the training corpus; emit corpus docs containing
    >= 50% of a probe's distinct 3-grams (asymmetric containment)."""
    docs = _docs(spark, sf_dir)
    probes = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return dd.contamination_pairs(corpus, probes).orderBy("probe_id", "doc_id")


def q_dedup_components(spark, sf_dir):
    # presentation sorts live in the registry wrappers (deterministic oracle
    # diffing); library callers get the unsorted frames
    return dd.dedup_components(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dedup_incremental(spark, sf_dir):
    """Daily-ingest shape: even doc_ids play the existing corpus, odd ones
    the new batch (interleaved so planted near-dup pairs straddle the
    split); emit verified cross near-dups."""
    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    return dd.minhash_lsh_incremental(new, corpus).orderBy(
        "new_id", "corpus_id"
    )


# -------------------------------------------------------------- similarity
def q_ann_topk_cosine(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.brute_force_topk(emb, emb.where(F.col("vec_id") < N_ANN_QUERIES))


def q_ann_topk_cosine_np(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.brute_force_topk_np(emb, emb.where(F.col("vec_id") < N_ANN_QUERIES))


def q_ann_lsh_bucketed(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.ann_lsh_bucketed(emb, emb.where(F.col("vec_id") < N_ANN_QUERIES))


def q_ann_ivf_fullprobe(spark, sf_dir):
    # nprobe == lists degrades IVF to exact search (every inverted list is
    # scored), so this variant IS oracle-checkable: row-identical to brute
    # force (same cosine expr, same tie-break). The probed path keeps its
    # recall/determinism tests instead.
    emb = _emb(spark, sf_dir)
    return sim.ann_ivf(
        emb,
        emb.where(F.col("vec_id") < N_ANN_QUERIES),
        lists=sim.IVF_LISTS,
        nprobe=sim.IVF_LISTS,
    )


def q_ann_ivf(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.ann_ivf(emb, emb.where(F.col("vec_id") < N_ANN_QUERIES))


def q_knn_label_agreement(spark, sf_dir):
    return sim.knn_label_agreement(_emb(spark, sf_dir)).orderBy("vec_id")


# ------------------------------------------------------------ text analysis
def q_text_token_stats(spark, sf_dir):
    return ts.token_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_quality(spark, sf_dir):
    return ts.quality_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_language_id(spark, sf_dir):
    return ts.language_id(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_fingerprints(spark, sf_dir):
    return ts.fingerprints(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dataset_split(spark, sf_dir):
    return ts.dataset_split(_docs(spark, sf_dir)).orderBy("doc_id")


def q_source_mixture(spark, sf_dir):
    return ts.source_mixture(_docs(spark, sf_dir))


def q_tfidf_top_terms(spark, sf_dir):
    return ts.tfidf_top_terms(_docs(spark, sf_dir)).orderBy("doc_id", "rank")


def q_vocab_top_terms(spark, sf_dir):
    return ts.vocab_top_terms(_docs(spark, sf_dir))


def q_lm_unigram_score(spark, sf_dir):
    return ts.lm_unigram_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def q_oov_rates(spark, sf_dir):
    return ts.oov_rates(_docs(spark, sf_dir)).orderBy("doc_id")


def q_boilerplate_shares(spark, sf_dir):
    return ts.boilerplate_shares(_docs(spark, sf_dir)).orderBy("doc_id")


def q_text_repetition(spark, sf_dir):
    return dp.repetition_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def q_sequence_pack(spark, sf_dir):
    return dp.sequence_pack(_docs(spark, sf_dir)).orderBy("doc_id")


def q_doc_chunks(spark, sf_dir):
    return dp.chunk_documents(_docs(spark, sf_dir)).orderBy("doc_id", "chunk_idx")


def q_temperature_mixture(spark, sf_dir):
    return ts.temperature_mixture(_docs(spark, sf_dir)).orderBy("source", "lang")


def q_mixture_resample(spark, sf_dir):
    return ts.mixture_resample(_docs(spark, sf_dir)).orderBy("doc_id")


def q_embedding_centroids(spark, sf_dir):
    return dp.embedding_centroids(_emb(spark, sf_dir))


def q_corpus_filter(spark, sf_dir):
    return dp.corpus_filter(_docs(spark, sf_dir)).orderBy("doc_id")


def q_stratified_sample(spark, sf_dir):
    return dp.stratified_sample(_docs(spark, sf_dir)).orderBy("doc_id")


def q_snapshot_diff(spark, sf_dir):
    old, new = dp.snapshot_versions(_docs(spark, sf_dir))
    return dp.snapshot_diff(old, new).orderBy("doc_id")


def q_embedding_quantization(spark, sf_dir):
    return dp.embedding_quantization(_emb(spark, sf_dir)).orderBy("vec_id")


def q_embedding_centroid_distance(spark, sf_dir):
    return dp.embedding_centroid_distance(_emb(spark, sf_dir)).orderBy("vec_id")


# --------------------------------------------------------------- multimodal
def q_multimodal_features(spark, sf_dir):
    return mm.extract_features(mm.attach_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_image_features(spark, sf_dir):
    """Real decode path: deterministic P6 payload per doc -> pure-Python
    Netpbm decode -> per-channel pixel means (analytic oracle)."""
    df = mm.extract_features(mm.attach_ppm_payload(_docs(spark, sf_dir)))
    for c in ("mean_c0", "mean_c1", "mean_c2"):
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


def q_multimodal_audio_features(spark, sf_dir):
    """Real audio decode path: deterministic PCM16 WAV per doc ->
    pure-Python RIFF chunk walk -> duration/mean/RMS/peak (analytic
    oracle; every pre-sqrt intermediate is an exact integer in float64)."""
    df = mm.extract_audio_features(mm.attach_wav_payload(_docs(spark, sf_dir)))
    for c in ("duration_sec", "mean_sample", "rms"):
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df.orderBy("doc_id")


def q_span_dedup(spark, sf_dir):
    """Span-level exact dedup (fixed-width substring-dedup approximation):
    per-doc share of 8-token spans duplicated verbatim in other docs."""
    return dd.span_dup_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def q_token_budget_sample(spark, sf_dir):
    """Greedy per-source token-budget selection under the deterministic
    md5 priority shuffle (budget = 1000 tokens per source)."""
    return dp.token_budget_sample(_docs(spark, sf_dir)).orderBy("doc_id")


def q_kmeans_clusters(spark, sf_dir):
    """Deterministic Lloyd's k-means (k=10, 3 iterations, 6-dp centroid
    rounding) over the embeddings table; oracle = the exactly-unrolled
    3-iteration SQL."""
    return cl.kmeans_assignments(_emb(spark, sf_dir)).orderBy("vec_id")


def q_cluster_balanced_sample(spark, sf_dir):
    """Diversity-aware quota selection: top-20 per k-means cluster under
    the deterministic md5(vec_id) priority."""
    return cl.cluster_balanced_sample(_emb(spark, sf_dir)).orderBy(
        "cluster", "rank"
    )


def q_cluster_purity(spark, sf_dir):
    """Per-cluster majority-label purity of the k-means clustering vs the
    embeddings' label column."""
    return cl.cluster_purity(_emb(spark, sf_dir)).orderBy("cluster")


def q_kmeans_inertia(spark, sf_dir):
    """Per-cluster within-cluster SSE vs the final k-means centroids —
    the elbow-curve / segmentation-quality diagnostic; oracle = the same
    unrolled-iteration SQL plus one literal-centroid distance scan."""
    return cl.kmeans_inertia(_emb(spark, sf_dir)).orderBy("cluster")


def q_semdedup(spark, sf_dir):
    """SemDeDup: within-k-means-cluster cosine dedup at tau=0.45 —
    keep-lowest-vec_id representative policy, cluster-bounded pair join."""
    return cl.semdedup(_emb(spark, sf_dir)).orderBy("vec_id")


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed-unigram importance weights, target = lang='en' docs,
    256 md5 feature buckets, add-one smoothing."""
    return ts.dsir_weights(_docs(spark, sf_dir)).orderBy("doc_id")


def q_gopher_rules(spark, sf_dir):
    """Gopher quality-rule battery (word count, mean word length, symbol
    ratio, alpha fraction, distinct stopwords) with per-rule verdicts."""
    return ts.gopher_rules(_docs(spark, sf_dir)).orderBy("doc_id")


def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity terciles per language —
    broadcast exact-percentile cutpoints, no per-lang global window."""
    return ts.ccnet_buckets(_docs(spark, sf_dir)).orderBy("doc_id")


def q_token_kl_drift(spark, sf_dir):
    """Per-source KL(source || corpus) over 256 hashed unigram buckets —
    the mixture-drift monitor."""
    return ts.token_kl_drift(_docs(spark, sf_dir)).orderBy("source")


def q_split_leakage(spark, sf_dir):
    """Train/test contamination audit: near-dup pairs annotated with both
    docs' splits and an is_leak flag."""
    return dd.split_leakage(_docs(spark, sf_dir)).orderBy("id_a", "id_b")


def q_dup_cluster_sizes(spark, sf_dir):
    """Near-dup component size histogram (singletons included) — the
    dedup audit read before choosing a keep policy."""
    return dd.dup_cluster_sizes(_docs(spark, sf_dir)).orderBy("cluster_size")


def q_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the doc's own token distribution +
    the /ln(n_distinct)-normalized variant."""
    return ts.token_entropy(_docs(spark, sf_dir)).orderBy("doc_id")


def q_contrastive_pairs(spark, sf_dir):
    """Contrastive pair mining: cluster-bounded positives (cos>=0.45) +
    per-anchor-capped hard negatives (same cluster, cos<=0.05)."""
    return cl.contrastive_pairs(_emb(spark, sf_dir)).orderBy(
        "id_a", "id_b", "label"
    )


def q_bpe_pair_counts(spark, sf_dir):
    """BPE merge-step candidates: corpus-weighted adjacent-char-pair
    frequencies, top-20 head by (count desc, pair asc)."""
    return ts.bpe_pair_counts(_docs(spark, sf_dir)).orderBy(
        F.desc("n_occurrences"), "pair"
    )


def q_corpus_shards(spark, sf_dir):
    """Deterministic md5 shard plan: shard assignment, within-shard write
    order, and the token prefix sum for size-bounded file cuts."""
    return dp.corpus_shards(_docs(spark, sf_dir)).orderBy("doc_id")


def q_multimodal_video_features(spark, sf_dir):
    """Strided frame sampling over real RIFF/AVI clips (uncompressed
    24-bit DIB frames — writer+parser in operators/multimodal.py, no
    codec libraries needed) — per-channel means over every 2nd frame,
    checked against an analytic oracle including the closed-form
    container size."""
    df = mm.extract_video_features(mm.attach_video_payload(_docs(spark, sf_dir)))
    for c in ("duration_sec", "mean_c0", "mean_c1", "mean_c2"):
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df.orderBy("doc_id")


def q_dup_canonical_docs(spark, sf_dir):
    """Canonical-doc selection per near-dup cluster: keep the longest
    member (ties -> smallest doc_id); one is_canonical=true per cluster."""
    return dd.canonical_selection(_docs(spark, sf_dir)).orderBy("doc_id")


def q_cross_source_dup_rates(spark, sf_dir):
    """Within/cross-source near-dup pair matrix — the cross-snapshot
    double-counting audit over the verified MinHash/LSH pair stream."""
    return dd.cross_source_dup_rates(_docs(spark, sf_dir)).orderBy(
        "source_lo", "source_hi"
    )


def q_lm_bigram_score(spark, sf_dir):
    """Add-one-smoothed bigram-LM mean negative log prob per doc — the
    fluency signal one order above lm_unigram_score."""
    return ts.lm_bigram_scores(_docs(spark, sf_dir)).orderBy("doc_id")


def q_source_cap_sample(spark, sf_dir):
    """Per-source frequency cap: at most SOURCE_CAP docs per source,
    md5-priority selected (the RefinedWeb/Dolma domain-balancing rule)."""
    return dp.source_cap_sample(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dsir_sample(spark, sf_dir):
    """DSIR resampling realized: Efraimidis-Spirakis weighted sampling
    without replacement over the dsir_weights frame."""
    return dp.dsir_sample(_docs(spark, sf_dir)).orderBy("doc_id")


def q_vocab_growth(spark, sf_dir):
    """Heaps-law vocabulary growth curve over a deterministic sharding."""
    return ts.vocab_growth(_docs(spark, sf_dir)).orderBy("shard_id")


def q_winnowing_fingerprints(spark, sf_dir):
    """Robust winnowing (SIGMOD 2003) fingerprint selection per doc."""
    return ts.winnowing_selections(_docs(spark, sf_dir)).orderBy(
        "doc_id", "sel_pos"
    )


def q_winnow_overlap(spark, sf_dir):
    """MOSS-style overlap report over the winnowed fingerprint sets."""
    return ts.winnow_overlap_pairs(_docs(spark, sf_dir)).orderBy(
        "id_a", "id_b"
    )


def q_signal_correlations(spark, sf_dir):
    """Exact-moment Pearson matrix over the quality-signal family."""
    return ts.signal_correlations(_docs(spark, sf_dir)).orderBy(
        "sig_a", "sig_b"
    )


def q_zipf_fit(spark, sf_dir):
    """Zipf-law slope fit over the top-K vocabulary head."""
    return ts.zipf_fit(_docs(spark, sf_dir))


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_embedding_lsh": q_dedup_embedding_lsh,
    "decontamination": q_decontamination,
    "dedup_components": q_dedup_components,
    "dedup_incremental": q_dedup_incremental,
    "ann_topk_cosine": q_ann_topk_cosine,
    "ann_topk_cosine_np": q_ann_topk_cosine_np,
    "ann_lsh_bucketed": q_ann_lsh_bucketed,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_fullprobe": q_ann_ivf_fullprobe,
    "knn_label_agreement": q_knn_label_agreement,
    "text_token_stats": q_text_token_stats,
    "text_quality": q_text_quality,
    "text_language_id": q_text_language_id,
    "text_fingerprints": q_text_fingerprints,
    "dataset_split": q_dataset_split,
    "source_mixture": q_source_mixture,
    "tfidf_top_terms": q_tfidf_top_terms,
    "vocab_top_terms": q_vocab_top_terms,
    "lm_unigram_score": q_lm_unigram_score,
    "oov_rates": q_oov_rates,
    "boilerplate_shares": q_boilerplate_shares,
    "text_repetition": q_text_repetition,
    "sequence_pack": q_sequence_pack,
    "embedding_centroids": q_embedding_centroids,
    "corpus_filter": q_corpus_filter,
    "stratified_sample": q_stratified_sample,
    "snapshot_diff": q_snapshot_diff,
    "embedding_centroid_distance": q_embedding_centroid_distance,
    "embedding_quantization": q_embedding_quantization,
    "multimodal_features": q_multimodal_features,
    "multimodal_image_features": q_multimodal_image_features,
    "multimodal_audio_features": q_multimodal_audio_features,
    "multimodal_video_features": q_multimodal_video_features,
    "doc_chunks": q_doc_chunks,
    "temperature_mixture": q_temperature_mixture,
    "mixture_resample": q_mixture_resample,
    "span_dedup": q_span_dedup,
    "token_budget_sample": q_token_budget_sample,
    "kmeans_clusters": q_kmeans_clusters,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "cluster_purity": q_cluster_purity,
    "kmeans_inertia": q_kmeans_inertia,
    "semdedup": q_semdedup,
    "dsir_weights": q_dsir_weights,
    "gopher_rules": q_gopher_rules,
    "ccnet_buckets": q_ccnet_buckets,
    "token_kl_drift": q_token_kl_drift,
    "corpus_shards": q_corpus_shards,
    "bpe_pair_counts": q_bpe_pair_counts,
    "token_entropy": q_token_entropy,
    "contrastive_pairs": q_contrastive_pairs,
    "split_leakage": q_split_leakage,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "dup_canonical_docs": q_dup_canonical_docs,
    "cross_source_dup_rates": q_cross_source_dup_rates,
    "lm_bigram_score": q_lm_bigram_score,
    "source_cap_sample": q_source_cap_sample,
    "dsir_sample": q_dsir_sample,
    "vocab_growth": q_vocab_growth,
    "winnowing_fingerprints": q_winnowing_fingerprints,
    "winnow_overlap": q_winnow_overlap,
    "signal_correlations": q_signal_correlations,
    "zipf_fit": q_zipf_fit,
}


# ================================================================== oracles
_SH_CTE = duck_shingles_cte("documents", k=3)

_EXACT_JACCARD_SQL = f"""
WITH {_SH_CTE},
sizes AS (SELECT doc_id, len(ts) AS n FROM sh),
ex AS (SELECT doc_id, unnest(ts) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c::DOUBLE / (sa.n + sb.n - c) >= {dd.JACCARD_THRESHOLD}
ORDER BY id_a, id_b
"""

_TOK = "string_split(text, ' ')"
_STOP_LIST = "[" + ", ".join(f"'{w}'" for w in ts.STOPWORDS) + "]"

# shared tail of the connected-components recursive oracle (follows the
# shingle CTE): exact-Jaccard pairs -> symmetric edges -> reachability
_COMPONENT_TAIL_CTES = f"""
, sizes AS (SELECT doc_id, len(ts) AS n FROM sh),
ex AS (SELECT doc_id, unnest(ts) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE c::DOUBLE / (sa.n + sb.n - c) >= {dd.JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT doc_id, doc_id AS r FROM documents
  UNION
  SELECT reach.doc_id, e.dst
  FROM reach JOIN edges e ON e.src = reach.r
)"""


def _lang_scores_sql() -> str:
    parts = []
    for lang, ws in sorted(ts.LANG_PROFILES.items()):
        lst = "[" + ", ".join(f"'{w}'" for w in ws) + "]"
        parts.append(
            f"len(list_filter(t, x -> list_contains({lst}, x)))::DOUBLE / len(t) AS s_{lang}"
        )
    return ", ".join(parts)


def _lang_pred_sql() -> str:
    langs = sorted(ts.LANG_PROFILES)
    whens = []
    for lang in langs:
        conds = " AND ".join(
            f"s_{lang} >= s_{o}" for o in langs if o != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " END"


_H60 = DUCK_HASH60.format(x="s")
_SIMHASH_EXPR = duck_simhash32_sql(
    f"list_transform(ts, s -> ({_H60} % 4294967296))", "len(ts)"
)

_COS = (
    "list_sum([{a}[i] * {b}[i] for i in range(1, len({a}) + 1)]) / "
    "(sqrt(list_sum([{a}[i] * {a}[i] for i in range(1, len({a}) + 1)])) * "
    "sqrt(list_sum([{b}[i] * {b}[i] for i in range(1, len({b}) + 1)])))"
)
# zero-norm exclusion (mirrors operators.similarity._nonzero): cosine is
# undefined for a zero-norm vector, so cosine-family oracles filter the
# vector CTE with this predicate — same rows as the Spark-side .where()
_NORM_POS = "list_sum(list_transform(embedding::DOUBLE[], x -> x * x)) > 0"

ORACLES = {
    "dedup_exact": """
WITH g AS (
  SELECT md5(text) AS h, min(doc_id) AS canonical_id,
         list(doc_id) AS ids, count(*) AS c
  FROM documents WHERE text IS NOT NULL GROUP BY 1
)
SELECT canonical_id, dup_id FROM (
  SELECT canonical_id, unnest(ids) AS dup_id FROM g WHERE c > 1
) WHERE dup_id <> canonical_id
ORDER BY canonical_id, dup_id
""",
    "dedup_ngram_jaccard": _EXACT_JACCARD_SQL,
    "dedup_minhash_lsh": _EXACT_JACCARD_SQL,
    # asymmetric containment |P∩D|/|P| (not Jaccard): the decontamination
    # metric — a training doc embedding a short benchmark item wholesale
    "decontamination": f"""
WITH {_SH_CTE},
p AS (SELECT doc_id AS probe_id, unnest(ts) AS s FROM sh WHERE doc_id % 10 = 0),
psz AS (SELECT doc_id AS probe_id, len(ts) AS np FROM sh WHERE doc_id % 10 = 0),
c AS (SELECT doc_id, unnest(ts) AS s FROM sh WHERE doc_id % 10 <> 0),
inter AS (
  SELECT probe_id, doc_id, count(*) AS n_shared
  FROM c JOIN p USING (s) GROUP BY 1, 2
)
SELECT probe_id, doc_id, n_shared,
       round(n_shared::DOUBLE / np, 6) AS containment
FROM inter JOIN psz USING (probe_id)
WHERE n_shared::DOUBLE / np >= {dd.CONTAMINATION_THRESHOLD}
ORDER BY probe_id, doc_id
""",
    # exact cross-split Jaccard: the probabilistic candidate stage must
    # reach recall 1.0 on the planted near-dups or the gate fails loudly
    "dedup_incremental": f"""
WITH {_SH_CTE},
sizes AS (SELECT doc_id, len(ts) AS n FROM sh),
ex AS (SELECT doc_id, unnest(ts) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS c
  FROM ex a JOIN ex b USING (s)
  WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
  GROUP BY 1, 2
)
SELECT new_id, corpus_id,
       round(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = corpus_id
WHERE c::DOUBLE / (sa.n + sb.n - c) >= {dd.JACCARD_THRESHOLD}
ORDER BY new_id, corpus_id
""",
    # connected components of the near-dup pair graph via recursive CTE:
    # min reachable doc_id per doc (singletons map to themselves)
    "dedup_components": "WITH RECURSIVE "
    + _SH_CTE.strip()
    + _COMPONENT_TAIL_CTES
    + """
SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id
ORDER BY doc_id
""",
    "dedup_simhash": f"""
WITH {_SH_CTE},
sig AS (SELECT doc_id, {_SIMHASH_EXPR} AS sh FROM sh)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sh, b.sh))::INT AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {dd.SIMHASH_MAX_HAMMING}
ORDER BY id_a, id_b
""",
    "dedup_embedding_cosine": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           WHERE {_NORM_POS}),
scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_COS.format(a="a.e", b="b.e")} AS cosine
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM scored WHERE cosine >= {dd.COSINE_DUP_THRESHOLD}
ORDER BY id_a, id_b
""",
    "ann_topk_cosine": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           WHERE {_NORM_POS}),
q AS (SELECT * FROM v WHERE vec_id < {N_ANN_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS.format(a="q.e", b="c.e")} AS cosine
  FROM q JOIN v c ON c.vec_id <> q.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
         ) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank::INT AS rank
FROM ranked WHERE rank <= {sim.DEFAULT_K}
ORDER BY query_id, rank
""",
    "text_token_stats": f"""
SELECT doc_id,
       len({_TOK}) AS n_tokens,
       len(regexp_extract_all(text, '{ts.BPE_REGEX}')) AS n_bpe_tokens,
       len(list_distinct({_TOK})) AS n_distinct_tokens,
       round(len(list_distinct({_TOK}))::DOUBLE / len({_TOK}), 6) AS distinct_ratio,
       length(text) AS n_chars
FROM documents ORDER BY doc_id
""",
    "text_quality": f"""
WITH base AS (
  SELECT doc_id, text, {_TOK} AS t FROM documents
),
m AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         round(len(list_filter(t, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
               / len(t), 6) AS stopword_ratio,
         round((length(text) - (len(t) - 1))::DOUBLE / len(t), 6) AS mean_token_len,
         round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
               / length(text), 6) AS alpha_ratio,
         len(list_intersect(t, {_STOP_LIST})) AS n_distinct_stopwords
  FROM base
)
SELECT *,
       (n_tokens >= {ts.QUALITY_MIN_TOKENS}
        AND mean_token_len <= {ts.QUALITY_MAX_MEAN_TOKEN_LEN}
        AND n_distinct_stopwords >= 1) AS keep
FROM m ORDER BY doc_id
""",
    "text_language_id": f"""
WITH base AS (SELECT doc_id, {_TOK} AS t FROM documents),
scored AS (SELECT doc_id, {_lang_scores_sql()} FROM base)
SELECT doc_id, {_lang_pred_sql()} AS pred_lang,
       round(s_de, 6) AS s_de, round(s_en, 6) AS s_en,
       round(s_es, 6) AS s_es, round(s_fr, 6) AS s_fr
FROM scored ORDER BY doc_id
""",
    "text_fingerprints": f"""
WITH {_SH_CTE},
hs AS (
  SELECT doc_id,
         list_sort(list_transform(ts, s -> {_H60})) AS h
  FROM sh
)
SELECT doc_id, h[1] AS fp0, h[2] AS fp1, h[3] AS fp2, h[4] AS fp3
FROM hs ORDER BY doc_id
""",
    "dataset_split": f"""
WITH b AS (
  SELECT doc_id,
         ({DUCK_HASH60.format(x="doc_id::VARCHAR")} % 100) AS bucket
  FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {ts.SPLIT_TRAIN_PCT} THEN 'train'
            WHEN bucket < {ts.SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY doc_id
""",
    "source_mixture": f"""
WITH agg AS (
  SELECT source, lang,
         count(*) AS n_docs,
         CAST(sum(len({_TOK})) AS BIGINT) AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY source, lang
)
SELECT source, lang, n_docs, n_tokens, n_chars,
       round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) AS token_share
FROM agg ORDER BY source, lang
""",
    "tfidf_top_terms": f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, term
  ) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {ts.TFIDF_TOP_K}
ORDER BY doc_id, rank
""",
    # first/last BYTE of the UTF-8 payload (not codepoint — they differ on
    # multibyte chars, and unicode('') is -1 not NULL): slice the hex dump
    # two chars per byte; empty payload -> '' -> nullif -> NULL
    "multimodal_features": """
SELECT doc_id,
       'text/plain' AS mime,
       octet_length(encode(text))::INT AS n_bytes,
       CAST(nullif(concat('0x', substring(hex(encode(text)), 1, 2)), '0x')
            AS INT) AS first_byte,
       CAST(nullif(concat('0x', substring(hex(encode(text)),
                                          2 * octet_length(encode(text)) - 1,
                                          2)), '0x')
            AS INT) AS last_byte,
       CAST(NULL AS INT) AS width,
       CAST(NULL AS INT) AS height,
       CAST(NULL AS INT) AS channels,
       CAST(NULL AS DOUBLE) AS mean_c0,
       CAST(NULL AS DOUBLE) AS mean_c1,
       CAST(NULL AS DOUBLE) AS mean_c2
FROM documents ORDER BY doc_id
""",
    # analytic mirror of operators/multimodal.make_ppm: header 'P6\\nW H\\n255\\n'
    # is 11 bytes (single-digit dims), pixel i = (doc_id*31 + i) % 256
    "multimodal_image_features": """
WITH dims AS (
  SELECT doc_id, 2 + doc_id % 3 AS w, 2 + doc_id % 2 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, i, (doc_id * 31 + i) % 256 AS v, i % 3 AS c
  FROM dims CROSS JOIN range(0, 48) t(i)
  WHERE i < w * h * 3
)
SELECT doc_id,
       'image/x-portable-pixmap' AS mime,
       CAST(11 + max(w) * max(h) * 3 AS INT) AS n_bytes,
       CAST(80 AS INT) AS first_byte,
       CAST((doc_id * 31 + max(w) * max(h) * 3 - 1) % 256 AS INT) AS last_byte,
       CAST(max(w) AS INT) AS width,
       CAST(max(h) AS INT) AS height,
       CAST(3 AS INT) AS channels,
       round(avg(v) FILTER (c = 0), 6) AS mean_c0,
       round(avg(v) FILTER (c = 1), 6) AS mean_c1,
       round(avg(v) FILTER (c = 2), 6) AS mean_c2
FROM px GROUP BY doc_id ORDER BY doc_id
""",
    # sampled frames f in {0, 2, 4}: stride 2 over nf in [4, 6];
    # n_sampled = (nf + 1) // 2; pixel (f, i) = (id*17 + f*7 + i) % 256.
    # n_bytes is the closed-form RIFF/AVI container size: fixed headers
    # (RIFF+hdrl+movi listType+idx1 header = 232B) + per frame a movi
    # chunk (8B header + stride*h DIB bytes; stride = 4-byte-aligned
    # 24-bit row = 8 for w=2, 12 for w=3) + a 16B idx1 entry
    "multimodal_video_features": """
WITH dims AS (
  SELECT doc_id, 2 + doc_id % 2 AS w, 2 AS h, 4 + doc_id % 3 AS nf,
         ((2 + doc_id % 2) * 3 + 3) // 4 * 4 AS dib_stride
  FROM documents
),
px AS (
  SELECT doc_id, w, h, nf, dib_stride, f.f, i.i,
         (doc_id * 17 + f.f * 7 + i.i) % 256 AS v, i.i % 3 AS c
  FROM dims
  CROSS JOIN range(0, 6) f(f)
  CROSS JOIN range(0, 18) i(i)
  WHERE f.f < nf AND f.f % 2 = 0 AND i.i < w * h * 3
)
SELECT doc_id,
       'video/x-msvideo' AS mime,
       CAST(232 + max(nf) * (24 + max(dib_stride) * max(h)) AS INT) AS n_bytes,
       CAST(max(w) AS INT) AS width,
       CAST(max(h) AS INT) AS height,
       CAST(max(nf) AS INT) AS n_frames,
       CAST(10 AS INT) AS fps,
       round(max(nf) / 10.0, 6) AS duration_sec,
       CAST((max(nf) + 1) // 2 AS INT) AS n_sampled,
       round(avg(v) FILTER (c = 0), 6) AS mean_c0,
       round(avg(v) FILTER (c = 1), 6) AS mean_c1,
       round(avg(v) FILTER (c = 2), 6) AS mean_c2
FROM px GROUP BY doc_id ORDER BY doc_id
""",
    "vocab_top_terms": f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
per_doc AS (SELECT term, doc_id, count(*) AS c FROM tok GROUP BY term, doc_id),
counts AS (
  SELECT term, CAST(sum(c) AS BIGINT) AS n_occurrences,
         count(*) AS doc_freq
  FROM per_doc GROUP BY term
),
total AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS total FROM counts),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, term) AS rank
  FROM counts
)
SELECT CAST(r.rank AS INT) AS rank, r.term, r.n_occurrences, r.doc_freq,
       round(r.n_occurrences::DOUBLE / t.total, 6) AS share,
       round(CAST(sum(r.n_occurrences) OVER (
                ORDER BY r.rank ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / t.total, 6) AS cum_coverage
FROM ranked r CROSS JOIN total t
WHERE r.rank <= {ts.VOCAB_TOP_K}
ORDER BY r.rank
""",
    # per-token -ln(p) summed in DECIMAL (order-free), divided/rounded as
    # DOUBLE — the oracle-pitfall float-aggregate rule
    "lm_unigram_score": f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS t FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM freq),
scored AS (
  SELECT doc_id,
         CAST(-ln(c::DOUBLE / n_total) AS DECIMAL(28,10)) AS nlp
  FROM tok JOIN freq USING (t) CROSS JOIN total
)
SELECT doc_id, count(*) AS n_tokens,
       round(CAST(sum(nlp) AS DOUBLE) / count(*), 6) AS mean_neg_logp
FROM scored GROUP BY doc_id ORDER BY doc_id
""",
    "oov_rates": f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS t FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
head AS (
  SELECT t FROM (
    SELECT t, row_number() OVER (ORDER BY c DESC, t) AS r FROM freq
  ) WHERE r <= {ts.OOV_VOCAB_SIZE}
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN head.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(sum(CASE WHEN head.t IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS oov_rate
FROM tok LEFT JOIN head USING (t)
GROUP BY doc_id ORDER BY doc_id
""",
    # independent mechanism: Spark counts doc-frequency on xxhash64 keys,
    # the oracle on the raw k-gram strings — a hash or explode bug flips it
    "boilerplate_shares": f"""
WITH {duck_shingles_cte("documents", k=ts.BOILERPLATE_K)},
ex AS (SELECT doc_id, len(ts) AS n_shingles, unnest(ts) AS s FROM sh),
freq AS (
  SELECT s FROM ex GROUP BY s HAVING count(*) >= {ts.BOILERPLATE_MIN_DOCS}
),
per_doc AS (
  SELECT e.doc_id,
         CAST(max(e.n_shingles) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN f.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boilerplate
  FROM ex e LEFT JOIN freq f ON e.s = f.s
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_shingles, 0) AS n_shingles,
       coalesce(p.n_boilerplate, 0) AS n_boilerplate,
       CASE WHEN coalesce(p.n_shingles, 0) > 0
            THEN round(p.n_boilerplate / CAST(p.n_shingles AS DOUBLE), 6)
            ELSE 0.0 END AS boilerplate_share
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
""",
    "text_repetition": f"""
WITH base AS (SELECT doc_id, {_TOK} AS t FROM documents),
bg AS (
  SELECT doc_id, len(t) AS n_tokens,
         CASE WHEN len(t) >= 2
              THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
              ELSE [] END AS b
  FROM base
),
tok AS (SELECT doc_id, unnest(t) AS tk FROM base),
cnts AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
top AS (
  SELECT doc_id, max(c) AS top_cnt, CAST(sum(c) AS BIGINT) AS total
  FROM cnts GROUP BY doc_id
)
SELECT bg.doc_id, bg.n_tokens,
       CASE WHEN len(bg.b) > 0
            THEN round(1 - len(list_distinct(bg.b))::DOUBLE / len(bg.b), 6)
            ELSE 0.0 END AS dup_bigram_ratio,
       round(top.top_cnt::DOUBLE / top.total, 6) AS top_token_share
FROM bg JOIN top USING (doc_id) ORDER BY doc_id
""",
    "sequence_pack": f"""
WITH sized AS (SELECT doc_id, len({_TOK}) AS n_tokens FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM sized
)
SELECT doc_id, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST(cum AS BIGINT) AS end_offset,
       CAST((cum - n_tokens) // {dp.SEQ_LEN} AS BIGINT) AS seq_first,
       CAST((cum - 1) // {dp.SEQ_LEN} AS BIGINT) AS seq_last
FROM c ORDER BY doc_id
""",
    "embedding_centroids": """
WITH v AS (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
ex AS (
  SELECT label, CAST(i - 1 AS INT) AS dim, e[i] AS val
  FROM v CROSS JOIN range(1, 4097) t(i)
  WHERE i <= len(e)
)
SELECT label, dim, count(*) AS n_vecs, round(avg(val), 6) AS centroid
FROM ex GROUP BY label, dim ORDER BY label, dim
""",
    # composed corpus decision: quality keep (same rounded formulas as the
    # text_quality oracle) AND dedup-component canonicality
    "corpus_filter": "WITH RECURSIVE "
    + _SH_CTE.strip()
    + _COMPONENT_TAIL_CTES
    + f"""
, comp AS (SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id),
qb AS (SELECT doc_id, text, {_TOK} AS t FROM documents),
qm AS (
  SELECT doc_id,
         len(t) AS n_tokens,
         round((length(text) - (len(t) - 1))::DOUBLE / len(t), 6) AS mean_token_len,
         len(list_intersect(t, {_STOP_LIST})) AS n_distinct_stopwords
  FROM qb
),
q AS (
  SELECT doc_id,
         (n_tokens >= {ts.QUALITY_MIN_TOKENS}
          AND mean_token_len <= {ts.QUALITY_MAX_MEAN_TOKEN_LEN}
          AND n_distinct_stopwords >= 1) AS keep
  FROM qm
)
SELECT q.doc_id,
       (q.keep AND comp.canonical_id = q.doc_id) AS kept,
       CASE WHEN NOT q.keep THEN 'low_quality'
            WHEN comp.canonical_id <> q.doc_id THEN 'duplicate' END AS reason
FROM q JOIN comp USING (doc_id)
ORDER BY q.doc_id
""",
    "stratified_sample": f"""
WITH b AS (
  SELECT doc_id, lang, source,
         ({DUCK_HASH60.format(x="doc_id::VARCHAR")} % 100) AS bucket,
         CASE {" ".join(
             f"WHEN lang = '{lang}' THEN {p}"
             for lang, p in sorted(dp.SAMPLE_PCT.items())
         )} ELSE {dp.SAMPLE_DEFAULT_PCT} END AS keep_pct
  FROM documents
)
SELECT doc_id, lang, source, CAST(bucket AS BIGINT) AS bucket,
       CAST(keep_pct AS INT) AS keep_pct
FROM b WHERE bucket < keep_pct ORDER BY doc_id
""",
    "snapshot_diff": f"""
WITH old AS (
  SELECT doc_id, md5(text) AS h_old FROM documents
  WHERE doc_id % {dp.SNAP_ADD_MOD} <> 0
),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % {dp.SNAP_EDIT_MOD} = 0 THEN reverse(text)
                  ELSE text END) AS h_new
  FROM documents WHERE doc_id % {dp.SNAP_DROP_MOD} <> 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE o.doc_id IS NULL OR n.doc_id IS NULL
   OR o.h_old IS DISTINCT FROM n.h_new
ORDER BY doc_id
""",
    "embedding_centroid_distance": f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
cells AS (
  SELECT label, i, avg(e[i]) AS c
  FROM v CROSS JOIN range(1, 4097) t(i)
  WHERE i <= len(e)
  GROUP BY label, i
),
cent AS (SELECT label, list(c ORDER BY i) AS ce FROM cells GROUP BY label)
SELECT v.vec_id, v.label,
       round({_COS.format(a="v.e", b="cent.ce")}, 6) AS cos_centroid
FROM v JOIN cent USING (label)
ORDER BY v.vec_id
""",
}
ORACLES["knn_label_agreement"] = f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
           WHERE {_NORM_POS}),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS label,
         c.vec_id AS neighbor_id, c.label AS n_label,
         {_COS.format(a="q.e", b="c.e")} AS cosine
  FROM v q JOIN v c ON c.vec_id <> q.vec_id
),
nn AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
    ) AS rank
    FROM scored
  ) WHERE rank <= {sim.DEFAULT_K}
),
votes AS (
  SELECT query_id, n_label, count(*) AS c FROM nn GROUP BY 1, 2
),
pred AS (
  SELECT query_id, n_label AS pred_label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY c DESC, n_label
    ) AS r FROM votes
  ) WHERE r = 1
),
agree AS (
  SELECT query_id,
         CAST(sum(CASE WHEN n_label = label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM nn GROUP BY query_id
)
SELECT nn.query_id AS vec_id, any_value(nn.label) AS label,
       any_value(pred.pred_label) AS pred_label,
       any_value(agree.n_agree) AS n_agree,
       any_value(pred.pred_label <> nn.label) AS mislabeled
FROM nn JOIN pred USING (query_id) JOIN agree USING (query_id)
GROUP BY nn.query_id
ORDER BY vec_id
"""
ORACLES["ann_topk_cosine_np"] = ORACLES["ann_topk_cosine"]
# full-probe IVF scores every inverted list -> exact search, row-identical
# to brute force (verified by test_ann_ivf_fullprobe_equals_brute_force)
ORACLES["ann_ivf_fullprobe"] = ORACLES["ann_topk_cosine"]

# quantize/dequantize in both engines with floor(x+0.5) half-up (no round()
# tie-mode reliance); per-element DOUBLE ops are IEEE-identical; round-9
# sits ~12 orders above the fold-order noise of the 64-term sums
ORACLES["embedding_quantization"] = """
WITH ex AS (
  SELECT unnest(embedding) AS val,
         generate_subscripts(embedding, 1) AS dim
  FROM embeddings
),
rng AS (
  SELECT dim, min(CAST(val AS DOUBLE)) AS lo, max(CAST(val AS DOUBLE)) AS hi
  FROM ex GROUP BY dim
),
packed AS (
  SELECT list(lo ORDER BY dim) AS los, list(hi ORDER BY dim) AS his FROM rng
),
errs AS (
  SELECT vec_id, len(embedding) AS n,
         [CAST(embedding[i] AS DOUBLE) -
            (los[i] + (CASE WHEN his[i] > los[i]
                 THEN floor((CAST(embedding[i] AS DOUBLE) - los[i]) * 255.0
                            / (his[i] - los[i]) + 0.5)
                 ELSE 0.0 END) * (his[i] - los[i]) / 255.0)
          for i in range(1, len(embedding) + 1)] AS e
  FROM embeddings CROSS JOIN packed
)
SELECT vec_id,
       round(list_sum([x * x for x in e]) / n, 9) AS mse,
       round(list_max([abs(x) for x in e]), 9) AS max_abs_err
FROM errs ORDER BY vec_id
"""

# analytic WAV oracle: regenerates the PCM16 samples in SQL; every
# pre-sqrt intermediate is an exact integer (< 2^53) on both engines, so
# the float statistics agree bit-for-bit before the 6-dp rounds
ORACLES["multimodal_audio_features"] = """
WITH base AS (SELECT doc_id, 16 + doc_id % 17 AS n FROM documents),
s AS (
  SELECT doc_id, n,
         [(doc_id * 131 + i * 17) % 2001 - 1000 for i in range(0, n)] AS a
  FROM base
)
SELECT doc_id,
       'audio/wav' AS mime,
       CAST(44 + 2 * n AS INT) AS n_bytes,
       CAST(82 AS INT) AS first_byte,
       CAST(((a[n] + 65536) % 65536) // 256 AS INT) AS last_byte,
       CAST(8000 AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       round(n / 8000.0, 6) AS duration_sec,
       round(CAST(list_sum(a) AS DOUBLE) / n, 6) AS mean_sample,
       round(sqrt(CAST(list_sum([x * x for x in a]) AS DOUBLE) / n), 6) AS rms,
       CAST(list_max([abs(x) for x in a]) AS INT) AS peak
FROM s ORDER BY doc_id
"""

ORACLES["doc_chunks"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(
             1,
             greatest(len(toks) - {dp.CHUNK_SIZE - dp.CHUNK_STRIDE}, 1),
             {dp.CHUNK_STRIDE})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // {dp.CHUNK_STRIDE} AS INT) AS chunk_idx,
       array_to_string(toks[start:start + {dp.CHUNK_SIZE} - 1], ' ')
         AS chunk_text,
       CAST(len(toks[start:start + {dp.CHUNK_SIZE} - 1]) AS INT)
         AS n_chunk_tokens
FROM s ORDER BY doc_id, chunk_idx
"""

# fixed-point sqrt-weight discipline: each cell's sqrt(p) is IEEE
# correctly-rounded (bit-identical across engines); the normalizing sum
# runs over floor(1e9*sqrt(p)) BIGINTs so it is exact and associative.
ORACLES["temperature_mixture"] = f"""
WITH agg AS (
  SELECT source, lang, CAST(sum(len({_TOK})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
),
fx AS (
  SELECT source, lang, n_tokens,
         CAST(floor(sqrt(n_tokens::DOUBLE / sum(n_tokens) OVER ())
                    * {10 ** ts.TEMP_SCALE_BITS}) AS BIGINT) AS w_fx
  FROM agg
)
SELECT source, lang, n_tokens,
       round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) AS token_share,
       round(w_fx::DOUBLE / sum(w_fx) OVER (), 6) AS temp_weight,
       CASE WHEN n_tokens > 0 THEN
         round((w_fx::DOUBLE / sum(w_fx) OVER ())
               / (n_tokens::DOUBLE / sum(n_tokens) OVER ()), 4)
       END AS upsample_factor
FROM fx ORDER BY source, lang
"""

# same fixed-point mixture CTEs as temperature_mixture; the Bernoulli draw
# reuses dataset_split's md5-bucket hash, so both engines decide each doc
# identically.
ORACLES["mixture_resample"] = f"""
WITH agg AS (
  SELECT source, lang, CAST(sum(len({_TOK})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
),
fx AS (
  SELECT source, lang, n_tokens,
         CAST(floor(sqrt(n_tokens::DOUBLE / sum(n_tokens) OVER ())
                    * {10 ** ts.TEMP_SCALE_BITS}) AS BIGINT) AS w_fx
  FROM agg
),
mix AS (
  SELECT source, lang,
         CASE WHEN n_tokens > 0 THEN
           round((w_fx::DOUBLE / sum(w_fx) OVER ())
                 / (n_tokens::DOUBLE / sum(n_tokens) OVER ()), 4)
         END AS r
  FROM fx
)
SELECT d.doc_id, d.source, d.lang,
       CAST(floor(r) + CASE
         WHEN ({DUCK_HASH60.format(x="d.doc_id::VARCHAR")}
               % {ts.RESAMPLE_BUCKETS})
              < (r - floor(r)) * {ts.RESAMPLE_BUCKETS}
         THEN 1 ELSE 0 END AS INT) AS n_copies
FROM documents d JOIN mix
  ON d.source IS NOT DISTINCT FROM mix.source
 AND d.lang IS NOT DISTINCT FROM mix.lang
ORDER BY d.doc_id
"""

# span-level exact dedup: spans reduced to the shared md5-60bit hash, so
# collisions (if any) collapse identically on both engines; the w=8
# shingle CTE is the k=3 jaccard CTE at a different width.
_SPAN_SH = duck_shingles_cte("documents", k=dd.SPAN_W)
ORACLES["span_dedup"] = f"""
WITH {_SPAN_SH},
ex AS (
  SELECT doc_id, {DUCK_HASH60.format(x="s")} AS h
  FROM (SELECT doc_id, unnest(ts) AS s FROM sh)
),
dup AS (SELECT h FROM ex GROUP BY h HAVING count(*) >= 2),
per AS (
  SELECT e.doc_id,
         count(*) AS n_spans,
         count(d.h) AS n_dup_spans
  FROM ex e LEFT JOIN dup d USING (h)
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_spans, 0)::BIGINT AS n_spans,
       coalesce(p.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       round(CASE WHEN coalesce(p.n_spans, 0) > 0
                  THEN p.n_dup_spans::DOUBLE / p.n_spans
                  ELSE 0.0 END, 6) AS dup_span_ratio
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
"""

# greedy budget selection: the window sum is integer-exact on both
# engines, and the md5 priority is the shared 60-bit hash, so the kept
# set is decided identically.
ORACLES["token_budget_sample"] = f"""
WITH s AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::INT AS n_tokens,
         {DUCK_HASH60.format(x="text")} AS pri
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY source ORDER BY pri, doc_id
           ROWS UNBOUNDED PRECEDING
         )::BIGINT AS cum_tokens
  FROM s
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {dp.TOKEN_BUDGET}
ORDER BY doc_id
"""


def _kmeans_ctes(k: int, n_iter: int, dim: int) -> tuple[str, str]:
    """Exactly-unrolled Lloyd's: one assignment CTE + one centroid-update
    CTE per iteration, mirroring clustering.kmeans_assignments' float
    contract (6-dp centroid AND distance rounding, [dist, cl] tie-break).
    Returns (WITH-clause prefix, name of the final assignment CTE) so the
    downstream cluster queries (balanced sample, purity) can share it."""
    rng = f"range(1, {dim + 1})"

    def assign(j: int, cprev: str) -> str:
        return f"""
a{j} AS (
  SELECT vec_id,
         (min([round(list_sum([ (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])
                                for i in {rng}]), 6),
               c.cl::DOUBLE]))[2]::INT AS cluster
  FROM e, {cprev} c GROUP BY vec_id
)"""

    def update(j: int, cprev: str) -> str:
        return f"""
m{j} AS (
  SELECT a.cluster AS cl, t.i AS dim, round(avg(e.v[t.i]), 6) AS m
  FROM a{j} a JOIN e USING (vec_id), {rng} t(i)
  GROUP BY 1, 2
),
c{j} AS (
  SELECT {cprev}.cl, coalesce(n.cent, {cprev}.cent) AS cent
  FROM {cprev} LEFT JOIN
       (SELECT cl, list(m ORDER BY dim) AS cent FROM m{j} GROUP BY cl) n
  USING (cl)
)"""

    # n_iter full (assign + update) Lloyd iterations, then one FINAL
    # assignment against the last centroids — mirroring the Spark loop
    parts = []
    for j in range(1, n_iter + 1):
        parts.append(assign(j, f"c{j - 1}"))
        parts.append(update(j, f"c{j - 1}"))
    parts.append(assign(n_iter + 1, f"c{n_iter}"))
    body = ",".join(parts)
    ctes = f"""
WITH e AS (
  SELECT vec_id, [embedding[i]::DOUBLE for i in {rng}] AS v
  FROM embeddings
),
c0 AS (
  SELECT vec_id::INT AS cl, [round(x, 6) for x in v] AS cent
  FROM e WHERE vec_id < {k}
),{body}"""
    return ctes, f"a{n_iter + 1}"


_KM_CTES, _KM_FINAL = _kmeans_ctes(cl.KMEANS_K, cl.KMEANS_ITERS, 64)

ORACLES["kmeans_clusters"] = f"""
{_KM_CTES}
SELECT vec_id, cluster FROM {_KM_FINAL} ORDER BY vec_id
"""

# quota selection over the SAME unrolled clustering; md5(vec_id) priority
# is the engine-shared seeded shuffle (mixture_resample precedent).
ORACLES["cluster_balanced_sample"] = f"""
{_KM_CTES},
pri AS (
  SELECT vec_id, cluster,
         {DUCK_HASH60.format(x="vec_id::VARCHAR")} AS pri
  FROM {_KM_FINAL}
),
r AS (
  SELECT vec_id, cluster,
         row_number() OVER (
           PARTITION BY cluster ORDER BY pri, vec_id
         )::INT AS rank
  FROM pri
)
SELECT vec_id, cluster, rank FROM r
WHERE rank <= {cl.PER_CLUSTER}
ORDER BY cluster, rank
"""

# majority vote via the [count, -label] lexicographic max — the exact
# tie-break the Spark struct-max computes; integer counts divide exactly.
ORACLES["cluster_purity"] = f"""
{_KM_CTES},
cells AS (
  SELECT a.cluster, e2.label, count(*) AS c
  FROM {_KM_FINAL} a JOIN embeddings e2 USING (vec_id)
  GROUP BY 1, 2
)
SELECT cluster,
       sum(c)::BIGINT AS n_points,
       (-(max([c::BIGINT, -label::BIGINT]))[2])::INT AS majority_label,
       round((max([c::BIGINT, -label::BIGINT]))[1]::DOUBLE / sum(c), 6)
         AS purity
FROM cells GROUP BY cluster ORDER BY cluster
"""

# same rounded squared distances the assignment argmin compares, summed
# in DECIMAL(18,6) (each addend is already a 6-dp value -> exact sum,
# partition-order-free on the Spark side)
ORACLES["kmeans_inertia"] = f"""
{_KM_CTES},
d AS (
  SELECT (min([round(list_sum([ (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])
                                for i in range(1, 65)]), 6),
               c.cl::DOUBLE]))[1] AS d2,
         (min([round(list_sum([ (e.v[i] - c.cent[i]) * (e.v[i] - c.cent[i])
                                for i in range(1, 65)]), 6),
               c.cl::DOUBLE]))[2]::INT AS cluster
  FROM e, c{cl.KMEANS_ITERS} c GROUP BY vec_id
)
SELECT cluster, count(*)::BIGINT AS n_points,
       CAST(sum(d2::DECIMAL(18,6)) AS DOUBLE) AS sse
FROM d GROUP BY cluster ORDER BY cluster
"""

# SemDeDup: within-cluster pairs only; cosine rounded to 6 dp BEFORE the
# threshold compare on both engines (the borderline-pair tie rule)
ORACLES["semdedup"] = f"""
{_KM_CTES},
dups AS (
  SELECT DISTINCT b.vec_id
  FROM {_KM_FINAL} a JOIN {_KM_FINAL} b
       ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  WHERE round({_COS.format(a="ea.v", b="eb.v")}, 6) >= {cl.SEMDEDUP_TAU}
)
SELECT f.vec_id, f.cluster,
       (f.vec_id IN (SELECT vec_id FROM dups)) AS is_dup
FROM {_KM_FINAL} f ORDER BY f.vec_id
"""

# DSIR: md5-bucketed unigram features; per-token log-ratio summed in
# DECIMAL(28,10) (the lm_unigram_score ln contract), rounded as DOUBLE
ORACLES["dsir_weights"] = f"""
WITH tok AS (
  SELECT doc_id, lang,
         ({DUCK_HASH60.format(x="t")}) % {ts.DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest({_TOK}) AS t FROM documents)
),
cells AS (
  SELECT bucket, count(*) AS c_r,
         count(*) FILTER (lang = '{ts.DSIR_TARGET_LANG}') AS c_t
  FROM tok GROUP BY bucket
),
totals AS (
  SELECT CAST(sum(c_r) AS BIGINT) AS n_r, CAST(sum(c_t) AS BIGINT) AS n_t
  FROM cells
),
model AS (
  SELECT bucket,
         CAST(ln((c_t + 1.0) / (n_t + {ts.DSIR_BUCKETS}))
              - ln((c_r + 1.0) / (n_r + {ts.DSIR_BUCKETS}))
              AS DECIMAL(28,10)) AS logratio
  FROM cells CROSS JOIN totals
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       round(CAST(sum(logratio) AS DOUBLE), 6) AS dsir_logweight
FROM tok JOIN model USING (bucket)
GROUP BY doc_id ORDER BY doc_id
"""

# Gopher rules: every signal replicated with the same integer identities
# (mean word len via length(text) - (n-1); '...' count via non-overlapping
# literal replace, = Spark's left-to-right regexp_replace), ratios rounded
# to 6 dp BEFORE the threshold compares on both engines
ORACLES["gopher_rules"] = f"""
WITH base AS (SELECT doc_id, text, {_TOK} AS t FROM documents),
m AS (
  SELECT doc_id,
         len(t)::BIGINT AS n_words,
         round((length(text) - (len(t) - 1))::DOUBLE / len(t), 6)
           AS mean_word_len,
         round(((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) / 3)
               / len(t), 6) AS symbol_word_ratio,
         round(len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
               / len(t), 6) AS alpha_word_frac,
         len(list_intersect(t, {_STOP_LIST}))::BIGINT AS n_distinct_stopwords
  FROM base
),
r AS (
  SELECT *,
         (n_words >= {ts.GOPHER_MIN_WORDS}
          AND n_words <= {ts.GOPHER_MAX_WORDS}) AS r_word_count,
         (mean_word_len >= {ts.GOPHER_MIN_MEAN_LEN}
          AND mean_word_len <= {ts.GOPHER_MAX_MEAN_LEN}) AS r_mean_len,
         (symbol_word_ratio <= {ts.GOPHER_MAX_SYMBOL_RATIO}) AS r_symbol,
         (alpha_word_frac >= {ts.GOPHER_MIN_ALPHA_FRAC}) AS r_alpha,
         (n_distinct_stopwords >= {ts.GOPHER_MIN_STOPWORDS}) AS r_stopwords
  FROM m
)
SELECT *,
       (r_word_count AND r_mean_len AND r_symbol AND r_alpha AND r_stopwords)
         AS gopher_keep
FROM r ORDER BY doc_id
"""

# CCNet terciles: same lm_unigram_score CTE chain, cutpoints =
# quantile_cont of the 6-dp-rounded scores (= Spark exact percentile),
# rounded 6 dp before the <= compares
ORACLES["ccnet_buckets"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS t FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM freq),
nlps AS (
  SELECT doc_id, CAST(-ln(c::DOUBLE / n_total) AS DECIMAL(28,10)) AS nlp
  FROM tok JOIN freq USING (t) CROSS JOIN total
),
scored AS (
  SELECT doc_id, round(CAST(sum(nlp) AS DOUBLE) / count(*), 6)
           AS mean_neg_logp
  FROM nlps GROUP BY doc_id
),
langd AS (
  SELECT s.doc_id, d.lang, s.mean_neg_logp
  FROM scored s JOIN documents d USING (doc_id)
),
cuts AS (
  SELECT lang,
         round(quantile_cont(mean_neg_logp, 1.0/3.0), 6) AS c1,
         round(quantile_cont(mean_neg_logp, 2.0/3.0), 6) AS c2
  FROM langd GROUP BY lang
)
SELECT doc_id, lang, mean_neg_logp,
       CASE WHEN mean_neg_logp <= c1 THEN 'head'
            WHEN mean_neg_logp <= c2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM langd JOIN cuts USING (lang) ORDER BY doc_id
"""

# KL drift: exact (unsmoothed) KL over the DSIR bucket space; per-bucket
# terms cast to DECIMAL(28,10) before the sum on both engines
ORACLES["token_kl_drift"] = f"""
WITH tok AS (
  SELECT source, ({DUCK_HASH60.format(x="t")}) % {ts.KL_BUCKETS} AS bucket
  FROM (SELECT source, unnest({_TOK}) AS t FROM documents)
),
cells AS (SELECT source, bucket, count(*) AS c_s FROM tok GROUP BY 1, 2),
marg AS (SELECT bucket, sum(c_s) AS c_b FROM cells GROUP BY bucket),
tot AS (SELECT source, sum(c_s) AS n_s FROM cells GROUP BY source),
g AS (SELECT sum(c_s) AS n_tot FROM cells)
SELECT source,
       CAST(max(n_s) AS BIGINT) AS n_tokens,
       count(*)::BIGINT AS n_buckets_used,
       round(CAST(sum(CAST((c_s / n_s) * ln((c_s / n_s) / (c_b / n_tot))
                           AS DECIMAL(28,10))) AS DOUBLE), 6) AS kl_nats
FROM cells JOIN marg USING (bucket) JOIN tot USING (source) CROSS JOIN g
GROUP BY source ORDER BY source
"""

# Shard plan: md5(doc_id) is the seeded permutation on both engines; the
# rank and prefix sum run per shard (no global sort on either side)
ORACLES["corpus_shards"] = f"""
WITH sized AS (
  SELECT doc_id,
         CAST(({DUCK_HASH60.format(x="doc_id::VARCHAR")}) % {dp.N_SHARDS}
              AS INT) AS shard_id,
         ({DUCK_HASH60.format(x="doc_id::VARCHAR")}) AS pri,
         len({_TOK}) AS n_tokens
  FROM documents
)
SELECT doc_id, shard_id,
       row_number() OVER w AS position,
       n_tokens,
       CAST(sum(n_tokens) OVER (w ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_tokens
FROM sized
WINDOW w AS (PARTITION BY shard_id ORDER BY pri, doc_id)
ORDER BY doc_id
"""

# BPE merge-step: distinct-word pair explosion weighted by word counts;
# identical substr(w, i, 2) pair extraction on both engines
ORACLES["bpe_pair_counts"] = f"""
WITH freq AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest({_TOK}) AS w FROM documents) GROUP BY w
),
pairs AS (
  SELECT c, unnest([substr(w, i, 2) FOR i IN range(1, length(w))]) AS pair
  FROM freq WHERE length(w) >= 2
),
agg AS (
  SELECT pair, CAST(sum(c) AS BIGINT) AS n_occurrences
  FROM pairs GROUP BY pair
)
SELECT pair, n_occurrences FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, pair) AS r
  FROM agg
) WHERE r <= {ts.BPE_TOP_PAIRS}
ORDER BY n_occurrences DESC, pair
"""

# Token entropy: per-(doc,token) cells, -p ln p terms in DECIMAL(28,10);
# the normalized form divides the two 6-dp-rounded doubles on both engines
ORACLES["token_entropy"] = f"""
WITH cell AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest({_TOK}) AS w FROM documents) GROUP BY 1, 2
),
tot AS (SELECT doc_id, sum(c) AS n FROM cell GROUP BY doc_id),
terms AS (
  SELECT doc_id, n,
         CAST(-(c::DOUBLE / n) * ln(c::DOUBLE / n) AS DECIMAL(28,10)) AS term
  FROM cell JOIN tot USING (doc_id)
),
agg AS (
  SELECT doc_id,
         CAST(max(n) AS BIGINT) AS n_tokens,
         count(*)::BIGINT AS n_distinct,
         round(CAST(sum(term) AS DOUBLE), 6) AS entropy_nats
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct, entropy_nats,
       CASE WHEN n_distinct > 1
            THEN round(entropy_nats / round(ln(n_distinct), 6), 6)
       END AS norm_entropy
FROM agg ORDER BY doc_id
"""

# Contrastive pairs: cluster-bounded pair frame shared with semdedup's
# oracle; negatives capped per anchor by the (cosine asc, id_b) window
ORACLES["contrastive_pairs"] = f"""
{_KM_CTES},
pv AS (
  SELECT f.vec_id, f.cluster, e.v
  FROM {_KM_FINAL} f JOIN e ON e.vec_id = f.vec_id
),
pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_COS.format(a="a.v", b="b.v")}, 6) AS cosine
  FROM pv a JOIN pv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
pos AS (
  SELECT id_a, id_b, cosine, 'positive' AS label
  FROM pr WHERE cosine >= {cl.CONTRASTIVE_POS_TAU}
),
neg AS (
  SELECT id_a, id_b, cosine, 'hard_negative' AS label FROM (
    SELECT *, row_number() OVER (PARTITION BY id_a
                                 ORDER BY cosine, id_b) AS r
    FROM pr WHERE cosine <= {cl.CONTRASTIVE_NEG_TAU}
  ) WHERE r <= {cl.CONTRASTIVE_NEG_PER_ANCHOR}
)
SELECT * FROM pos UNION ALL SELECT * FROM neg ORDER BY id_a, id_b, label
"""

# Split leakage: exact-Jaccard pair set (the minhash gate's oracle)
# joined to the md5-bucket split assignment
ORACLES["split_leakage"] = f"""
WITH {_SH_CTE},
sizes AS (SELECT doc_id, len(ts) AS n FROM sh),
ex AS (SELECT doc_id, unnest(ts) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, round(c::DOUBLE / (sa.n + sb.n - c), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE c::DOUBLE / (sa.n + sb.n - c) >= {dd.JACCARD_THRESHOLD}
),
spl AS (
  SELECT doc_id,
         CASE WHEN ({DUCK_HASH60.format(x="doc_id::VARCHAR")} % 100)
                   < {ts.SPLIT_TRAIN_PCT} THEN 'train'
              WHEN ({DUCK_HASH60.format(x="doc_id::VARCHAR")} % 100)
                   < {ts.SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT id_a, id_b, jaccard,
       a.split AS split_a, b.split AS split_b,
       (a.split <> b.split) AS is_leak
FROM jac JOIN spl a ON a.doc_id = id_a JOIN spl b ON b.doc_id = id_b
ORDER BY id_a, id_b
"""

# Cluster-size histogram over the full recursive component computation —
# a components bug anywhere breaks the histogram
ORACLES["dup_cluster_sizes"] = (
    "WITH RECURSIVE "
    + _SH_CTE.strip()
    + _COMPONENT_TAIL_CTES
    + """
, comp AS (SELECT doc_id, min(r) AS canonical_id FROM reach GROUP BY doc_id),
cs AS (
  SELECT canonical_id, count(*)::BIGINT AS cluster_size
  FROM comp GROUP BY canonical_id
)
SELECT cluster_size, count(*)::BIGINT AS n_clusters
FROM cs GROUP BY cluster_size ORDER BY cluster_size
"""
)

# Canonical selection: recursive components + longest-member argmax via
# a per-cluster window (the operator uses a struct-max partial agg; same
# (n_tokens DESC, doc_id ASC) total order)
ORACLES["dup_canonical_docs"] = (
    "WITH RECURSIVE "
    + _SH_CTE.strip()
    + _COMPONENT_TAIL_CTES
    + f"""
, comp AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
lens AS (
  SELECT doc_id, len({_TOK})::BIGINT AS n_tokens FROM documents
),
lab AS (
  SELECT comp.doc_id, cluster_id, n_tokens FROM comp JOIN lens USING (doc_id)
),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_tokens DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM lab
)
SELECT doc_id, cluster_id, cluster_size::BIGINT AS cluster_size,
       n_tokens, (rn = 1) AS is_canonical
FROM rk ORDER BY doc_id
"""
)

# Cross-source dup matrix: the exact-Jaccard pair set (the minhash gate's
# oracle) joined to both docs' sources, unordered-pair normalized
ORACLES["cross_source_dup_rates"] = f"""
WITH {_SH_CTE},
sizes AS (SELECT doc_id, len(ts) AS n FROM sh),
ex AS (SELECT doc_id, unnest(ts) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM ex a JOIN ex b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE c::DOUBLE / (sa.n + sb.n - c) >= {dd.JACCARD_THRESHOLD}
)
SELECT least(a.source, b.source) AS source_lo,
       greatest(a.source, b.source) AS source_hi,
       count(*)::BIGINT AS n_pairs
FROM jac
JOIN documents a ON a.doc_id = id_a
JOIN documents b ON b.doc_id = id_b
GROUP BY 1, 2 ORDER BY 1, 2
"""

# Bigram LM: integer counts + V make the -ln argument bit-identical;
# DECIMAL(28,10) sum, DOUBLE divide/round (the lm_unigram_score contract)
ORACLES["lm_bigram_score"] = f"""
WITH base AS (SELECT doc_id, {_TOK} AS t FROM documents),
tok AS (SELECT unnest(t) AS w1 FROM base),
freq AS (SELECT w1, count(*) AS c1 FROM tok GROUP BY 1),
vocab AS (SELECT count(*) AS v FROM freq),
bi AS (
  SELECT doc_id,
         unnest([{{'w1': t[i-1], 'w2': t[i]}}
                 for i in range(2, len(t)+1)]) AS bg
  FROM base WHERE len(t) >= 2
),
bix AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bi),
bfreq AS (SELECT w1, w2, count(*) AS c12 FROM bix GROUP BY 1, 2),
scored AS (
  SELECT doc_id,
         CAST(-ln((c12 + {ts.LM_BIGRAM_ADD_K})::DOUBLE
                  / (c1 + {ts.LM_BIGRAM_ADD_K} * v))
              AS DECIMAL(28,10)) AS nlp
  FROM bix JOIN bfreq USING (w1, w2) JOIN freq USING (w1) CROSS JOIN vocab
)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(sum(nlp) AS DOUBLE) / count(*), 6) AS mean_neg_logp
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# Per-source cap: row_number over the shared md5 priority; NULLS LAST
# pinned on the Spark side to match DuckDB's default, ::INT to match
# Spark's int row_number
ORACLES["source_cap_sample"] = f"""
WITH s AS (
  SELECT doc_id, source, {DUCK_HASH60.format(x="text")} AS pri
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source ORDER BY pri ASC NULLS LAST, doc_id
         )::INT AS keep_rank,
         (count(*) OVER (PARTITION BY source))::BIGINT AS n_source_docs
  FROM s
)
SELECT doc_id, source, keep_rank, n_source_docs
FROM r WHERE keep_rank <= {dp.SOURCE_CAP}
ORDER BY doc_id
"""

# DSIR E-S sampling: the dsir_weights CTE chain verbatim, then the
# exponential key — u is an exact-integer-over-2^60 double on both
# engines; weight exponent is the per-token mean of the 6-dp logweight;
# "+ 0" collapses -0.0 to 0.0 on both engines
ORACLES["dsir_sample"] = f"""
WITH tok AS (
  SELECT doc_id, lang,
         ({DUCK_HASH60.format(x="t")}) % {ts.DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest({_TOK}) AS t FROM documents)
),
cells AS (
  SELECT bucket, count(*) AS c_r,
         count(*) FILTER (lang = '{ts.DSIR_TARGET_LANG}') AS c_t
  FROM tok GROUP BY bucket
),
totals AS (
  SELECT CAST(sum(c_r) AS BIGINT) AS n_r, CAST(sum(c_t) AS BIGINT) AS n_t
  FROM cells
),
model AS (
  SELECT bucket,
         CAST(ln((c_t + 1.0) / (n_t + {ts.DSIR_BUCKETS}))
              - ln((c_r + 1.0) / (n_r + {ts.DSIR_BUCKETS}))
              AS DECIMAL(28,10)) AS logratio
  FROM cells CROSS JOIN totals
),
wts AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens,
         round(CAST(sum(logratio) AS DOUBLE), 6) AS dsir_logweight
  FROM tok JOIN model USING (bucket) GROUP BY doc_id
),
keyed AS (
  SELECT doc_id, n_tokens, dsir_logweight,
         round(
           ln((({DUCK_HASH60.format(x="doc_id::VARCHAR")}) + 1)::DOUBLE
              / 1152921504606846976.0)
           / exp(dsir_logweight / n_tokens), 6) + 0 AS es_key
  FROM wts
)
SELECT doc_id, n_tokens, dsir_logweight, es_key
FROM keyed ORDER BY es_key DESC, doc_id LIMIT {dp.DSIR_SAMPLE_N}
"""

# Heaps-law growth: all-integer (first-shard of each term, cumulative
# sums over the n_shards-row frame)
ORACLES["vocab_growth"] = f"""
WITH tok AS (
  SELECT (({DUCK_HASH60.format(x="doc_id::VARCHAR")})
          % {ts.VOCAB_GROWTH_SHARDS})::INT AS shard_id,
         doc_id, unnest({_TOK}) AS t
  FROM documents
),
per AS (
  SELECT shard_id, count(DISTINCT doc_id)::BIGINT AS n_docs,
         count(*)::BIGINT AS n_tokens
  FROM tok GROUP BY shard_id
),
firsts AS (SELECT min(shard_id) AS shard_id FROM tok GROUP BY t),
newt AS (
  SELECT shard_id, count(*)::BIGINT AS new_terms FROM firsts GROUP BY shard_id
)
SELECT p.shard_id, p.n_docs, p.n_tokens,
       coalesce(n2.new_terms, 0)::BIGINT AS new_terms,
       (sum(p.n_tokens) OVER w)::BIGINT AS cum_tokens,
       (sum(coalesce(n2.new_terms, 0)) OVER w)::BIGINT AS cum_vocab
FROM per p LEFT JOIN newt n2 USING (shard_id)
WINDOW w AS (ORDER BY p.shard_id ROWS UNBOUNDED PRECEDING)
ORDER BY p.shard_id
"""

# Winnowing: positional k-gram hashes packed into one HUGEINT key
# (min hash, rightmost position) so the rolling MIN is the whole
# selection rule; docs shorter than k words yield no rows on both engines
ORACLES["winnowing_fingerprints"] = f"""
WITH t AS (
  SELECT doc_id, {_TOK} AS toks FROM documents
  WHERE len({_TOK}) >= {ts.WINNOW_K}
),
p AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks) - {ts.WINNOW_K - 1})) AS pos
  FROM t
),
g AS (
  SELECT doc_id, pos,
         {DUCK_HASH60.format(
             x="array_to_string(toks[pos:pos+" + str(ts.WINNOW_K - 1) + "], ' ')"
         )} AS h
  FROM p
),
keyed AS (
  SELECT doc_id, pos,
         h::HUGEINT * {ts._WINNOW_POS_BASE}
           + ({ts._WINNOW_POS_BASE} - pos) AS key
  FROM g
),
rolled AS (
  SELECT doc_id, pos,
         min(key) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {ts.WINNOW_W - 1} PRECEDING AND CURRENT ROW
         ) AS kmin,
         max(pos) OVER (PARTITION BY doc_id) AS m
  FROM keyed
)
SELECT DISTINCT doc_id,
       ({ts._WINNOW_POS_BASE} - (kmin % {ts._WINNOW_POS_BASE}))::INT
         AS sel_pos,
       (kmin // {ts._WINNOW_POS_BASE})::BIGINT AS fp_hash
FROM rolled
WHERE pos >= {ts.WINNOW_W} OR pos = m
ORDER BY doc_id, sel_pos
"""


# MOSS overlap: the winnowing CTE chain, distinct hash sets per doc,
# hash equi-join intersection counts + per-side totals
ORACLES["winnow_overlap"] = f"""
WITH t AS (
  SELECT doc_id, {_TOK} AS toks FROM documents
  WHERE len({_TOK}) >= {ts.WINNOW_K}
),
p AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks) - {ts.WINNOW_K - 1})) AS pos
  FROM t
),
g AS (
  SELECT doc_id, pos,
         {DUCK_HASH60.format(
             x="array_to_string(toks[pos:pos+" + str(ts.WINNOW_K - 1) + "], ' ')"
         )} AS h
  FROM p
),
keyed AS (
  SELECT doc_id, pos,
         h::HUGEINT * {ts._WINNOW_POS_BASE}
           + ({ts._WINNOW_POS_BASE} - pos) AS key
  FROM g
),
rolled AS (
  SELECT doc_id, pos,
         min(key) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {ts.WINNOW_W - 1} PRECEDING AND CURRENT ROW
         ) AS kmin,
         max(pos) OVER (PARTITION BY doc_id) AS m
  FROM keyed
),
fp AS (
  SELECT DISTINCT doc_id,
         (kmin // {ts._WINNOW_POS_BASE})::BIGINT AS fp_hash
  FROM rolled
  WHERE pos >= {ts.WINNOW_W} OR pos = m
),
sizes AS (SELECT doc_id, count(*)::BIGINT AS n_fp FROM fp GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
  FROM fp a JOIN fp b USING (fp_hash)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
  HAVING count(*) >= {ts.WINNOW_OVERLAP_MIN}
)
SELECT id_a, id_b, n_shared,
       sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b
FROM shared
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
ORDER BY id_a, id_b
"""


# Pearson over exact fixed-point moments: every sum is HUGEINT/DECIMAL
# (order-free), only the scale-invariant final combination runs in
# DOUBLE (r is invariant under the 1e6 affine lift); zero-variance
# pairs -> NULL; complete-case per pair
ORACLES["signal_correlations"] = f"""
WITH base AS (SELECT doc_id, text, {_TOK} AS t FROM documents),
m AS (
  SELECT doc_id,
    CAST(round(round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
               / length(text), 6) * 1000000.0) AS BIGINT) AS alpha_ratio,
    CAST(round(round((length(text) - (len(t) - 1))::DOUBLE / len(t), 6)
               * 1000000.0) AS BIGINT) AS mean_token_len,
    CAST(round(len(t)::DOUBLE * 1000000.0) AS BIGINT) AS n_tokens,
    CAST(round(round(len(list_filter(t, x -> list_contains({_STOP_LIST}, x)))::DOUBLE
               / len(t), 6) * 1000000.0) AS BIGINT) AS stopword_ratio
  FROM base
),
long AS (
  SELECT doc_id, 'alpha_ratio' AS sig, alpha_ratio AS x FROM m
  UNION ALL SELECT doc_id, 'mean_token_len', mean_token_len FROM m
  UNION ALL SELECT doc_id, 'n_tokens', n_tokens FROM m
  UNION ALL SELECT doc_id, 'stopword_ratio', stopword_ratio FROM m
),
mom AS (
  SELECT a.sig AS sig_a, b.sig AS sig_b,
         count(*)::HUGEINT AS n,
         sum(a.x::HUGEINT) AS sx, sum(b.x::HUGEINT) AS sy,
         sum(a.x::HUGEINT * b.x) AS sxy,
         sum(a.x::HUGEINT * a.x) AS sxx,
         sum(b.x::HUGEINT * b.x) AS syy
  FROM long a JOIN long b USING (doc_id)
  WHERE a.sig < b.sig AND a.x IS NOT NULL AND b.x IS NOT NULL
  GROUP BY 1, 2
)
SELECT sig_a, sig_b, n::BIGINT AS n_ab,
       CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
             AND (n * syy - sy * sy)::DOUBLE > 0
            THEN round((n * sxy - sx * sy)::DOUBLE
                       / sqrt((n * sxx - sx * sx)::DOUBLE
                              * (n * syy - sy * sy)::DOUBLE), 6) + 0
       END AS corr
FROM mom ORDER BY sig_a, sig_b
"""


# Zipf fit: deterministic (count DESC, term) head, ln values in 1e12
# fixed point, HUGEINT moment sums, unrounded slope feeds the intercept
ORACLES["zipf_fit"] = f"""
WITH tok AS (SELECT unnest({_TOK}) AS t FROM documents),
freq AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
head AS (SELECT t, c FROM freq ORDER BY c DESC, t LIMIT {ts.ZIPF_TOP_K}),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM head
),
lifted AS (
  SELECT CAST(round(ln(r::DOUBLE) * 1e12) AS HUGEINT) AS x,
         CAST(round(ln(c::DOUBLE) * 1e12) AS HUGEINT) AS y
  FROM ranked
),
mom AS (
  SELECT count(*)::HUGEINT AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM lifted
)
SELECT n::BIGINT AS n_terms,
  CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
       THEN round((n * sxy - sx * sy)::DOUBLE
                  / (n * sxx - sx * sx)::DOUBLE, 6) + 0 END AS zipf_slope,
  CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
       THEN round((sy::DOUBLE
                   - ((n * sxy - sx * sy)::DOUBLE
                      / (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE)
                  / (n::DOUBLE * 1e12), 6) + 0 END AS zipf_intercept,
  CASE WHEN (n * sxx - sx * sx)::DOUBLE > 0
        AND (n * syy - sy * sy)::DOUBLE > 0
       THEN round(((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE)
                  / ((n * sxx - sx * sx)::DOUBLE
                     * (n * syy - sy * sy)::DOUBLE), 6) END AS r2
FROM mom
"""
