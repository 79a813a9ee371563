"""Text-analysis operators over the ``documents`` table.

Training-data pipeline stages: token counting, quality scoring, language
identification, document fingerprinting. Everything is built-in Spark SQL
expressions (JVM, whole-stage codegen) — no UDFs — and every formula is
reproduced verbatim in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.texthash import md5_hash60, shingles_from_tokens, tokens

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks
# (same char classes in Spark's Java regex and DuckDB's RE2).
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Fixed public stopword profiles (tiny deterministic language signatures).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "eine", "zu", "mit"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "una"],
    "fr": ["le", "la", "les", "et", "de", "que", "en", "un", "une", "est"],
}
STOPWORDS = sorted({w for ws in LANG_PROFILES.values() for w in ws})

QUALITY_MIN_TOKENS = 20
QUALITY_MAX_MEAN_TOKEN_LEN = 12.0


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counts: whitespace tokens, BPE-ish subword count,
    distinct-token ratio. Single scan, all codegen."""
    t = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), 0)).alias("n_bpe_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(t)) / F.size(t), 6).alias("distinct_ratio"),
        F.length("text").alias("n_chars"),
    )


def quality_exprs(t) -> dict[str, "F.Column"]:
    """The quality-scoring expression family over a token-array expression
    ``t`` — shared by :func:`quality_scores` and the corpus pipeline's
    one-scan score projection (corpus_pipeline.py), so the rule formulas
    exist exactly once."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(t, stop_arr))  # distinct-stopword hits
    n_stop_tokens = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    mean_tok = (F.length("text") - (F.size(t) - 1)) / F.size(t)
    # try_divide: an empty document (length 0) gets NULL alpha_ratio on
    # both engines (DuckDB 0.0/0 is NULL) instead of an ANSI-mode error;
    # the divisors above are token counts, >= 1 even for '' (split -> [''])
    alpha = F.try_divide(
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")), F.length("text")
    )
    return {
        "n_tokens": F.size(t),
        "stopword_ratio": F.round(n_stop_tokens / F.size(t), 6),
        "mean_token_len": F.round(mean_tok, 6),
        "alpha_ratio": F.round(alpha, 6),
        "n_distinct_stopwords": n_stop,
    }


def quality_keep_expr() -> "F.Column":
    """The keep rule over the (already selected, rounded) quality columns."""
    return (
        (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
        & (F.col("mean_token_len") <= QUALITY_MAX_MEAN_TOKEN_LEN)
        & (F.col("n_distinct_stopwords") >= 1)
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring (Gopher/C4-style rule family):

    - stopword_ratio: fraction of tokens in the shared stopword list;
    - mean_token_len;
    - alpha_ratio: alphabetic chars / all chars;
    - keep flag: enough tokens, sane mean token length, some stopwords.

    Output UNSORTED (registry wrapper adds the presentation orderBy).
    """
    q = quality_exprs(tokens(F.col("text")))
    return docs.select(
        "doc_id", *(expr.alias(name) for name, expr in q.items())
    ).withColumn("keep", quality_keep_expr())


def language_exprs(t) -> dict[str, "F.Column"]:
    """Per-language raw score expressions over a token-array expression —
    shared by :func:`language_id` and the corpus pipeline's one-scan score
    projection."""

    def _in_set(ws):
        arr = F.array(*[F.lit(w) for w in ws])
        # closure, not a default arg: pyspark introspects lambda arity and
        # would bind a lambda-variable Column to any extra parameter
        return lambda x: F.array_contains(arr, x)

    return {
        f"s_{lang}": F.size(F.filter(t, _in_set(ws))) / F.size(t)
        for lang, ws in sorted(LANG_PROFILES.items())
    }


def language_pred_expr() -> "F.Column":
    """Argmax with deterministic alphabetical tie-break over the (already
    selected) per-language score columns (matches the oracle's CASE
    cascade)."""
    langs = sorted(LANG_PROFILES)
    pred = F.when(F.lit(False), F.lit(None).cast("string"))
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other != lang:
                cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        pred = pred.when(cond, F.lit(lang))
    return pred


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID: per-language score = fraction of
    tokens in that language's signature set; argmax with deterministic
    alphabetical tie-break. Output UNSORTED (wrapper sorts)."""
    scores = language_exprs(tokens(F.col("text")))
    langs = sorted(LANG_PROFILES)
    scored = docs.select(
        "doc_id", *(expr.alias(name) for name, expr in scores.items())
    )
    return scored.select(
        "doc_id",
        language_pred_expr().alias("pred_lang"),
        *[F.round(F.col(f"s_{lang}"), 6).alias(f"s_{lang}") for lang in langs],
    )


SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 95  # [90, 95) val, [95, 100) test
TFIDF_TOP_K = 5


def split_exprs(doc_id_col=None):
    """(bucket, split) assignment expressions — the ONE place the
    train/val/test rule lives (used by ``dataset_split`` and the corpus
    pipeline's score stage)."""
    bucket = md5_hash60((doc_id_col or F.col("doc_id")).cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, F.lit("train"))
        .when(bucket < SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return bucket, split


def dataset_split(docs: DataFrame) -> DataFrame:
    """Deterministic hash-based train/val/test assignment.

    bucket = md5-60bit(doc_id) % 100 — a pure function of the stable key,
    so the split is reproducible across runs, engines, and (critically, at
    10^12 docs) across incremental re-runs: adding documents never moves an
    existing one between splits, unlike any sample()/shuffle split. The
    md5 prefix hash is computed identically by the DuckDB oracle.
    """
    bucket, split = split_exprs()
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        split.alias("split"),
    )


def source_mixture(docs: DataFrame) -> DataFrame:
    """Corpus mixture table: per (source, lang) document/token/char counts
    and each cell's share of all whitespace tokens — the bookkeeping a
    training-data pipeline needs to weight sampling across sources.

    One scan + one tiny aggregate; the share is a window over the (few-row)
    aggregate, not the corpus. Token counts are exact integers, so the
    share division is deterministic.
    """
    agg = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    total = Window.partitionBy()
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), 6).alias(
            "token_share"
        ),
    ).orderBy("source", "lang")


def tfidf_top_terms(docs: DataFrame, k: int = TFIDF_TOP_K) -> DataFrame:
    """Per-document top-k terms by TF-IDF (tf = term count in doc,
    idf = ln(N/df), ties break on the term string).

    Shapes at 10^12 docs: tf is a (doc_id, term) partial-aggregating
    groupBy (hot terms spread across doc_ids); df is a term-keyed count
    over the already-reduced tf frame (one row per doc-term, not per
    occurrence); N broadcasts as a 1-row frame; the final top-k is a
    doc-partitioned rank window with WindowGroupLimit pushdown.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


VOCAB_TOP_K = 50


def vocab_top_terms(docs: DataFrame, k: int = VOCAB_TOP_K) -> DataFrame:
    """Corpus vocabulary head: the k most frequent tokens with occurrence
    count, document frequency, corpus share, and CUMULATIVE coverage — the
    curve a tokenizer design reads to pick a vocab size ("how many types
    cover 95% of tokens").

    Shapes: one (term)-keyed partial-agg count over the exploded corpus
    (hot terms partial-aggregate map-side); the rank and the running
    coverage windows run on the tiny aggregated vocab (and the cumulative
    window on the k-row head only), never on corpus rows. Ties rank by
    term string for cross-engine determinism.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    per_doc = tok.groupBy("term", "doc_id").agg(F.count("*").alias("c"))
    counts = per_doc.groupBy("term").agg(
        F.sum("c").alias("n_occurrences"),
        F.count("*").alias("doc_freq"),
    )
    total = counts.agg(F.sum("n_occurrences").alias("total"))
    w_rank = Window.orderBy(F.col("n_occurrences").desc(), F.col("term"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .crossJoin(F.broadcast(total))
    )
    w_cum = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranked.select(
        F.col("rank").cast("int").alias("rank"),
        "term",
        "n_occurrences",
        "doc_freq",
        F.round(F.col("n_occurrences") / F.col("total"), 6).alias("share"),
        F.round(F.sum("n_occurrences").over(w_cum) / F.col("total"), 6).alias(
            "cum_coverage"
        ),
    ).orderBy("rank")


def fingerprints(docs: DataFrame, k: int = 3, n: int = 4) -> DataFrame:
    """Bottom-n sketch fingerprint: the n smallest md5-60bit shingle hashes
    per doc (a fixed-size, order-insensitive content signature usable for
    near-dup blocking and set-similarity estimation at scale)."""
    # Tokenize in its own projection (the shingle HOF inlines its argument
    # subtree — see texthash.shingles_from_tokens), then materialize the
    # sorted hash array once before picking n elements — referencing the
    # array expression n times would re-run the shingle+md5 pass per
    # fingerprint column (no CSE across projections of non-cheap exprs
    # referenced once; inlined when referenced n times).
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = shingles_from_tokens(F.col("t"), k)
    hashed = tok.select(
        "doc_id", F.array_sort(F.transform(sh, md5_hash60)).alias("hs")
    )
    cols = [
        F.get("hs", i).alias(f"fp{i}") for i in range(n)  # null when < n shingles
    ]
    return hashed.select("doc_id", *cols)


def lm_unigram_scores(docs: DataFrame) -> DataFrame:
    """CCNet-style LM quality signal: each document's mean negative log
    probability under the corpus's own unigram model (perplexity =
    exp(mean_neg_logp); left to the caller — exp stacks ULP noise onto a
    cross-engine-compared value for no extra information).

    High scores = documents dominated by corpus-rare tokens (garbled text,
    spam, wrong-language fragments); low scores = boilerplate. The
    production pattern trains the model on a reference corpus and scores a
    candidate corpus; here the corpus scores itself (every token has
    count >= 1, so no smoothing term is needed).

    Scale shape: the model IS a token-frequency aggregate — map-side
    partial-agged, vocab-sized. The score join shuffles on the token key
    (vocab-sized build side); at 10^12 tokens broadcast the top-V head and
    fold the long tail into a smoothing constant instead. Cross-engine
    determinism: per-token -ln(p) summed in DECIMAL (partition-order-free),
    divided and rounded as DOUBLE — the oracle-pitfall rules.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n_total"))
    nlp = -F.log(F.col("c") / F.col("n_total"))
    scored = tok.join(freq, "t").join(F.broadcast(total)).select(
        "doc_id", nlp.cast("decimal(28,10)").alias("nlp")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.sum("nlp").cast("double") / F.count("*"), 6
        ).alias("mean_neg_logp"),
    )


DSIR_BUCKETS = 256
DSIR_TARGET_LANG = "en"


def dsir_weights(
    docs: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    target_lang: str = DSIR_TARGET_LANG,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how target-like its hashed unigram features
    are, log p_target(doc) - log p_raw(doc) under two bag-of-buckets
    models — the standard cheap proxy for "does this web page look like
    Wikipedia" selection before pretraining.

    Feature space: tokens hashed into ``n_buckets`` buckets via the
    engine-portable ``md5_hash60 % n_buckets`` (DSIR's hashed n-gram
    features, unigram order here). Target corpus: documents whose
    ``lang`` column equals ``target_lang`` (the metadata stand-in for a
    curated reference corpus); raw corpus: all documents. Both bucket
    models use add-one smoothing over ``n_buckets`` so buckets unseen in
    the target stay finite:

        logratio(b) = ln((c_t(b)+1)/(n_t+B)) - ln((c_r(b)+1)/(n_r+B))

    Per-document weight = sum of logratio over its tokens, summed in
    DECIMAL(28,10) (partition-order-free; the ``lm_unigram_scores``
    cross-engine ln contract), rounded to 6 dp as DOUBLE.

    Output: ``(doc_id, n_tokens, dsir_logweight)`` — one row per doc;
    resampling under these weights is ``mixture_resample``'s job.

    Scale shape (100 TB): BOTH models come out of ONE corpus scan (the
    target count is a conditional agg of the same bucket cell — map-side
    partial, 8-byte keys, <= B result rows), joined back into the token
    stream as a BROADCAST of <= B rows — the corpus shuffles once on
    doc_id for the final per-doc sum and never on text. The two totals
    are an O(B) metadata collect off the pinned model frame.
    """
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t")
    ).select(
        "doc_id", "lang", (md5_hash60(F.col("t")) % n_buckets).alias("bucket")
    )
    # both models in ONE corpus scan (the target count is a conditional
    # agg of the same bucket cell); totals come from the <=B-row model
    # frame, not extra corpus scans — lazy localCheckpoint pins it
    cells = (
        tok.groupBy("bucket")
        .agg(
            F.count("*").alias("c_r"),
            F.count(F.when(F.col("lang") == target_lang, 1)).alias("c_t"),
        )
        .localCheckpoint(eager=False)
    )
    totals = cells.agg(F.sum("c_r"), F.sum("c_t")).collect()[0]
    n_r, n_t = int(totals[0]), int(totals[1])
    model = cells.select(
        "bucket",
        (
            F.log((F.col("c_t") + 1.0) / float(n_t + n_buckets))
            - F.log((F.col("c_r") + 1.0) / float(n_r + n_buckets))
        )
        .cast("decimal(28,10)")
        .alias("logratio"),
    )
    return (
        tok.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum("logratio").cast("double"), 6).alias(
                "dsir_logweight"
            ),
        )
    )


GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_rules(docs: DataFrame) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446,
    Table A1) — the named rule battery web-scale pretraining pipelines
    (MassiveText, RefinedWeb, Dolma) apply before any model-based scoring.
    Emits every rule's measured signal AND its boolean verdict, so the
    downstream keep decision is auditable per rule rather than a single
    opaque flag:

    - ``r_word_count``: ``GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS``
      (paper: 50..100k);
    - ``r_mean_len``: mean word length in [3, 10] chars;
    - ``r_symbol``: symbol-to-word ratio (``#`` and ``...`` occurrences)
      <= 0.1;
    - ``r_alpha``: fraction of words containing an alphabetic char >= 0.8;
    - ``r_stopwords``: at least 2 DISTINCT stopwords present (the paper
      uses its own 8-word English list; this engine substitutes the
      repo-wide multilingual ``STOPWORDS`` profile so the rule is
      meaningful on non-English docs too);
    - ``gopher_keep``: AND of all five.

    Mean word length reuses the ``quality_exprs`` identity for a
    single-space-split text: sum(token lengths) = length(text) - (n-1),
    exact in integer arithmetic on both engines. All ratios rounded to
    6 dp before the threshold compare (the cross-engine float contract).

    Scale shape: pure row-local codegen scan — zero shuffles, zero joins;
    the stopword array is a query literal. This is the operator you run
    FIRST at 100 TB, precisely because it costs one pass.
    """
    g = gopher_exprs(tokens(F.col("text")))
    out = docs.select(
        "doc_id", *(expr.alias(name) for name, expr in g.items())
    )
    rules = gopher_rule_exprs()
    return out.select(
        "*",
        *(expr.alias(name) for name, expr in rules.items()),
        gopher_keep_expr().alias("gopher_keep"),
    )


def gopher_exprs(t) -> dict[str, "F.Column"]:
    """The Gopher signal expression family over a token-array expression
    ``t`` — shared by :func:`gopher_rules` and the corpus pipeline's
    one-scan score projection (``corpus_pipeline.score_projection``), so
    each formula exists exactly once. ``n_words`` / ``mean_word_len``
    intentionally share ``quality_exprs``'s n_tokens / mean-token-length
    identities (same single-space-split arithmetic)."""
    n = F.size(t)
    hashes = F.length("text") - F.length(F.regexp_replace("text", "#", ""))
    ellipses = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"\.\.\.", ""))
    ) / 3
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return {
        "n_words": n.cast("bigint"),
        "mean_word_len": F.round((F.length("text") - (n - 1)) / n, 6),
        "symbol_word_ratio": F.round((hashes + ellipses) / n, 6),
        "alpha_word_frac": F.round(
            F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))) / n, 6
        ),
        "n_distinct_stopwords": F.size(F.array_intersect(t, stop_arr)).cast(
            "bigint"
        ),
    }


def gopher_rule_exprs(cols: dict[str, str] | None = None) -> dict[str, "F.Column"]:
    """Per-rule verdicts over already-selected signal columns. ``cols``
    remaps a signal to a differently-named column carrying the same
    formula (the score projection reuses quality's ``n_tokens`` /
    ``mean_token_len`` for ``n_words`` / ``mean_word_len``)."""
    c = lambda k: F.col((cols or {}).get(k, k))  # noqa: E731
    return {
        "r_word_count": (c("n_words") >= GOPHER_MIN_WORDS)
        & (c("n_words") <= GOPHER_MAX_WORDS),
        "r_mean_len": (c("mean_word_len") >= GOPHER_MIN_MEAN_LEN)
        & (c("mean_word_len") <= GOPHER_MAX_MEAN_LEN),
        "r_symbol": c("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_RATIO,
        "r_alpha": c("alpha_word_frac") >= GOPHER_MIN_ALPHA_FRAC,
        "r_stopwords": c("n_distinct_stopwords") >= GOPHER_MIN_STOPWORDS,
    }


def gopher_keep_expr(cols: dict[str, str] | None = None) -> "F.Column":
    """AND of all five rule verdicts (same column remap contract)."""
    out = F.lit(True)
    for expr in gopher_rule_exprs(cols).values():
        out = out & expr
    return out


CCNET_BUCKETS = ["head", "middle", "tail"]


def ccnet_buckets(docs: DataFrame) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020, arXiv:1911.00359):
    per-language head/middle/tail terciles of the unigram-LM quality score
    (:func:`lm_unigram_scores`) — the published recipe for stratifying a
    web crawl by fluency before choosing how much of each stratum to keep.

    Deliberately the SCALE-CORRECT formulation rather than an
    ``ntile(3)`` window: a per-language window would funnel the whole
    corpus through (langs) partitions. Instead the two tercile cutpoints
    per language come from an exact-``percentile`` partial agg (a
    langs×2-value frame), broadcast back into the scored stream, and the
    bucket is a row-local CASE — the corpus shuffles once for the
    language-grain agg input and never sorts globally. At 10^12 docs swap
    ``percentile`` for ``approx_percentile`` with a documented error
    budget; the join shape is unchanged.

    Determinism: scores are 6-dp-rounded by ``lm_unigram_scores``;
    cutpoints are exact interpolated percentiles of those rounded scores,
    themselves rounded to 6 dp before the ``<=`` compares (DuckDB
    ``quantile_cont`` matches Spark ``percentile`` on identical input
    multisets).

    Output: ``(doc_id, lang, mean_neg_logp, bucket)``.
    """
    scored = lm_unigram_scores(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    cuts = scored.groupBy("lang").agg(
        F.round(F.percentile("mean_neg_logp", F.lit(1.0 / 3.0)), 6).alias("c1"),
        F.round(F.percentile("mean_neg_logp", F.lit(2.0 / 3.0)), 6).alias("c2"),
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .select(
            "doc_id",
            "lang",
            "mean_neg_logp",
            F.when(F.col("mean_neg_logp") <= F.col("c1"), F.lit("head"))
            .when(F.col("mean_neg_logp") <= F.col("c2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


KL_BUCKETS = 256


def token_kl_drift(docs: DataFrame, n_buckets: int = KL_BUCKETS) -> DataFrame:
    """Per-source token-distribution drift: KL(P_source || P_corpus) over
    ``n_buckets`` hashed unigram buckets — the mixture-monitoring signal
    that flags a source whose vocabulary usage diverges from the corpus it
    feeds (scraper regression, language shift, spam influx) before that
    drift reaches training. Same hashed feature space as
    :func:`dsir_weights` (``md5_hash60 % n_buckets``).

    Exact KL needs no smoothing here: buckets the source never emits
    contribute 0 (lim x→0 of x·ln x), and every bucket the source DOES
    emit has a nonzero corpus count because the corpus contains the
    source. Per-bucket terms p_s·ln(p_s/p_c) are cast to DECIMAL(28,10)
    and summed (partition-order-free), rounded to 6 dp as DOUBLE.

    Output: ``(source, n_tokens, n_buckets_used, kl_nats)``.

    Scale shape: ONE corpus scan reduces to (source, bucket) cells —
    map-side partial agg, at most sources×``n_buckets`` rows survive the
    shuffle; the corpus marginal re-aggregates those cells (no second
    scan) and joins back broadcast. Token text never shuffles.
    """
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("t")
    ).select("source", (md5_hash60(F.col("t")) % n_buckets).alias("bucket"))
    cells = (
        tok.groupBy("source", "bucket")
        .agg(F.count("*").alias("c_s"))
        .localCheckpoint(eager=False)
    )
    marg = cells.groupBy("bucket").agg(F.sum("c_s").alias("c_b"))
    src_tot = cells.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    grand = cells.agg(F.sum("c_s").alias("n_tot"))
    p_s = F.col("c_s") / F.col("n_s")
    p_c = F.col("c_b") / F.col("n_tot")
    term = (p_s * F.log(p_s / p_c)).cast("decimal(28,10)")
    return (
        cells.join(F.broadcast(marg), "bucket")
        .join(F.broadcast(src_tot), "source")
        .join(F.broadcast(grand))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_buckets_used"),
            F.round(F.sum(term).cast("double"), 6).alias("kl_nats"),
        )
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Per-document Shannon entropy of the doc's OWN token distribution,
    plus the length-normalized variant — the lexical-diversity quality
    signal (low entropy = keyboard mash / repeated boilerplate; the
    repetition-filter companion used alongside the Gopher rules).

    - ``entropy_nats`` = −Σ_w p_w·ln(p_w) over the doc's distinct tokens
      (p_w = count_w / n_tokens);
    - ``norm_entropy`` = entropy / ln(n_distinct) ∈ [0,1] (1 = all tokens
      distinct-uniform; NULL when the doc has a single distinct token —
      both engines agree ln(1)=0 division yields NULL under
      try-division semantics, so the column is explicitly guarded).

    Cross-engine: per-token terms cast to DECIMAL(28,10) and summed
    (partition-order-free), rounded to 6 dp as DOUBLE; the normalized
    form divides the two ROUNDED doubles and re-rounds (so both engines
    divide identical inputs).

    Scale shape: explode → (doc_id, token) count partial agg → doc_id
    rollup. Two shuffles on 8-byte-ish keys, text never wider than one
    token; no joins, no broadcast.
    """
    cell = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    per_doc = cell.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.collect_list(F.col("c")).alias("cs"),
    )
    # entropy from the doc-local count vector: p = c/n, term = -p ln p;
    # the fold runs row-local over a vector bounded by the doc's distinct
    # count (the same bound collect_list already has in centroids D19)
    term_sum = F.aggregate(
        "cs",
        F.lit(0.0).cast("decimal(28,10)"),
        # re-cast after the add: decimal + decimal widens to (29,10) and
        # the fold accumulator type must stay fixed. The cast is lossless
        # here (terms are <= ln(n) ~ 30, far inside 18 integer digits).
        lambda acc, c: (
            acc
            + (
                -(c / F.col("n_tokens")) * F.log(c / F.col("n_tokens"))
            ).cast("decimal(28,10)")
        ).cast("decimal(28,10)"),
    )
    h = F.round(term_sum.cast("double"), 6)
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        h.alias("entropy_nats"),
        F.when(
            F.col("n_distinct") > 1,
            F.round(h / F.round(F.log(F.col("n_distinct").cast("double")), 6), 6),
        ).alias("norm_entropy"),
    )


BPE_TOP_PAIRS = 20


def bpe_pair_counts(docs: DataFrame, top_k: int = BPE_TOP_PAIRS) -> DataFrame:
    """One BPE merge-step candidate scan (Sennrich et al. 2016,
    arXiv:1508.07909): corpus-weighted frequencies of adjacent character
    pairs within words — the argmax of this table IS the next merge a BPE
    tokenizer trainer would take, and the full head is the data a
    distributed tokenizer-training loop consumes per iteration.

    Pair extraction follows the classic formulation (adjacent symbol
    pairs inside a word; word boundaries never pair across). Each
    DISTINCT word contributes its internal pairs weighted by the word's
    corpus count, so a word with a repeated pair ("aaa" → "aa" twice)
    counts multiplicity — exactly the trainer's statistics.

    Output: top ``top_k`` rows ``(pair, n_occurrences)`` by
    (count desc, pair asc) — the deterministic head.

    Scale shape (100 TB): the corpus reduces to its VOCABULARY first
    (one token-count partial agg — the same shuffle ``vocab_top_terms``
    pays), and pair explosion runs over distinct words only: pair cost is
    vocab-sized, not corpus-sized. The top-k head is a rank window over
    the (≤ alphabet²-sized) pair aggregate. Corpus text shuffles once as
    tokens, never as pairs.
    """
    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    pairs = freq.where(F.length("w") >= 2).select(
        "c",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("c").cast("bigint").alias("n_occurrences"))
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        agg.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= top_k)
        .select("pair", "n_occurrences")
    )


OOV_VOCAB_SIZE = 20


def oov_rates(docs: DataFrame, vocab_size: int = OOV_VOCAB_SIZE) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's top-V
    vocabulary (by occurrence count, ties on the term string) — the
    tokenizer-design companion to :func:`vocab_top_terms`: how much of each
    document a V-entry vocab fails to cover, and the screen for documents
    dominated by tail tokens.

    Shapes: the vocab head is a rank window over the (vocab-sized) term
    frequency aggregate, then BROADCAST back into the token stream as a
    left-semi membership probe — the corpus-side scan never shuffles; the
    per-doc rollup partial-aggregates on doc_id.
    """
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    w = Window.orderBy(F.desc("c"), F.asc("t"))
    head = (
        freq.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= vocab_size)
        .select("t", F.lit(True).alias("in_vocab"))
    )
    flagged = tok.join(F.broadcast(head), "t", "left")
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("in_vocab").isNull().cast("long")).alias("n_oov"),
        F.round(
            F.sum(F.col("in_vocab").isNull().cast("long")) / F.count("*"), 6
        ).alias("oov_rate"),
    )


BOILERPLATE_K = 5
BOILERPLATE_MIN_DOCS = 2


def boilerplate_shares(
    docs: DataFrame,
    k: int = BOILERPLATE_K,
    min_docs: int = BOILERPLATE_MIN_DOCS,
) -> DataFrame:
    """Per-document boilerplate share: the fraction of a document's
    DISTINCT word-k-grams that occur in >= ``min_docs`` documents
    corpus-wide — the template/navigation/footer screen (RefinedWeb /
    C4-style boilerplate removal reads exactly this signal before
    stripping or down-weighting).

    Scale shape: tokens and shingles are materialized in their own
    projections (the HOF-inlining pitfall), then exploded to
    ``(doc_id, xxhash64(shingle))`` so the shuffle carries 8-byte keys,
    never the k-gram strings; the document-frequency count
    partial-aggregates map-side on the hash; the frequent set (tiny by
    construction — only k-grams shared across docs survive) joins back
    on the hash, AQE broadcasting it when small. The DuckDB oracle
    counts on the raw shingle STRINGS — an independent mechanism, so a
    hash-collision or explode bug flips the value hash.

    ``explode_outer`` keeps <k-token documents as one null-shingle row
    (guarded so xxhash64 never hashes the null), giving them
    ``n_shingles = 0, share = 0.0`` to match the oracle's LEFT JOIN from
    ``documents``.
    """
    tok = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = tok.select("doc_id", shingles_from_tokens(F.col("t"), k).alias("ts"))
    # pairs feeds BOTH the doc-frequency aggregate and the join-back side.
    # Deliberately NO checkpoint barrier (unlike dedup.py's shingle frames):
    # no constraint-inference HOF re-substitution occurs here (plan
    # verified: split stays in its own projection), and recomputing the
    # codegen tokenize/shingle pass measures 40% cheaper than
    # materializing the exploded (doc, hash) frame (1.58 s vs 2.64 s at
    # sf0.1 — the explode is ~shingles-per-doc× the corpus row count).
    pairs = sh.select(
        "doc_id",
        F.size("ts").alias("n_shingles"),
        F.explode_outer("ts").alias("s"),
    ).select(
        "doc_id",
        "n_shingles",
        F.when(F.col("s").isNotNull(), F.xxhash64("s")).alias("h"),
    )
    freq = (
        pairs.where(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_docs)
        .select("h", F.lit(True).alias("is_bp"))
    )
    flagged = pairs.join(freq, "h", "left")
    agg = flagged.groupBy("doc_id").agg(
        F.first("n_shingles").cast("bigint").alias("n_shingles"),
        F.sum(F.coalesce(F.col("is_bp").cast("long"), F.lit(0))).alias(
            "n_boilerplate"
        ),
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_boilerplate",
        F.when(
            F.col("n_shingles") > 0,
            F.round(F.col("n_boilerplate") / F.col("n_shingles"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("boilerplate_share"),
    )


TEMP_SCALE_BITS = 9  # fixed-point digits for the cross-engine sqrt weight


def temperature_mixture(docs: DataFrame) -> DataFrame:
    """Temperature-scaled sampling weights per (source, lang) cell —
    the multilingual-rebalancing step (T=2, i.e. p^(1/2)) applied to the
    corpus mixture: low-resource slices are upsampled toward parity,
    ``temp_weight_i = sqrt(p_i) / sum_j sqrt(p_j)`` where ``p_i`` is the
    cell's exact token share.

    Cross-engine float discipline (the pitfall rule from FIXTURES.md):
    ``sqrt``/``/`` are IEEE correctly-rounded, so each cell's
    ``sqrt(n_tokens/total)`` is bit-identical in Spark and DuckDB — but a
    SUM of such doubles is order-dependent, so the normalizing sum is
    taken over ``floor(1e9 * sqrt(p_i))`` fixed-point BIGINTs (exact,
    associative), and only the final per-row division returns to double.

    Scale: one partial-aggregating shuffle to the (source, lang) grain;
    every window below it runs on the few-row aggregate, not the corpus.
    """
    agg = docs.groupBy("source", "lang").agg(
        F.sum(F.size(tokens(F.col("text")))).alias("n_tokens")
    )
    total = Window.partitionBy()
    p = F.col("n_tokens") / F.sum("n_tokens").over(total)
    fx = F.floor(F.sqrt(p) * F.lit(10**TEMP_SCALE_BITS)).cast("bigint")
    scaled = agg.select("source", "lang", "n_tokens", fx.alias("w_fx"))
    # UNROUNDED ratios feed the factor: both are single IEEE divisions of
    # exact BIGINT aggregates (bit-identical cross-engine), and a cell
    # whose 6-dp-rounded share would collapse to 0.0 (share < 5e-7) no
    # longer divides by zero. Rounding applies only to the outputs. A
    # genuinely empty cell (n_tokens = 0, possible only for all-empty-text
    # docs) is guarded to NULL on both engines rather than 0/0.
    share_raw = F.col("n_tokens") / F.sum("n_tokens").over(total)
    weight_raw = F.col("w_fx") / F.sum("w_fx").over(total)
    return scaled.select(
        "source",
        "lang",
        "n_tokens",
        F.round(share_raw, 6).alias("token_share"),
        F.round(weight_raw, 6).alias("temp_weight"),
        F.when(
            F.col("n_tokens") > 0, F.round(weight_raw / share_raw, 4)
        ).alias("upsample_factor"),
    )


RESAMPLE_BUCKETS = 1_000_000


def mixture_resample(docs: DataFrame) -> DataFrame:
    """Materialize the temperature mixture: per document, the number of
    copies a T=2-rebalanced training corpus takes — ``floor(r)`` plus one
    more for a deterministic ``frac(r)`` share of the cell's documents,
    where ``r`` is the cell's :func:`temperature_mixture` upsample factor
    (< 1 -> Bernoulli keep/drop, > 1 -> integer repeat + fractional top-up).

    Determinism discipline: the Bernoulli draw is ``md5(doc_id) %
    1e6 < frac(r) * 1e6`` — no ``rand()``, so re-runs and both engines
    agree row-for-row, and the decision is a pure function of the doc id
    (stable under incremental corpus growth, same property as
    ``dataset_split``).

    Scale: the mixture is a few-row aggregate -> broadcast join; the
    corpus never shuffles and never materializes copies (downstream
    repeats read ``n_copies``, so a 10x-upsampled cell costs metadata,
    not storage).
    """
    # null-safe equi-join: temperature_mixture's groupBy KEEPS a NULL
    # (source, lang) cell, so a plain equi-join would silently drop those
    # docs from the resample plan. eqNullSafe (<=>) matches the NULL cell
    # back to its docs; the oracle mirrors with IS NOT DISTINCT FROM. The
    # mixture side's keys are renamed first — rates derives from docs, so
    # unrenamed refs would resolve to the same lineage (trivially-true
    # predicate, cartesian blowup).
    rates = temperature_mixture(docs).select(
        F.col("source").alias("m_source"),
        F.col("lang").alias("m_lang"),
        "upsample_factor",
    )
    bucket = md5_hash60(F.col("doc_id").cast("string")) % RESAMPLE_BUCKETS
    base = F.floor("upsample_factor")
    frac = F.col("upsample_factor") - base
    extra = (bucket < frac * RESAMPLE_BUCKETS).cast("int")
    joined = docs.join(
        F.broadcast(rates),
        F.col("source").eqNullSafe(F.col("m_source"))
        & F.col("lang").eqNullSafe(F.col("m_lang")),
    )
    return joined.select(
        "doc_id",
        "source",
        "lang",
        (base.cast("int") + extra).alias("n_copies"),
    )


LM_BIGRAM_ADD_K = 1  # add-one (Laplace) smoothing; integer so the
#                      smoothed ratio is an exact rational on both engines


def lm_bigram_scores(docs: DataFrame) -> DataFrame:
    """Bigram-LM fluency signal (the CCNet/KenLM recipe one order up from
    :func:`lm_unigram_scores`): each document's mean negative log
    probability of its token bigrams under an add-one-smoothed bigram
    model trained on the corpus itself —
    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with ``c(w1)`` the corpus
    unigram count and ``V`` the vocabulary size. Word-salad and shuffled
    boilerplate score high (their bigrams are corpus-rare even when every
    unigram is common) — exactly the signal a unigram model cannot see.
    Documents with fewer than 2 tokens have no bigrams and are excluded.

    Output: ``(doc_id, n_bigrams, mean_neg_logp)``; perplexity is
    ``exp(mean_neg_logp)``, left to the caller (exp stacks ULP noise onto
    a cross-engine-compared value for no extra information).

    Scale shape: bigrams are built ROW-LOCALLY (``zip_with`` over two
    slices of the token array — no self-join, no window over positions);
    the bigram-count model is a (w1,w2)-keyed partial agg, vocab²-bounded
    in theory but Zipf-sparse in practice; the scoring join shuffles on
    the bigram key. At 10^12 tokens broadcast the model's top-B head and
    fold the tail into the smoothing term, as for the unigram model.
    Cross-engine determinism: counts and V are exact integers, so the
    ``-ln`` argument is bit-identical; per-bigram -ln summed in
    DECIMAL(28,10) (partition-order-free), divided and rounded as DOUBLE.
    """
    t = tokens(F.col("text"))
    bi = (
        docs.where(F.size(t) >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    uni = docs.select(F.explode(tokens(F.col("text"))).alias("w1")).groupBy(
        "w1"
    ).agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count("*").alias("v"))
    # reduce to per-doc DISTINCT bigrams before the model join (map-side
    # partial agg): the join probe shrinks by the within-doc repetition
    # factor, and summing n·nlp is exactly the instance-level decimal sum
    dbi = bi.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n"))
    bfreq = dbi.groupBy("w1", "w2").agg(F.sum("n").alias("c12"))
    nlp = -F.log(
        (F.col("c12") + F.lit(LM_BIGRAM_ADD_K))
        / (F.col("c1") + F.lit(LM_BIGRAM_ADD_K) * F.col("v"))
    )
    scored = (
        dbi.join(bfreq, ["w1", "w2"])
        .join(uni, "w1")
        .join(F.broadcast(vocab))
        .select(
            "doc_id",
            "n",
            # decimal(18,10) x decimal(12,0) -> decimal(31,10): inside the
            # 38-digit cap, so the product keeps scale 10 EXACTLY (a plain
            # decimal(28,10) x bigint would exceed 38 digits and trip
            # Spark's allowPrecisionLoss scale-trim, shifting 6-dp rounds).
            # Bounds: -ln(p) < ln(c1 + V) < 44 fits 8 integer digits;
            # n < 10^12 (per-doc repeats of ONE bigram) fits 12.
            (
                nlp.cast("decimal(18,10)")
                * F.col("n").cast("decimal(12,0)")
            ).alias("nlp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n").alias("n_bigrams"),
        F.round(
            F.sum("nlp").cast("double") / F.sum("n"), 6
        ).alias("mean_neg_logp"),
    )


VOCAB_GROWTH_SHARDS = 8


def vocab_growth(docs: DataFrame, n_shards: int = VOCAB_GROWTH_SHARDS) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct-term count
    as a function of cumulative tokens across a deterministic sharding of
    the corpus — the statistic a tokenizer-training run reads to size its
    vocabulary ("does vocab growth flatten by shard s?") and a drift
    monitor reads across crawl snapshots.

    Shard assignment is ``md5_hash60(doc_id) % n_shards`` (the
    :func:`~.datapipe.corpus_shards` policy — a seeded permutation, so
    the curve is a reproducible random accumulation order, not crawl
    order). A term's first appearance is ``min(shard_id)`` over its
    occurrences; the cumulative vocabulary at shard ``s`` is then the
    count of terms with ``first_shard <= s`` — all integer-exact.

    Output: one row per non-empty shard — ``(shard_id, n_docs, n_tokens,
    new_terms, cum_tokens, cum_vocab)``.

    Scale shape (100 TB): the heavy agg shuffles (term) keys once —
    vocab-sized, partial-agged map-side; per-shard totals are
    ``n_shards`` cells (the distinct-doc count expands to (shard, doc)
    partials, still far below token volume). The cumulative window runs
    over ``n_shards`` rows — driver-trivial, single partition by design.
    """
    h = md5_hash60(F.col("doc_id").cast("string"))
    tok = docs.select(
        (h % n_shards).cast("int").alias("shard_id"),
        "doc_id",
        F.explode(tokens(F.col("text"))).alias("t"),
    )
    per_shard = tok.groupBy("shard_id").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_tokens"),
    )
    new_terms = (
        tok.groupBy("t")
        .agg(F.min("shard_id").alias("shard_id"))
        .groupBy("shard_id")
        .agg(F.count("*").cast("bigint").alias("new_terms"))
    )
    cum = Window.orderBy("shard_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_shard.join(new_terms, "shard_id", "left")
        .select(
            "shard_id",
            "n_docs",
            "n_tokens",
            F.coalesce("new_terms", F.lit(0)).cast("bigint").alias("new_terms"),
        )
        .select(
            "shard_id",
            "n_docs",
            "n_tokens",
            "new_terms",
            F.sum("n_tokens").over(cum).cast("bigint").alias("cum_tokens"),
            F.sum("new_terms").over(cum).cast("bigint").alias("cum_vocab"),
        )
    )


WINNOW_K = 3  # words per k-gram
WINNOW_W = 4  # consecutive hashes per winnowing window
_WINNOW_POS_BASE = 1 << 20  # supports documents up to ~10^6 k-grams


def winnowing_selections(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Robust winnowing fingerprint selection (Schleimer, Wilkerson,
    Aiken, SIGMOD 2003 §4): hash every POSITIONAL word ``k``-gram, slide
    a window of ``w`` consecutive hashes, and in each window select the
    minimum hash, rightmost occurrence on ties. The distinct selected
    (position, hash) pairs are the document's fingerprint — the
    guarantee-bearing sparse sketch (any shared substring of length
    ``k + w - 1`` words produces at least one shared fingerprint) that
    MOSS-style overlap detection and span-level contamination audits are
    built on; :func:`fingerprints`' bottom-n sketch has no such locality
    guarantee.

    Mechanics (identical on both engines, all integer-exact): each
    (hash, position) is packed into one DECIMAL(38,0) key ``h * 2^20 +
    (2^20 - pos)`` so that MIN(key) over the window is "min hash, then
    RIGHTMOST position" in a single rolling aggregate; the selected pair
    is unpacked with exact integer ``div``/``%``. Documents shorter than
    ``k`` words have no k-gram and yield no rows (mirrored by the
    oracle's length predicate); documents with ``m < w`` hashes form one
    whole-document window (the last row's rolling min covers all ``m``).
    Positions are capped by the 2^20 pack base — 10^6 k-grams ≈ a 5 MB
    document at 5 bytes/word; raise the base for longer inputs.

    Output: ``(doc_id, sel_pos, fp_hash)`` — 1-based gram position,
    selected 60-bit hash; expected density 2/(w+1) of positions.

    Scale shape (100 TB): fully doc-local — tokenize, build grams with
    one array HOF pass, and run the rolling MIN inside a doc-partitioned
    window; the only shuffle carries (doc_id, pos, key) scalar rows. At
    10^12 turns the window sort is per-document (bounded by doc length),
    and the DISTINCT collapses w-fold duplicate selections before any
    downstream join touches them.
    """
    if not (k >= 1 and w >= 1):
        raise ValueError(f"need k >= 1 and w >= 1, got k={k} w={w}")
    tok = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (k - 1)),
        lambda i: F.array_join(F.slice("toks", i, k), " "),
    )
    ph = (
        tok.where(F.size("toks") >= k)
        .select("doc_id", F.posexplode(grams).alias("pos0", "gram"))
        .select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            md5_hash60(F.col("gram")).alias("h"),
        )
    )
    base = _WINNOW_POS_BASE
    key = (
        F.col("h").cast("decimal(38,0)") * F.lit(base)
        + (F.lit(base) - F.col("pos"))
    ).alias("key")
    roll = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-(w - 1), 0)
    whole = Window.partitionBy("doc_id")
    rolled = ph.select("doc_id", "pos", key).select(
        "doc_id",
        "pos",
        F.min("key").over(roll).alias("kmin"),
        F.max("pos").over(whole).alias("m"),
    )
    return (
        rolled.where((F.col("pos") >= w) | (F.col("pos") == F.col("m")))
        .select(
            "doc_id",
            (F.lit(base) - F.expr(f"CAST(kmin % {base} AS INT)")).alias(
                "sel_pos"
            ),
            F.expr(f"kmin div {base}").alias("fp_hash"),
        )
        .distinct()
    )


WINNOW_OVERLAP_MIN = 2


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_OVERLAP_MIN,
) -> DataFrame:
    """MOSS-style overlap detection composed from
    :func:`winnowing_selections`: doc pairs sharing >= ``min_shared``
    winnowed fingerprint HASHES, with the shared count and each side's
    fingerprint count — the plagiarism/near-copy report the winnowing
    guarantee powers (any shared substring of ``k + w - 1`` words forces
    at least one shared fingerprint, so overlapping docs CANNOT be
    missed, unlike probabilistic MinHash blocking).

    Matching is on distinct hashes per doc (positions dropped first —
    a hash repeated within one doc counts once), so ``n_shared`` is the
    intersection size of the two fingerprint sets, comparable across doc
    lengths via the per-side totals.

    Output: ``(id_a, id_b, n_shared, n_fp_a, n_fp_b)`` with
    ``id_a < id_b``.

    Scale shape (100 TB): the sparse-sketch equi-join — fingerprints are
    a 2/(w+1) sample of gram positions, and the join key is the 60-bit
    hash, so cost is sum over fingerprint values of (docs sharing it)²,
    the same subquadratic bound as the shingle join in
    :func:`~.dedup.ngram_jaccard_pairs` but over the winnowed sample
    instead of every gram. A template fingerprint shared by millions of
    docs needs the stop-shingle guard (``max_shingle_freq``) if corpus
    profiling shows such heads; none exists in the synthetic corpus, so
    the guard stays in the dedup operator where it's tested.
    """
    fp = (
        winnowing_selections(docs, k=k, w=w)
        .select("doc_id", "fp_hash")
        .distinct()
    )
    sizes = fp.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = fp.select(F.col("doc_id").alias("id_a"), "fp_hash")
    b = fp.select(F.col("doc_id").alias("id_b"), "fp_hash")
    shared = (
        a.join(b, "fp_hash")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_fp", "n_fp_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b"), "id_b")
        .withColumnRenamed("n_fp", "n_fp_b")
        .select("id_a", "id_b", "n_shared", "n_fp_a", "n_fp_b")
    )


QUALITY_CORR_SIGNALS = [
    "alpha_ratio",
    "mean_token_len",
    "n_tokens",
    "stopword_ratio",
]


def signal_correlations(docs: DataFrame) -> DataFrame:
    """Signal-redundancy audit: pairwise Pearson correlation between the
    per-doc quality signals (the :func:`quality_exprs` family) — the
    check a curation pipeline runs before stacking filters ("is
    alpha_ratio just stopword_ratio in disguise on this corpus?") and a
    drift monitor runs across crawl snapshots.

    Cross-engine float contract: each 6-dp signal is lifted to exact
    64-bit fixed point (``round(x * 1e6)`` as BIGINT), ALL moment sums
    (Σx, Σx², Σxy) run in DECIMAL — partition-order-free and exact — and
    only the final scale-invariant combination

        r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))

    is computed in DOUBLE and rounded (Pearson is invariant under the
    1e6 affine lift, so the fixed-point detour changes nothing). A pair
    with zero variance on either side yields NULL. Rows where either
    signal is NULL (empty-text alpha_ratio) are excluded per pair —
    DuckDB's complete-case convention.

    Output: one row per unordered signal pair — ``(sig_a, sig_b, n_ab,
    corr)``, ``sig_a < sig_b`` alphabetically.

    Scale shape (100 TB): ONE row-local scan + ONE global partial
    aggregate (every Σ map-side combines; the result frame is S² cells)
    — zero joins, zero per-doc shuffle; the pair explosion happens on
    the 1-row aggregate. The DECIMAL(38) moments hold to ~10^11 docs of
    10^9-scaled signals; beyond that, center the signals first (shift
    invariance) or bump to per-partition compensated sums.
    """
    q = quality_exprs(tokens(F.col("text")))
    fixed = docs.select(
        *[
            F.round(q[s].cast("double") * 1e6)
            .cast("bigint")
            .alias(s)
            for s in QUALITY_CORR_SIGNALS
        ]
    )
    pairs = [
        (a, b)
        for i, a in enumerate(QUALITY_CORR_SIGNALS)
        for b in QUALITY_CORR_SIGNALS[i + 1 :]
    ]
    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        p = f"{a}__{b}"
        dec = "decimal(38,0)"
        aggs += [
            F.count(F.when(both, 1)).alias(f"{p}__n"),
            F.sum(F.when(both, F.col(a)).cast(dec)).alias(f"{p}__sx"),
            F.sum(F.when(both, F.col(b)).cast(dec)).alias(f"{p}__sy"),
            F.sum(
                F.when(both, F.col(a).cast("decimal(19,0)") * F.col(b))
            ).alias(f"{p}__sxy"),
            F.sum(
                F.when(both, F.col(a).cast("decimal(19,0)") * F.col(a))
            ).alias(f"{p}__sxx"),
            F.sum(
                F.when(both, F.col(b).cast("decimal(19,0)") * F.col(b))
            ).alias(f"{p}__syy"),
        ]
    wide = fixed.agg(*aggs)
    structs = []
    for a, b in pairs:
        p = f"{a}__{b}"
        n = F.col(f"{p}__n").cast("decimal(38,0)")
        num = (n * F.col(f"{p}__sxy") - F.col(f"{p}__sx") * F.col(f"{p}__sy")).cast("double")
        denx = (n * F.col(f"{p}__sxx") - F.col(f"{p}__sx") * F.col(f"{p}__sx")).cast("double")
        deny = (n * F.col(f"{p}__syy") - F.col(f"{p}__sy") * F.col(f"{p}__sy")).cast("double")
        corr = F.when(
            (denx > 0) & (deny > 0),
            F.round(num / F.sqrt(denx * deny), 6) + F.lit(0.0),
        )
        structs.append(
            F.struct(
                F.lit(a).alias("sig_a"),
                F.lit(b).alias("sig_b"),
                F.col(f"{p}__n").cast("bigint").alias("n_ab"),
                corr.alias("corr"),
            )
        )
    return wide.select(
        F.explode(F.array(*structs)).alias("s")
    ).select("s.sig_a", "s.sig_b", "s.n_ab", "s.corr")


ZIPF_TOP_K = 64


def zipf_fit(docs: DataFrame, top_k: int = ZIPF_TOP_K) -> DataFrame:
    """Zipf-law fit over the corpus vocabulary: least-squares slope of
    ln(frequency) against ln(rank) for the ``top_k`` most frequent terms
    — the corpus-health statistic behind "is this crawl natural language
    or template spam?" (natural corpora fit slope ≈ −1; boilerplate
    floods flatten the head) and a tokenizer-sizing companion to
    :func:`vocab_growth`.

    Rank is deterministic: count DESC, term ASC (ties at the ``top_k``
    cutoff resolve identically on both engines). The regression reuses
    the :func:`signal_correlations` exactness contract: ln values lifted
    to 1e12 fixed point, moment sums in DECIMAL (order-free), the
    scale-invariant slope / r² and the back-scaled intercept computed in
    DOUBLE at the end, 6-dp rounded.

    Output: ONE row — ``(n_terms, zipf_slope, zipf_intercept, r2)``;
    NULL fit when fewer than 2 distinct ranks survive.

    Scale shape (100 TB): vocab frequency agg (token-keyed, map-side
    partial) → ``orderBy(...).limit(top_k)`` = TakeOrdered distributed
    top-k (no global sort) → every later stage runs on the ≤top_k-row
    frame (single-partition window + one tiny agg by construction).
    """
    freq = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    head = freq.orderBy(F.col("c").desc(), "t").limit(top_k)
    w = Window.orderBy(F.col("c").desc(), "t")
    lifted = head.select(
        F.round(F.log(F.row_number().over(w).cast("double")) * 1e12)
        .cast("decimal(28,0)")
        .alias("x"),
        F.round(F.log(F.col("c").cast("double")) * 1e12)
        .cast("decimal(28,0)")
        .alias("y"),
    )
    mom = lifted.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope = num / denx
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / (F.col("n").cast("double") * 1e12)
    r2 = F.when(deny > 0, F.round((num * num) / (denx * deny), 6))
    return mom.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.when(denx > 0, F.round(slope, 6) + F.lit(0.0)).alias("zipf_slope"),
        F.when(denx > 0, F.round(intercept, 6) + F.lit(0.0)).alias(
            "zipf_intercept"
        ),
        F.when(denx > 0, r2).alias("r2"),
    )
