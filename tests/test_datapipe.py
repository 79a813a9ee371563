"""Unit tests for operators.datapipe (training-data pipeline stages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_system_spark.operators import datapipe as dp

from .conftest import make_transcripts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ----------------------------------------------------------- pii_redaction
def test_pii_redaction_counts_and_replacement(spark):
    tr = make_transcripts(
        spark,
        [
            (
                "c0",
                0,
                "user",
                "mail alice@example.com from 10.0.0.1 key deadbeefdeadbeef1234",
                None,
                "2024-01-01 00:00:00",
            ),
            ("c0", 1, "assistant", "no pii here", None, "2024-01-01 00:00:01"),
        ],
    )
    rows = {r["turn_idx"]: r for r in dp.pii_redaction(tr).collect()}
    r0 = rows[0]
    assert (r0["n_email"], r0["n_ip"], r0["n_secret"]) == (1, 1, 1)
    assert r0["redacted"] == "mail <EMAIL> from <IP> key <SECRET>"
    r1 = rows[1]
    assert (r1["n_email"], r1["n_ip"], r1["n_secret"]) == (0, 0, 0)
    assert r1["redacted"] == "no pii here"


def test_pii_redaction_order_email_before_ip(spark):
    # the numeric-domain email is consumed by the email pass first; the
    # free-standing IP is still caught by the IP pass
    tr = make_transcripts(
        spark,
        [("c0", 0, "user", "x@1.2.3.four and 5.6.7.8", None, "2024-01-01 00:00:00")],
    )
    row = dp.pii_redaction(tr).collect()[0]
    assert row["redacted"] == "<EMAIL> and <IP>"
    assert (row["n_email"], row["n_ip"]) == (1, 1)


# -------------------------------------------------------- repetition_stats
def test_repetition_stats_hand_computed(spark):
    docs = _docs(spark, ["a a a b", "w x y z"])
    rows = {r["doc_id"]: r for r in dp.repetition_stats(docs).collect()}
    # bigrams of doc0: [a a, a a, a b] -> distinct 2 of 3
    assert rows[0]["n_tokens"] == 4
    assert rows[0]["dup_bigram_ratio"] == round(1 - 2 / 3, 6)
    assert rows[0]["top_token_share"] == 0.75
    # all-distinct doc: no duplicate bigrams, uniform tokens
    assert rows[1]["dup_bigram_ratio"] == 0.0
    assert rows[1]["top_token_share"] == 0.25


def test_repetition_stats_single_token_doc(spark):
    rows = dp.repetition_stats(_docs(spark, ["solo"])).collect()
    assert rows[0]["n_tokens"] == 1
    assert rows[0]["dup_bigram_ratio"] == 0.0
    assert rows[0]["top_token_share"] == 1.0


# ----------------------------------------------------------- sequence_pack
def test_sequence_pack_offsets_contiguous(spark):
    # token counts: 3, 2, 4 -> spans [0,3) [3,5) [5,9)
    docs = _docs(spark, ["a b c", "d e", "f g h i"])
    rows = sorted(
        dp.sequence_pack(docs, seq_len=4).collect(), key=lambda r: r["doc_id"]
    )
    assert [(r["start_offset"], r["end_offset"]) for r in rows] == [
        (0, 3),
        (3, 5),
        (5, 9),
    ]
    assert [(r["seq_first"], r["seq_last"]) for r in rows] == [
        (0, 0),
        (0, 1),  # tokens 3,4: spans the seq_len=4 boundary
        (1, 2),
    ]


def test_sequence_pack_invariant_to_partitioning(spark):
    docs = _docs(spark, [f"tok{i} " * (i % 7 + 1) for i in range(40)])
    a = sorted(
        dp.sequence_pack(docs, seq_len=16, num_parts=1).collect(),
        key=lambda r: r["doc_id"],
    )
    b = sorted(
        dp.sequence_pack(docs, seq_len=16, num_parts=5).collect(),
        key=lambda r: r["doc_id"],
    )
    assert a == b
    # global contiguity: each start equals the previous end
    for prev, cur in zip(a, a[1:]):
        assert cur["start_offset"] == prev["end_offset"]


# ------------------------------------------------------ embedding_centroids
def test_embedding_centroids_exact_means(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 2.0], 7),
            (1, [3.0, 6.0], 7),
            (2, [10.0, 0.0], 8),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {(r["label"], r["dim"]): r for r in dp.embedding_centroids(emb).collect()}
    assert rows[(7, 0)]["centroid"] == 2.0
    assert rows[(7, 1)]["centroid"] == 4.0
    assert rows[(7, 0)]["n_vecs"] == 2
    assert rows[(8, 0)]["centroid"] == 10.0
    assert len(rows) == 4


# ----------------------------------------------------------- corpus_filter
def test_corpus_filter_reasons(spark):
    good = ("the quick brown fox jumps over a lazy dog and then runs far away "
            "to the hills again today")  # 18 tokens -> pad to >= 20
    good = good + " more words"
    docs = _docs(spark, [good, good, "tiny doc"])
    rows = {r["doc_id"]: r for r in dp.corpus_filter(docs).collect()}
    assert rows[0]["kept"] is True and rows[0]["reason"] is None
    assert rows[1]["kept"] is False and rows[1]["reason"] == "duplicate"
    assert rows[2]["kept"] is False and rows[2]["reason"] == "low_quality"


# ------------------------------------------------------- stratified_sample
def test_stratified_sample_deterministic_and_stable_under_growth(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}", "en" if i % 2 else "de", "s0") for i in range(200)],
        "doc_id long, text string, lang string, source string",
    )
    a = {r["doc_id"] for r in dp.stratified_sample(docs).collect()}
    b = {r["doc_id"] for r in dp.stratified_sample(docs).collect()}
    assert a == b and a
    # incremental growth never flips an existing doc's keep decision
    grown = spark.createDataFrame(
        [(i, f"d{i}", "en" if i % 2 else "de", "s0") for i in range(400)],
        "doc_id long, text string, lang string, source string",
    )
    g = {r["doc_id"] for r in dp.stratified_sample(grown).collect()}
    assert {d for d in g if d < 200} == a
    # per-stratum rates actually differ (en downsampled below de)
    rows = dp.stratified_sample(grown).groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in rows}
    assert by_lang.get("de", 0) > by_lang.get("en", 0)


# --------------------------------------------------------- props_key_stats
def test_props_key_stats_handles_malformed_json(spark):
    from log_analysis_system_spark.operators.relational import props_key_stats

    events = spark.createDataFrame(
        [
            (1, "click", '{"k": 5}'),
            (2, "click", "not json"),
            (3, "click", None),
            (4, "view", '{"k": 7}'),
        ],
        "event_id long, event_type string, props string",
    )
    rows = {r["event_type"]: r for r in props_key_stats(events).collect()}
    assert rows["click"]["n"] == 3 and rows["click"]["n_with_k"] == 1
    assert rows["click"]["sum_k"] == 5
    assert rows["view"]["sum_k"] == 7


def test_corpus_filter_no_collect_list_in_plan(spark):
    docs = _docs(spark, ["a b c d"])
    plan = dp.corpus_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan


# ------------------------------------------- embedding_centroid_distance
def test_embedding_centroid_distance_known_geometry(spark):
    # label 7: centroid of (1,0) and (0,1) is (0.5,0.5); both vecs at 45deg
    # -> cos = 0.707107. label 8: single vec == its centroid -> cos = 1.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 7),
            (1, [0.0, 1.0], 7),
            (2, [3.0, 4.0], 8),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["vec_id"]: r for r in dp.embedding_centroid_distance(emb).collect()}
    assert rows[0]["cos_centroid"] == rows[1]["cos_centroid"] == 0.707107
    assert rows[2]["cos_centroid"] == 1.0


def test_embedding_centroid_distance_no_corpus_collect(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(50)],
        "vec_id long, embedding array<float>, label int",
    )
    plan = (
        dp.embedding_centroid_distance(emb)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # centroid assembly may collect_list over DIMENSIONS; the corpus join
    # side must be a broadcast of the tiny centroid frame
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ----------------------------------------------------------- vocab_top_terms
def test_vocab_top_terms_coverage_monotone_and_exact(spark):
    from log_analysis_system_spark.operators.textstats import vocab_top_terms

    docs = _docs(spark, ["a a a b b c", "a b d", "a e"])
    rows = vocab_top_terms(docs, k=3).collect()
    assert [r["term"] for r in rows] == ["a", "b", "c"]  # ties break on term
    assert [r["n_occurrences"] for r in rows] == [5, 3, 1]
    assert rows[0]["doc_freq"] == 3
    total = 11
    assert rows[0]["share"] == round(5 / total, 6)
    assert rows[1]["cum_coverage"] == round(8 / total, 6)
    cum = [r["cum_coverage"] for r in rows]
    assert cum == sorted(cum)


def test_embedding_quantization_endpoints_exact(spark):
    """Values AT the per-dim min/max quantize to levels 0/255 and
    reconstruct exactly -> zero error."""
    from log_analysis_system_spark.operators import datapipe as dp

    emb = spark.createDataFrame(
        [(0, [0.0, 1.0], 0), (1, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r["vec_id"]: r for r in dp.embedding_quantization(emb).collect()}
    assert rows[0]["mse"] == 0.0 and rows[0]["max_abs_err"] == 0.0
    assert rows[1]["mse"] == 0.0 and rows[1]["max_abs_err"] == 0.0


def test_embedding_quantization_error_bound_on_testdata(spark):
    """Reconstruction error obeys the analytic SQ bound: per-vector
    max_abs_err <= max_dim (hi-lo) / (2 * 255)."""
    import numpy as np
    from log_analysis_system_spark.operators import datapipe as dp

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array([r["embedding"] for r in emb.select("embedding").collect()],
                    dtype=np.float64)
    bound = float((vecs.max(axis=0) - vecs.min(axis=0)).max()) / (2 * 255)
    rows = dp.embedding_quantization(emb).collect()
    assert len(rows) == vecs.shape[0]
    assert all(0.0 <= r["mse"] <= bound * bound * 1.000001 for r in rows)
    assert all(r["max_abs_err"] <= bound * 1.000001 for r in rows)


# ------------------------------------------------------------ snapshot_diff
def test_snapshot_diff_classifications(spark):
    docs = spark.createDataFrame(
        [
            (1, "stay"),        # both snapshots, untouched -> absent
            (5, "dropped"),     # new drops %5 -> removed
            (7, "late"),        # old drops %7 -> added
            (11, "edited"),     # %11 -> text reversed in new -> changed
            (22, "aibohphobia"[:0] + "abba"),  # %11 but palindrome -> absent
            (35, "gone-both"),  # %5 and %7: in neither diff side ambiguity:
                                # old has it (35%7==0 -> dropped), new drops
                                # it too -> absent entirely
        ],
        "doc_id long, text string",
    )
    old, new = dp.snapshot_versions(docs)
    got = {r["doc_id"]: r["status"] for r in dp.snapshot_diff(old, new).collect()}
    assert got == {5: "removed", 7: "added", 11: "changed"}


def test_snapshot_diff_hash_only_shuffle(spark):
    """Document text must not cross the shuffle: each full-outer-join side
    reduces to a (doc_id, md5) projection BELOW its Exchange."""
    import re as _re

    docs = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    old, new = dp.snapshot_versions(docs)
    plan = dp.snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    hash_below_exchange = _re.findall(
        r"Exchange hashpartitioning\(doc_id#\d+L.*\n\s*(?::\s*)?\+- Project \[doc_id#\d+L, md5",
        plan,
    )
    assert len(hash_below_exchange) == 2, plan


# ------------------------------------------------------------ chunk_documents
def test_chunk_documents_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in dp.chunk_documents(docs, chunk_size=4, stride=3).collect()
    }
    # doc 1: 7 tokens, starts capped at 7-(4-3)=6 -> starts 1,4 only.
    # A third chunk at start 7 ("g") would be fully contained in chunk 1
    # ("d e f g") — the trailing-duplicate case the cap removes.
    assert out[(1, 0)]["chunk_text"] == "a b c d"
    assert out[(1, 1)]["chunk_text"] == "d e f g"
    assert out[(1, 1)]["n_chunk_tokens"] == 4
    assert (1, 2) not in out
    # single-token and empty docs each emit exactly one chunk
    assert out[(2, 0)]["chunk_text"] == "x"
    assert out[(3, 0)]["chunk_text"] == ""
    assert len(out) == 4


def test_chunk_documents_reconstructs_text_at_full_stride(spark):
    """stride == chunk_size (no overlap): re-joining a doc's chunks in
    chunk_idx order must reproduce the original text exactly."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(1 + (i * 7) % 23)))
         for i in range(40)],
        "doc_id long, text string",
    )
    chunks = dp.chunk_documents(docs, chunk_size=5, stride=5)
    # order inside the aggregate (array_sort on (chunk_idx, text) structs):
    # collect_list after an orderBy is NOT order-stable across a shuffle
    rebuilt = chunks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
            " ",
        ).alias("rebuilt")
    )
    j = docs.join(rebuilt, "doc_id")
    assert j.where(F.col("text") != F.col("rebuilt")).count() == 0


def test_chunk_documents_cover_exactly_once_at_end(spark):
    """Property sweep over (n_tokens, chunk_size, stride): chunks cover
    every token (the last chunk reaches the doc end), starts advance by
    exactly stride, and AT MOST ONE chunk reaches the end — no chunk is
    fully contained in its predecessor (the round-3 advice fix)."""
    cases = [
        (n, cs, st)
        for n in (1, 2, 3, 5, 7, 10, 16, 17, 23)
        for cs, st in ((4, 3), (4, 1), (5, 5), (8, 2), (3, 2), (6, 4))
    ]
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(n)))
            for i, (n, _, _) in enumerate(cases)
        ],
        "doc_id long, text string",
    )
    for (cs, st) in sorted({(cs, st) for _, cs, st in cases}):
        rows = dp.chunk_documents(docs, chunk_size=cs, stride=st).collect()
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, (n, _, _) in enumerate(cases):
            chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
            assert chunks[0]["chunk_idx"] == 0
            assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
            # coverage: starts are 1 + idx*stride; the last chunk reaches n
            last_start = 1 + chunks[-1]["chunk_idx"] * st
            assert last_start + chunks[-1]["n_chunk_tokens"] - 1 == n, (
                n, cs, st, chunks,
            )
            # at most one chunk reaches the end
            reaching = [
                c for c in chunks
                if (1 + c["chunk_idx"] * st) + cs - 1 >= n
            ]
            assert len(reaching) <= 1, (n, cs, st, chunks)
            # all non-final chunks are full-size
            assert all(
                c["n_chunk_tokens"] == cs for c in chunks[:-1]
            ), (n, cs, st, chunks)


def test_chunk_documents_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dp.chunk_documents(docs, chunk_size=4, stride=5)
    with _pytest.raises(ValueError):
        dp.chunk_documents(docs, chunk_size=4, stride=0)
