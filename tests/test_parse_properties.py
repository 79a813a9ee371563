"""Property-based parser tests (hypothesis): for arbitrary generated log
lines — valid in any of the four formats, or garbage — the two parse
engines agree field-for-field, and valid lines round-trip their source
fields exactly.

Strategy note: hypothesis drives the LINE CONTENT; Spark calls are batched
once per test (not per example) by collecting the generated corpus first.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from log_analysis_system_spark.functions.parse import PARSED_FIELDS, parse_transcripts

IP = st.tuples(*[st.integers(0, 255)] * 4).map(lambda t: ".".join(map(str, t)))
METHOD = st.sampled_from(["GET", "POST", "PUT", "DELETE", "HEAD"])
ENDPOINT = st.from_regex(r"/[a-z0-9/_.-]{0,30}", fullmatch=True)
STATUS = st.integers(100, 599)
NBYTES = st.one_of(st.integers(0, 10**9).map(str), st.just("-"))
TS = st.tuples(
    st.integers(1, 28), st.sampled_from(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]),
    st.integers(1990, 2030), st.integers(0, 23), st.integers(0, 59),
    st.integers(0, 59),
).map(lambda t: f"{t[0]:02d}/{t[1]}/{t[2]}:{t[3]:02d}:{t[4]:02d}:{t[5]:02d} -0700")
QUOTED = st.text(
    alphabet=st.characters(
        codec="ascii", exclude_characters='"\n\r', min_codepoint=32
    ),
    max_size=20,
)
RT = st.floats(0, 100, allow_nan=False).map(lambda f: f"{f:.3f}")

line_common = st.tuples(IP, TS, METHOD, ENDPOINT, STATUS, NBYTES).map(
    lambda t: f'{t[0]} - - [{t[1]}] "{t[2]} {t[3]} HTTP/1.1" {t[4]} {t[5]}'
)
line_combined = st.tuples(line_common, QUOTED, QUOTED).map(
    lambda t: f'{t[0]} "{t[1]}" "{t[2]}"'
)
line_ct = st.tuples(line_combined, RT).map(lambda t: f"{t[0]} {t[1]}")
# unfiltered: if random text happens to match a format, both engines must
# still agree on it — that's the property, not a nuisance
garbage = st.text(max_size=60)

ANY_LINE = st.one_of(line_common, line_combined, line_ct, garbage)


def _rows(spark, lines):
    df = spark.createDataFrame(
        [("c", i, "user", ln, None, None) for i, ln in enumerate(lines)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = {}
    for engine in ("sql", "pandas"):
        parsed = parse_transcripts(df, engine=engine)
        out[engine] = {
            r["turn_idx"]: tuple(r[f] for f in PARSED_FIELDS)
            for r in parsed.collect()
        }
    return out


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


@settings(max_examples=12, deadline=None)
@given(st.lists(ANY_LINE, min_size=1, max_size=30))
def test_engines_agree_on_arbitrary_lines(spark, lines):
    rows = _rows(spark, lines)
    for i in rows["sql"]:
        sql_row, pd_row = rows["sql"][i], rows["pandas"][i]
        assert all(_eq(a, b) for a, b in zip(sql_row, pd_row)), (
            f"engine mismatch on line {lines[i]!r}:\n"
            f"  sql    = {sql_row}\n  pandas = {pd_row}"
        )


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(IP, TS, METHOD, ENDPOINT, STATUS, NBYTES),
                min_size=1, max_size=20))
def test_common_fields_round_trip(spark, specs):
    lines = [
        f'{ip} - - [{ts}] "{m} {ep} HTTP/1.1" {status} {nb}'
        for ip, ts, m, ep, status, nb in specs
    ]
    df = spark.createDataFrame(
        [("c", i, "user", ln, None, None) for i, ln in enumerate(lines)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        r["turn_idx"]: r
        for r in parse_transcripts(df, engine="pandas").collect()
    }
    for i, (ip, ts, m, ep, status, nb) in enumerate(specs):
        r = got[i]
        assert r["log_format"] == "common" and r["log_type"] == "access"
        assert r["ip_address"] == ip
        assert r["method"] == m and r["endpoint"] == ep
        assert r["status"] == status
        assert r["bytes_sent"] == (0 if nb == "-" else int(nb))
        assert r["response_time"] == 0.0  # absent -> 0.0, not NULL
        assert r["ts_parsed"] is not None  # tz token dropped, still parses


# ---------------------------------------------------------- PII properties
PII_TEXT = st.one_of(
    st.text(max_size=80),
    st.tuples(IP, st.text(max_size=20), IP).map(lambda t: f"{t[1]} {t[0]} x {t[2]}"),
    st.tuples(st.from_regex(r"[a-z]{1,8}@[a-z]{1,8}\.[a-z]{2,4}", fullmatch=True),
              st.text(max_size=20)).map(lambda t: f"{t[1]} {t[0]}"),
)


@given(st.lists(PII_TEXT, min_size=1, max_size=40))
@settings(max_examples=15, deadline=None)
def test_pii_redaction_leaves_no_residual_matches_and_is_idempotent(
    spark, texts
):
    """For arbitrary text: (a) the redacted output contains no remaining
    IPv4/email/secret match, (b) redacting twice equals redacting once."""
    import re

    from log_analysis_system_spark.operators.datapipe import (
        PII_PATTERNS,
        pii_redaction,
    )

    df = spark.createDataFrame(
        [("c", i, "user", t, None, None) for i, t in enumerate(texts)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    once = pii_redaction(df)
    rows = {r["turn_idx"]: r["redacted"] for r in once.collect()}
    for red in rows.values():
        for _, pat, _repl in PII_PATTERNS:
            assert not re.search(pat, red), (red, pat)
    twice_df = spark.createDataFrame(
        [("c", i, "user", red, None, None) for i, red in rows.items()],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    twice = {r["turn_idx"]: r["redacted"] for r in pii_redaction(twice_df).collect()}
    assert twice == rows


# ---- text-operator invariants over arbitrary corpora -----------------

WORD = st.text(alphabet="abcdefgh#.0", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=1, max_size=30).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=12))
def test_entropy_and_gopher_invariants(spark, texts):
    """For ANY corpus: 0 <= entropy <= ln(n_distinct) (+6dp rounding
    slack), normalized entropy in [0,1], every Gopher ratio is sane, and
    gopher_keep equals the AND of its rule columns."""
    import math

    from log_analysis_system_spark.operators import textstats as ts

    docs = spark.createDataFrame(
        [(i, "en", t, "s") for i, t in enumerate(texts)],
        ["doc_id", "lang", "text", "source"],
    )
    ent = ts.token_entropy(docs).collect()
    assert len(ent) == len(texts)
    for r in ent:
        assert -1e-6 <= r["entropy_nats"] <= math.log(r["n_distinct"]) + 1e-6
        if r["n_distinct"] > 1:
            assert -1e-6 <= r["norm_entropy"] <= 1.0 + 1e-6
        else:
            assert r["norm_entropy"] is None
    gop = ts.gopher_rules(docs).collect()
    assert len(gop) == len(texts)
    for r in gop:
        assert r["n_words"] >= 1
        assert 0.0 <= r["alpha_word_frac"] <= 1.0
        assert r["symbol_word_ratio"] >= 0.0
        assert r["mean_word_len"] >= 0.0
        assert r["gopher_keep"] == (
            r["r_word_count"] and r["r_mean_len"] and r["r_symbol"]
            and r["r_alpha"] and r["r_stopwords"]
        )


@settings(max_examples=15, deadline=None)
@given(
    st.lists(WORD, min_size=6, max_size=14),   # the shared run (>= k+w-1)
    st.lists(WORD, min_size=0, max_size=8),    # doc-a prefix
    st.lists(WORD, min_size=0, max_size=8),    # doc-b suffix
)
def test_winnowing_guarantee_and_density(spark, run, pre, suf):
    """SIGMOD'03 §4 guarantee, property-tested: for ANY two docs sharing
    a k+w-1-word run, the winnowed fingerprint hash sets intersect; and
    within any doc, consecutive selected positions are <= w apart."""
    from log_analysis_system_spark.operators import textstats as ts

    k, w = ts.WINNOW_K, ts.WINNOW_W
    assert len(run) >= k + w - 1
    a = " ".join(pre + run)
    b = " ".join(run + suf)
    docs = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
    sel: dict[int, list] = {0: [], 1: []}
    for r in ts.winnowing_selections(docs, k=k, w=w).collect():
        sel[r["doc_id"]].append((r["sel_pos"], r["fp_hash"]))
    assert {h for _, h in sel[0]} & {h for _, h in sel[1]}
    for rows in sel.values():
        pos = sorted(p for p, _ in rows)
        assert pos, rows
        # first selection within the first window; gaps bounded by w
        assert pos[0] <= w
        assert all(nb - na <= w for na, nb in zip(pos, pos[1:]))


@settings(max_examples=12, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=14))
def test_sampling_and_stats_invariants(spark, texts):
    """Cross-operator invariants over ANY corpus: the source cap is
    respected with exact pre-cap sizes; dsir_sample's kept set dominates
    every unselected (key, -doc_id); vocab_growth conserves totals;
    every signal correlation sits in [-1, 1] (or NULL on zero
    variance)."""
    from pyspark.sql import functions as F

    from log_analysis_system_spark.operators import datapipe as dp
    from log_analysis_system_spark.operators import textstats as tsm

    docs = spark.createDataFrame(
        [(i, t, "en", f"s{i % 3}") for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source"],
    )
    capped = dp.source_cap_sample(docs, cap=2).collect()
    per_src: dict[str, int] = {}
    for r in capped:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
        assert r["keep_rank"] <= 2
    sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, kept in per_src.items():
        assert kept == min(2, sizes[src])
        got_size = {r["n_source_docs"] for r in capped if r["source"] == src}
        assert got_size == {sizes[src]}

    n_pick = max(1, len(texts) // 2)
    full = dp.dsir_sample(docs, n=10**6).collect()
    picked = dp.dsir_sample(docs, n=n_pick).collect()
    assert len(picked) == min(n_pick, len(full))
    sel = {r["doc_id"] for r in picked}
    if len(full) > len(picked):
        worst = min((r["es_key"], -r["doc_id"]) for r in picked)
        best_out = max(
            (r["es_key"], -r["doc_id"]) for r in full if r["doc_id"] not in sel
        )
        assert worst >= best_out

    growth = sorted(
        tsm.vocab_growth(docs, n_shards=4).collect(),
        key=lambda r: r["shard_id"],
    )
    all_tokens = sum(len(t.split(" ")) for t in texts)
    vocab = len({w for t in texts for w in t.split(" ")})
    assert growth[-1]["cum_tokens"] == all_tokens
    assert growth[-1]["cum_vocab"] == vocab
    assert sum(r["n_docs"] for r in growth) == len(texts)

    for r in tsm.signal_correlations(docs).collect():
        if r["corr"] is not None:
            assert -1.0 - 1e-6 <= r["corr"] <= 1.0 + 1e-6
