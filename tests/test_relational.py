"""Semantic tests for the relational/temporal operators (sessionization,
as-of join, bucketed range join, grouped top-k, percentiles, HLL distinct)
and the new training-data text ops (split / mixture / tf-idf).

The DuckDB oracle gate already checks value equality at sf0.01; these tests
pin the SEMANTICS on hand-built edge cases (gap boundaries, as-of
inclusivity, bucket boundaries) and the probabilistic ops' error bounds,
which no oracle row covers.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from log_analysis_system_spark.operators import relational as rel
from log_analysis_system_spark.operators import textstats as ts

SF001 = "/root/testdata/sf0.001"

_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("ts_str", StringType()),
    ]
)


def _events(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    return df.withColumn(
        "ts", F.to_timestamp("ts_str").cast("timestamp_ntz")
    ).drop("ts_str")


def test_sessionize_gap_boundaries(spark):
    # gaps: exactly 240 min (same session), 240 min + 1 s (new session)
    ev = _events(
        spark,
        [
            (1, 7, "view", 0.0, "2024-01-01 00:00:00"),
            (2, 7, "view", 0.0, "2024-01-01 04:00:00"),   # == gap: same
            (3, 7, "view", 0.0, "2024-01-01 08:00:01"),   # > gap: new
            (4, 8, "view", 0.0, "2024-01-01 00:00:00"),   # other user
        ],
    )
    got = {
        r["event_id"]: r["session_seq"]
        for r in rel.sessionize(ev).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats_rollup(spark):
    ev = _events(
        spark,
        [
            (1, 7, "view", 0.0, "2024-01-01 00:00:00"),
            (2, 7, "click", 0.0, "2024-01-01 00:30:00"),
            (3, 7, "view", 0.0, "2024-01-02 00:00:00"),  # new session
        ],
    )
    rows = {
        (r["user_id"], r["session_seq"]): r
        for r in rel.session_stats(ev).collect()
    }
    s1 = rows[(7, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_sec"] == 1800.0
    assert s1["n_event_types"] == 2
    assert rows[(7, 2)]["n_events"] == 1
    assert rows[(7, 2)]["duration_sec"] == 0.0


def test_asof_join_inclusive_and_unmatched(spark):
    ev = _events(
        spark,
        [
            (1, 7, "click", 1.5, "2024-01-01 10:00:00"),
            (2, 7, "error", 0.0, "2024-01-01 10:00:00"),  # same ts: inclusive
            (3, 7, "click", 2.5, "2024-01-01 11:00:00"),
            (4, 7, "error", 0.0, "2024-01-01 12:00:00"),  # matches click 3
            (5, 8, "error", 0.0, "2024-01-01 12:00:00"),  # no click: unmatched
        ],
    )
    got = {r["event_id"]: r for r in rel.asof_join(ev, "error", "click").collect()}
    assert got[2]["matched_event_id"] == 1 and got[2]["lag_sec"] == 0.0
    assert got[4]["matched_event_id"] == 3 and got[4]["lag_sec"] == 3600.0
    assert got[4]["matched_value"] == 2.5
    assert got[5]["matched_event_id"] is None and got[5]["lag_sec"] is None


def test_range_join_bucket_boundaries(spark):
    # window = 24h; follower exactly at +24h counts, +24h+1s does not,
    # and a follower in the NEXT bucket (cross-bucket probe) still counts
    ev = _events(
        spark,
        [
            (1, 7, "view", 0.0, "2024-01-01 23:00:00"),
            (2, 7, "view", 0.0, "2024-01-02 22:59:59"),  # +23:59:59 (next bucket)
            (3, 7, "view", 0.0, "2024-01-02 23:00:00"),  # exactly +24h
            (4, 7, "view", 0.0, "2024-01-02 23:00:01"),  # +24h1s: out for 1
            (5, 9, "view", 0.0, "2024-01-02 00:00:00"),  # other user
        ],
    )
    got = {
        r["event_id"]: r["n_follow"]
        for r in rel.range_join_follow_counts(ev).collect()
    }
    assert got == {1: 2, 2: 2, 3: 1, 4: 0, 5: 0}


def test_range_join_matches_naive_on_real_data(spark):
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    fast = rel.range_join_follow_counts(ev)
    w_us = rel.RANGE_JOIN_WINDOW_HOURS * 3600 * 1000000
    a, b = ev.alias("a"), ev.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (
                F.unix_micros(F.col("b.ts").cast("timestamp"))
                <= F.unix_micros(F.col("a.ts").cast("timestamp")) + w_us
            ),
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count("*").alias("n_follow"))
    )
    f = {r["event_id"]: r["n_follow"] for r in fast.collect()}
    n = {r["event_id"]: r["n_follow"] for r in naive.collect()}
    assert all(f[k] == v for k, v in n.items())
    assert all(v == 0 for k, v in f.items() if k not in n)


def test_topk_rank_and_ties(spark):
    ev = _events(
        spark,
        [
            (1, 1, "view", 5.0, "2024-01-01 00:00:00"),
            (2, 2, "view", 5.0, "2024-01-01 00:00:00"),  # tie: user_id breaks
            (3, 3, "view", 9.0, "2024-01-01 00:00:00"),
        ],
    )
    rows = rel.topk_users_per_type(ev, k=2).collect()
    assert [(r["user_id"], r["rank"]) for r in rows] == [(3, 1), (1, 2)]


def test_value_percentiles_exact(spark):
    ev = _events(
        spark,
        [(i, 1, "view", float(i), f"2024-01-01 00:00:{i:02d}") for i in range(1, 5)],
    )
    row = rel.value_percentiles(ev).collect()[0]
    # linear interpolation over [1,2,3,4]
    assert row["p50"] == 2.5
    assert row["p95"] == pytest.approx(3.85)
    assert row["n"] == 4


def test_approx_distinct_within_rsd(spark):
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    approx = {
        r["day"]: r["approx_users"]
        for r in rel.approx_distinct_daily(ev).collect()
    }
    exact = {
        r["day"]: r["u"]
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("u"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, e in exact.items():
        assert abs(approx[day] - e) <= max(2, 0.1 * e), (day, approx[day], e)


def test_dataset_split_deterministic_and_proportional(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    a = ts.dataset_split(docs).collect()
    b = ts.dataset_split(docs).collect()
    assert a == b  # pure function of doc_id
    n = len(a)
    frac = {s: sum(1 for r in a if r["split"] == s) / n for s in ("train", "val", "test")}
    assert 0.8 < frac["train"] < 0.97
    assert frac["val"] > 0 and frac["test"] > 0
    # adding docs never moves existing ones: split on a subset agrees
    sub = ts.dataset_split(docs.limit(50)).collect()
    full = {r["doc_id"]: r["split"] for r in a}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)


def test_tfidf_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet").limit(40)
    got = ts.tfidf_top_terms(docs, k=3).collect()
    rows = docs.select("doc_id", "text").collect()
    n = len(rows)
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for r in rows:
        counts: dict[str, int] = {}
        for t in r["text"].split(" "):
            counts[t] = counts.get(t, 0) + 1
        tf[r["doc_id"]] = counts
        for t in counts:
            df[t] = df.get(t, 0) + 1
    expected = {}
    for doc_id, counts in tf.items():
        scored = sorted(
            (
                (round(c * math.log(n / df[t]), 6), t)
                for t, c in counts.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        expected[doc_id] = [(t, s) for s, t in scored]
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["rank"])):
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["tfidf"]))
    assert by_doc == expected


def test_source_mixture_shares_sum_to_one(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows = ts.source_mixture(docs).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_docs"] for r in rows) == docs.count()


def test_session_stats_reuses_window_partitioning(spark):
    """The rollup's groupBy(user_id, session_seq) must be satisfied by the
    window's HashPartitioning(user_id) — exactly one hash exchange and,
    since the round-4 sort hoist, NO range exchange in the operator plan
    (the presentation sort lives in the registry wrapper only)."""
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    plan = spark._jvm.PythonSQLUtils.explainString(
        rel.session_stats(ev)._jdf.queryExecution(), "formatted"
    )
    # formatted mode lists each Exchange's partitioning in its detail
    # block: "Arguments: hashpartitioning(...)" / "rangepartitioning(...)"
    hash_exchanges = plan.count("Arguments: hashpartitioning")
    assert hash_exchanges == 1, plan
    # round-4 sort hoist: the OPERATOR plans no global sort (no range
    # exchange) — the presentation ORDER BY lives in the registry wrapper
    assert "rangepartitioning" not in plan, plan


def test_value_percentiles_approx_within_error_bound(spark):
    """Sketch percentiles must track the exact sort-based ones: at
    accuracy=10000 the rank error is <= n/10000, which on the test
    distribution translates to a small relative value error."""
    from log_analysis_system_spark.operators.relational import (
        value_percentiles,
        value_percentiles_approx,
    )

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = {r["event_type"]: r for r in value_percentiles(events).collect()}
    approx = {
        r["event_type"]: r for r in value_percentiles_approx(events).collect()
    }
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        assert a["n"] == e["n"]
        for q in ("p50", "p95", "p99"):
            denom = max(abs(e[q]), 1e-9)
            assert abs(a[q] - e[q]) / denom < 0.02, (et, q, a[q], e[q])


def test_funnel_strict_ordering(spark):
    """A stage-2 event BEFORE the first stage-1 event must not count; the
    funnel requires view < click < purchase strictly."""
    ev = _events(
        spark,
        [
            # user 1: click precedes the first view -> stage stalls at 1
            (1, 1, "click", 0.0, "2024-01-01 09:00:00"),
            (2, 1, "view", 0.0, "2024-01-01 10:00:00"),
            # user 2: full ordered funnel
            (3, 2, "view", 0.0, "2024-01-01 08:00:00"),
            (4, 2, "click", 0.0, "2024-01-01 08:30:00"),
            (5, 2, "purchase", 0.0, "2024-01-01 09:00:00"),
            # user 3: purchase BEFORE the click -> stage 2 only
            (6, 3, "view", 0.0, "2024-01-01 08:00:00"),
            (7, 3, "purchase", 0.0, "2024-01-01 08:10:00"),
            (8, 3, "click", 0.0, "2024-01-01 08:20:00"),
            # user 4: never views -> not in the funnel at all
            (9, 4, "click", 0.0, "2024-01-01 08:00:00"),
        ],
    )
    got = {r["user_id"]: r for r in rel.funnel_stages(ev).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["funnel_stage"] == 1 and got[1]["t_click"] is None
    assert got[2]["funnel_stage"] == 3
    assert got[3]["funnel_stage"] == 2 and got[3]["t_purchase"] is None


def test_funnel_equal_timestamp_not_counted(spark):
    """Simultaneous stage-1/stage-2 events: strict > means the click at the
    exact view timestamp does not advance the funnel."""
    ev = _events(
        spark,
        [
            (1, 1, "view", 0.0, "2024-01-01 08:00:00"),
            (2, 1, "click", 0.0, "2024-01-01 08:00:00"),
        ],
    )
    rows = rel.funnel_stages(ev).collect()
    assert len(rows) == 1 and rows[0]["funnel_stage"] == 1


def test_funnel_on_testdata_monotone(spark):
    """Stage cohort sizes are monotone non-increasing and timestamps are
    ordered within each user row."""
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    rows = rel.funnel_stages(ev).collect()
    n1 = len(rows)
    n2 = sum(r["funnel_stage"] >= 2 for r in rows)
    n3 = sum(r["funnel_stage"] == 3 for r in rows)
    assert n1 >= n2 >= n3 > 0
    for r in rows:
        if r["t_click"] is not None:
            assert r["t_click"] > r["t_view"]
        if r["t_purchase"] is not None:
            assert r["t_purchase"] > r["t_click"]


def test_funnel_property_vs_bruteforce(spark):
    """Randomized cross-check: funnel_stages agrees with a brute-force
    Python reference on ~40 small random event logs (duplicate timestamps,
    missing stages, interleaved users) batched through ONE Spark job."""
    import random

    rng = random.Random(20260818)
    types = ["view", "click", "purchase", "error"]
    rows, expected = [], {}
    eid = 0
    for case in range(40):
        base_user = case * 10
        for u in range(base_user, base_user + rng.randint(1, 4)):
            evs = []
            for _ in range(rng.randint(1, 12)):
                t = rng.randint(0, 20)
                ty = rng.choice(types)
                evs.append((ty, t))
                eid += 1
                rows.append(
                    (eid, u, ty, 0.0, f"2024-01-01 00:00:{t:02d}")
                )
            # brute-force strict-ordered funnel
            t1 = min((t for ty, t in evs if ty == "view"), default=None)
            t2 = (
                min((t for ty, t in evs if ty == "click" and t > t1), default=None)
                if t1 is not None else None
            )
            t3 = (
                min((t for ty, t in evs if ty == "purchase" and t > t2), default=None)
                if t2 is not None else None
            )
            if t1 is not None:
                expected[u] = (t1, t2, t3, 3 if t3 is not None else 2 if t2 is not None else 1)
    got = {
        r["user_id"]: (
            r["t_view"].second if r["t_view"] else None,
            r["t_click"].second if r["t_click"] else None,
            r["t_purchase"].second if r["t_purchase"] else None,
            r["funnel_stage"],
        )
        for r in rel.funnel_stages(_events(spark, rows)).collect()
    }
    assert got == expected


def test_value_histogram_semantics(spark):
    """10 equal bins over [0, 10]: v=10 closes into bin 9; nulls land in
    bin -1; shares sum to 1."""
    rows = [(i, 1, "view", float(v), "2024-01-01 00:00:00")
            for i, v in enumerate([0, 1, 5, 9.99, 10])]
    ev = _events(spark, rows)
    ev = ev.unionByName(
        ev.limit(1).withColumn("value", F.lit(None).cast("double"))
        .withColumn("event_id", F.lit(99))
    )
    got = {r["bin"]: r for r in rel.value_histogram(ev).collect()}
    assert got[-1]["n"] == 1 and got[-1]["bin_lo"] is None
    assert got[0]["n"] == 1          # 0
    assert got[1]["n"] == 1          # 1
    assert got[5]["n"] == 1          # 5
    assert got[9]["n"] == 2          # 9.99 and the max value 10
    # shares are rounded to 6 dp each, so the sum carries up to n*5e-7 slack
    assert abs(sum(r["share"] for r in got.values()) - 1.0) < 1e-5


def test_value_histogram_constant_column(spark):
    """hi == lo degenerates to one bin holding everything."""
    rows = [(i, 1, "view", 3.0, "2024-01-01 00:00:00") for i in range(4)]
    got = rel.value_histogram(_events(spark, rows)).collect()
    assert len(got) == 1 and got[0]["bin"] == 0 and got[0]["n"] == 4


def test_role_transitions_hand_computed(spark):
    from log_analysis_system_spark.operators import windows as win

    rows = [
        # conv A: user -> assistant -> user
        ("a", 0, "user"), ("a", 1, "assistant"), ("a", 2, "user"),
        # conv B: user -> assistant
        ("b", 0, "user"), ("b", 1, "assistant"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = {(r["prev_role"], r["role"]): r for r in win.role_transitions(t).collect()}
    assert got[("<start>", "user")]["n"] == 2
    assert got[("<start>", "user")]["n_conversations"] == 2
    assert got[("user", "assistant")]["n"] == 2
    assert got[("assistant", "user")]["n"] == 1
    assert got[("assistant", "user")]["n_conversations"] == 1
    assert sum(r["n"] for r in got.values()) == len(rows)


def test_key_skew_profile_hand_computed(spark):
    from log_analysis_system_spark.operators import windows as win

    rows = (
        [("hot", i, "user") for i in range(6)]
        + [("a", i, "user") for i in range(2)]
        + [("b", 0, "user"), ("c", 0, "user")]
    )
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    got = win.key_skew_profile(t, "conv_id", top_n=3).collect()
    assert [r["conv_id"] for r in got] == ["hot", "a", "b"]  # tie b<c on key
    top = got[0]
    assert (top["rank"], top["n_rows"], top["total_rows"], top["n_keys"]) == (
        1, 6, 10, 4,
    )
    assert top["share"] == 0.6
    assert top["x_mean"] == 2.4  # 6 / (10/4)
    assert got[1]["x_mean"] == 0.8


def test_tpch_order_priority_semi_join_semantics(spark):
    from log_analysis_system_spark import queries_tpch as qt

    orders = spark.createDataFrame(
        [
            # in-window, TWO slow lines -> still counted once (semi join)
            (1, "1-URGENT", "1996-02-01 00:00:00"),
            # in-window, only fast lines -> not counted
            (2, "1-URGENT", "1996-02-01 00:00:00"),
            # out of the quarter -> not counted even with a slow line
            (3, "2-HIGH", "1996-06-01 00:00:00"),
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    lineitem = spark.createDataFrame(
        [
            (1, "1996-05-01 00:00:00"),  # slow (89 days)
            (1, "1996-06-01 00:00:00"),  # slow again
            (2, "1996-02-10 00:00:00"),  # fast
            (3, "1996-12-01 00:00:00"),  # slow but order out of window
        ],
        "l_orderkey long, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    got = {
        r["o_orderpriority"]: r["order_count"]
        for r in qt.order_priority_counts(orders, lineitem).collect()
    }
    assert got == {"1-URGENT": 1}


def test_tpch_no_recent_orders_anti_join_semantics(spark):
    from log_analysis_system_spark import queries_tpch as qt

    customer = spark.createDataFrame(
        [
            (1, 5, 100.0),   # above avg, no recent order -> counted
            (2, 5, 100.0),   # above avg, HAS recent order -> excluded
            (3, 5, 10.0),    # below avg -> excluded
            (4, 6, -50.0),   # negative: excluded from avg AND below it
        ],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            (2, "1999-06-01 00:00:00"),   # recent
            (1, "1997-01-01 00:00:00"),   # old -> does not disqualify
        ],
        "o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    got = qt.no_recent_order_customers(customer, orders).collect()
    # avg positive balance = (100+100+10)/3 = 70 -> only custkeys 1 and 2
    # qualify on balance; 2 is anti-joined away by its recent order
    assert [(r["c_nationkey"], r["numcust"], r["totacctbal"]) for r in got] == [
        (5, 1, 100.0)
    ]


def test_salted_dim_join_equals_plain_rollup_and_salts_the_key(spark):
    from log_analysis_system_spark.operators import windows as win

    rows = [("hot", i, "user") for i in range(50)] + [
        ("tiny", 0, "user"), ("tiny", 1, "assistant"),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = win.salted_dim_join(t, salt_buckets=4)
    got = {r["conv_id"]: (r["n_joined"], r["n_turns"]) for r in out.collect()}
    assert got == {"hot": (50, 50), "tiny": (2, 2)}
    # the join must key on (conv_id, _salt) — a plain conv_id-only join
    # would put the hot conversation on one reducer
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_line = next(
        ln for ln in plan.splitlines()
        if "Join" in ln and "conv_id" in ln
    )
    assert "_salt" in join_line, join_line


def test_temperature_mixture_flattens_toward_parity(spark):
    """T=2 scaling must (a) normalize to 1, (b) upsample every
    below-average cell and downsample every above-average one (sqrt
    crosses the identity at the uniform share), (c) preserve the share
    ORDER (monotone transform)."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rows = ts.temperature_mixture(docs).collect()
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-4
    uniform = 1.0 / len(rows)
    for r in rows:
        if r["token_share"] < uniform * 0.9:
            assert r["temp_weight"] > r["token_share"], r
        if r["token_share"] > uniform * 1.1:
            assert r["temp_weight"] < r["token_share"], r
    by_share = sorted(rows, key=lambda r: r["token_share"])
    weights = [r["temp_weight"] for r in by_share]
    assert weights == sorted(weights)


def test_conversation_context_hand_computed(spark):
    from log_analysis_system_spark.operators import windows as win

    rows = [
        ("a", 0, "user", "hi"),
        ("a", 1, "assistant", "hello"),
        ("a", 2, "user", "thanks"),
        ("a", 3, "assistant", "bye"),
        ("b", 0, "user", "solo"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in win.conversation_context(t, n_context=2).collect()
    }
    assert got[("a", 0)]["context"] is None
    assert got[("a", 0)]["n_context_turns"] == 0
    assert got[("a", 1)]["context"] == "user: hi"
    assert got[("a", 2)]["context"] == "user: hi\nassistant: hello"
    # frame is ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING: turn 0 ages out
    assert got[("a", 3)]["context"] == "assistant: hello\nuser: thanks"
    assert got[("a", 3)]["n_context_turns"] == 2
    assert got[("b", 0)]["context"] is None


def test_conversation_context_null_line_semantics(spark):
    """A turn with NULL role or text contributes a NULL line (SQL ``||``
    semantics — concat, not concat_ws): the line is skipped in the joined
    context exactly as DuckDB's string_agg skips it, but the turn still
    counts toward n_context_turns (frame count, not surviving-line count)."""
    from log_analysis_system_spark.operators import windows as win

    rows = [
        ("c", 0, "user", "hi"),
        ("c", 1, None, "ghost"),  # NULL role -> NULL line
        ("c", 2, "user", None),  # NULL text -> NULL line
        ("c", 3, "assistant", "bye"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        r["turn_idx"]: r
        for r in win.conversation_context(t, n_context=3).collect()
    }
    assert got[1]["context"] == "user: hi"
    assert got[2]["context"] == "user: hi"  # turn 1's line skipped
    assert got[2]["n_context_turns"] == 2  # but turn 1 is in the frame
    assert got[3]["context"] == "user: hi"  # turns 1 and 2 both skipped
    assert got[3]["n_context_turns"] == 3


def test_mixture_resample_null_cell_not_dropped(spark):
    """Docs in a NULL (source, lang) cell form a mixture cell (groupBy
    keeps the null group) and must receive n_copies rows — the eqNullSafe
    join must not silently drop them as a plain equi-join would."""
    rows = [
        (1, "web", "en", "a b c d"),
        (2, "web", "en", "e f g h"),
        (3, None, "en", "i j k l"),
        (4, "web", None, "m n o p"),
        (5, None, None, "q r s t"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = {r["doc_id"]: r for r in ts.mixture_resample(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for doc_id in (3, 4, 5):
        assert out[doc_id]["n_copies"] is not None, out[doc_id]


def test_mixture_resample_bounds_and_direction(spark):
    """Every doc gets floor(r) or ceil(r) copies of its cell's upsample
    factor r; the realized per-cell copy mass moves each cell TOWARD its
    temperature weight (upsampled cells gain mass, downsampled lose)."""
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    rates = {
        (r["source"], r["lang"]): r["upsample_factor"]
        for r in ts.temperature_mixture(docs).collect()
    }
    rows = ts.mixture_resample(docs).collect()
    assert len(rows) == docs.count()
    import math

    realized: dict = {}
    cells: dict = {}
    for r in rows:
        rate = rates[(r["source"], r["lang"])]
        assert r["n_copies"] in (math.floor(rate), math.ceil(rate)), r
        k = (r["source"], r["lang"])
        realized[k] = realized.get(k, 0) + r["n_copies"]
        cells[k] = cells.get(k, 0) + 1
    for k, rate in rates.items():
        if rate > 1.5 and cells[k] >= 5:
            assert realized[k] > cells[k], (k, rate, realized[k], cells[k])
        if rate < 0.67 and cells[k] >= 5:
            assert realized[k] < cells[k], (k, rate, realized[k], cells[k])


def test_mixture_resample_deterministic(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    a = sorted(map(tuple, ts.mixture_resample(docs).collect()))
    b = sorted(map(tuple, ts.mixture_resample(docs).collect()))
    assert a == b


def test_retention_cohorts_hand_computed(spark):
    from datetime import datetime as dt

    from log_analysis_system_spark.operators import relational as rel

    rows = [
        # cohort A: week of Mon 2024-03-04 — users 1,2
        (1, dt(2024, 3, 5), 1),    # u1 w0
        (2, dt(2024, 3, 6), 2),    # u2 w0
        (3, dt(2024, 3, 12), 1),   # u1 w1
        (4, dt(2024, 3, 20), 1),   # u1 w2
        (5, dt(2024, 3, 19), 2),   # u2 w2
        # cohort B: week of Mon 2024-03-11 — user 3 only
        (6, dt(2024, 3, 14), 3),   # u3 w0
        (7, dt(2024, 3, 14), 3),   # same week dup: still one active row
        # excluded rows: NULL ts / NULL user
        (8, None, 1),
        (9, dt(2024, 3, 5), None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    out = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in rel.retention_cohorts(ev).collect()
    }
    a, b = "2024-03-04", "2024-03-11"
    assert set(out) == {(a, 0), (a, 1), (a, 2), (b, 0)}
    assert out[(a, 0)]["n_active"] == 2 and out[(a, 0)]["cohort_size"] == 2
    assert out[(a, 1)]["n_active"] == 1
    assert out[(a, 1)]["retention_rate"] == 0.5
    assert out[(a, 2)]["n_active"] == 2
    assert out[(a, 2)]["retention_rate"] == 1.0
    assert out[(b, 0)]["n_active"] == 1 and out[(b, 0)]["cohort_size"] == 1


def test_ewma_traffic_recurrence_and_spike(spark):
    from datetime import datetime as dt

    from log_analysis_system_spark.operators import relational as rel

    rows = [
        # 'a': counts 4, 4, 20 (spike: 20 > 2*4), then decay
        *[(i, dt(2024, 1, 1, 0, i), "a") for i in range(4)],
        *[(10 + i, dt(2024, 1, 1, 1, i), "a") for i in range(4)],
        *[(20 + i, dt(2024, 1, 1, 2, i), "a") for i in range(20)],
        (40, dt(2024, 1, 1, 3), "a"),
        # NULL event_type is a legitimate group; NULL ts excluded
        (41, dt(2024, 1, 1, 0), None),
        (42, None, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {
        (r["event_type"], r["hour"].hour): r
        for r in rel.ewma_traffic(ev).collect()
    }
    a0, a1, a2, a3 = (out[("a", h)] for h in range(4))
    assert (a0["n_events"], a0["ewma"], a0["is_spike"]) == (4, 4.0, False)
    # s1 = .25*4 + .75*4 = 4; s2 = .25*20 + .75*4 = 8; 20 > 2*4 -> spike
    assert (a1["ewma"], a1["is_spike"]) == (4.0, False)
    assert (a2["ewma"], a2["is_spike"]) == (8.0, True)
    # s3 = .25*1 + .75*8 = 6.25; 1 < 2*8 -> no spike
    assert (a3["ewma"], a3["is_spike"]) == (6.25, False)
    assert (None, 0) in out and out[(None, 0)]["n_events"] == 1
    # the null-ts event contributed nowhere
    assert sum(r["n_events"] for r in out.values()) == 30
