"""Relational / temporal operators over the ``events`` stream table.

Operators the reference's query surface implies but Spark has no single
built-in for — each implemented as a composition of DataFrame ops with an
explicit 100 TB shape:

- sessionization (gap-based): one shuffle on the entity key, then pure
  window functions; the per-session rollup reuses the same hash
  partitioning (HashPartitioning(user_id) satisfies the (user_id,
  session_seq) clustering), so stats cost no second exchange.
- as-of join: the union-tag + running-last formulation — NO join at all,
  one shuffle on (user_id), O(n log n_partition) sort. The naive
  formulation (join + max-filter) explodes on hot users; this one never
  produces more rows than left+right.
- range join: bucketed equi-join — each left row joins only its own and
  the next time bucket (bucket width == window width), turning the
  inequality join into an equi-join with a residual filter. At 10^12 rows
  the shuffle keys on (user_id, bucket): bounded blocks, no
  BroadcastNestedLoop, no cross product.
- grouped top-k: rank window; Spark pushes the rank filter into
  WindowGroupLimit (partial top-k before the shuffle).
- exact percentiles: sort-based ``percentile`` — deterministic (unlike
  mean-of-doubles), matching DuckDB ``quantile_cont`` bit-for-bit on the
  same input set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_MINUTES = 240
RANGE_JOIN_WINDOW_HOURS = 24
TOPK_PER_GROUP = 5


def _micros(col) -> F.Column:
    """Microseconds since epoch. Parquet naive timestamps load as
    TIMESTAMP_NTZ, which ``unix_micros`` rejects; the session timezone is
    pinned to UTC (session.py), so the NTZ->TIMESTAMP cast is an identity
    on the underlying micros."""
    return F.unix_micros(F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp"))


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    user's previous event exceeds ``gap_minutes`` (or at the first event).

    Output: one row per event with its (user-scoped) ``session_seq``,
    UNSORTED — at 100 TB a global presentation sort would be the most
    expensive node in the plan; callers that need an order add it (the
    query registry wrappers do, for deterministic oracle comparison).
    Scale: single shuffle on user_id; per-user sort is the only per-key
    cost. Hot users are bounded by their own event count (no blowup).

    Convention: a NULL-``ts`` event cannot be placed on the session
    timeline and is EXCLUDED (Spark window sort puts NULLs first, DuckDB
    last — an explicit filter gives both engines the same rows; oracles
    mirror with ``WHERE ts IS NOT NULL``).
    """
    events = events.where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = F.col("ts") <= F.col("prev_ts") + F.expr(
        f"INTERVAL {int(gap_minutes)} MINUTES"
    )
    return (
        events.select(
            "event_id", "user_id", "ts", "event_type",
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .withColumn(
            "is_new", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
        )
        .withColumn(
            "session_seq",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("event_id", "user_id", "ts", "event_type", "session_seq")
    )


def session_stats(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Per-session rollup: event count, span, distinct event types.

    The groupBy keys on (user_id, session_seq) — a superset of the window
    shuffle's HashPartitioning(user_id) — so Catalyst plans NO second
    exchange (ClusteredDistribution satisfied by the subset partitioning).
    """
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(
                (
                    _micros(F.max("ts")) - _micros(F.min("ts"))
                ) / F.lit(1000000.0),
                6,
            ).alias("duration_sec"),
            F.count_distinct("event_type").alias("n_event_types"),
        )
    )


def asof_join(
    events: DataFrame, left_type: str = "error", right_type: str = "click"
) -> DataFrame:
    """As-of join: each ``left_type`` event matched to the user's most
    recent ``right_type`` event at-or-before it (inclusive).

    Union-tag formulation (the scale-correct shape — no join operator):
    tag right rows 0 and left rows 1, sort per user by (ts, side,
    event_id), take the running ``last`` of the right payload with
    ignoreNulls, keep left rows. Right rows at the same timestamp sort
    before left (inclusive semantics, = DuckDB ``ASOF JOIN ON l.ts >=
    r.ts``); duplicate right timestamps are pre-reduced to max(event_id)
    so the match is deterministic on both engines.

    NULL-``ts`` rows are excluded (the :func:`sessionize` convention): a
    null-ts right row would become a running "last seen" under Spark's
    nulls-first window sort but can never satisfy DuckDB's ``l.ts >=
    r.ts`` — the filter gives both engines the same match set.
    """
    events = events.where(F.col("ts").isNotNull())
    right = (
        events.where(F.col("event_type") == right_type)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_event_id"), F.max_by("value", "event_id").alias("r_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            "r_event_id",
            F.col("ts").alias("r_ts"),
            "r_value",
        )
    )
    left = events.where(F.col("event_type") == left_type).select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast("timestamp").alias("r_ts"),
        F.lit(None).cast("double").alias("r_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = right.unionByName(left).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("r_event_id", ignorenulls=True).over(w).alias("matched_event_id"),
        F.last("r_ts", ignorenulls=True).over(w).alias("matched_ts"),
        F.last("r_value", ignorenulls=True).over(w).alias("matched_value"),
    )
    return (
        merged.where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "matched_event_id",
            "matched_ts",
            F.round("matched_value", 6).alias("matched_value"),
            F.round(
                (
                    _micros("ts") - _micros("matched_ts")
                ) / F.lit(1000000.0),
                6,
            ).alias("lag_sec"),
        )
    )


def range_join_follow_counts(
    events: DataFrame, window_hours: int = RANGE_JOIN_WINDOW_HOURS
) -> DataFrame:
    """Range join: for each event, count the same user's events in the
    half-open window (ts, ts + window_hours].

    Bucketed equi-join shape: both sides key on (user_id,
    floor(epoch/window)); each left row probes its own bucket and the next
    (a window of width W spans at most 2 W-wide buckets), then the exact
    interval predicate filters residuals. The inequality join becomes 2
    equi-join lookups — shuffle-partitionable, skew-boundable, no
    BroadcastNestedLoopJoin.
    """
    w_us = int(window_hours) * 3600 * 1000000
    # NULL-ts exclusion (the sessionize convention, applied uniformly to
    # every time-ordered operator): an untimestamped event neither counts
    # follows nor is followed — on both engines, by an explicit filter.
    base = events.where(F.col("ts").isNotNull()).select(
        "event_id", "user_id", "ts", _micros("ts").alias("us")
    )
    left = base.select(
        "event_id",
        "user_id",
        "ts",
        "us",
        F.explode(
            F.array(
                (F.col("us") / w_us).cast("long").alias("b"),
                (F.col("us") / w_us).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    right = base.select(
        F.col("user_id").alias("r_user_id"),
        F.col("us").alias("r_us"),
        (F.col("us") / w_us).cast("long").alias("bucket"),
    )
    hits = (
        left.join(
            right,
            (F.col("user_id") == F.col("r_user_id"))
            & (left["bucket"] == right["bucket"])
            & (F.col("r_us") > F.col("us"))
            & (F.col("r_us") <= F.col("us") + F.lit(w_us)),
        )
        .groupBy("event_id")
        .agg(F.count("*").alias("n_follow"))
    )
    return (
        base.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.col("n_follow"), F.lit(0)).alias("n_follow"),
        )
    )


def topk_users_per_type(events: DataFrame, k: int = TOPK_PER_GROUP) -> DataFrame:
    """Grouped top-k: per event_type, the k users with the highest total
    value (decimal-summed for partition-order determinism; rank ties break
    on user_id). Spark plans a WindowGroupLimit: per-partition partial
    top-k runs BEFORE the shuffle, so the exchange carries k rows per
    (type, input-partition), not the full group.
    """
    totals = (
        events.groupBy("event_type", "user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(28,10)")).alias("total_dec"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "user_id",
            F.round(F.col("total_dec").cast("double"), 6).alias("total_value"),
            "n_events",
        )
    )
    # asc_nulls_last on the tie-break key: Spark's bare asc sorts NULLs
    # FIRST while DuckDB's default is NULLS LAST — with a NULL user_id in
    # a total_value tie at the rank cutoff the two engines would return
    # different top-k rows. NULLS LAST is pinned on both (DuckDB default).
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id").asc_nulls_last()
    )
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("event_type", "rank")
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-type percentiles of ``value`` (p50/p95/p99, linear
    interpolation). Sort-based and deterministic — same result regardless
    of partition order, unlike floating mean — and identical to DuckDB
    ``quantile_cont``. At 10^12 rows exact percentiles need a per-group
    sort; the approx_* variant is the cheap path (see
    ``approx_distinct_daily``'s module note).
    """
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


def session_window_stats(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Per-session rollup via Spark's BUILT-IN ``session_window`` (dynamic
    gap-merge windows) — an independent mechanism from the
    :func:`sessionize` lag/running-sum formulation, registered so the two
    are cross-checked against the same DuckDB oracle.

    Boundary semantics: an event at exactly ``prev_ts + gap`` starts a NEW
    session (windows are half-open ``[ts, ts+gap)``) — the oracle uses
    strict ``<`` to match. ``session_end`` is ``max(ts)``, not the window
    end (which would be ``max(ts) + gap``).

    Scale: same single shuffle on the session key as the manual
    formulation; the merge runs inside ``UpdatingSessionsIterator`` on the
    sorted partition — no extra exchange.

    NULL-``ts`` rows are excluded explicitly (``session_window`` silently
    drops them anyway; the filter makes the :func:`sessionize` convention
    visible in the plan and keeps the oracle mirror exact).
    """
    return (
        events.where(F.col("ts").isNotNull())
        .groupBy(
            "user_id",
            F.session_window("ts", f"{int(gap_minutes)} minutes").alias("w"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
    )


def value_percentiles_approx(
    events: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """The 10^12-row percentile path: ``approx_percentile`` (KLL-style
    mergeable sketch) instead of the exact sort-based ``percentile``.
    Partials are fixed-size sketches merged map-side, so the shuffle
    carries O(accuracy) per group instead of requiring a per-group sort.
    Deterministic for a given input+accuracy but approximate -> no DuckDB
    oracle row; tests bound the error against :func:`value_percentiles`.
    """
    pct = F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.approx_percentile("value", pct, accuracy).alias("p"),
        )
        .select(
            "event_type",
            "n",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


def props_key_stats(events: DataFrame) -> DataFrame:
    """Schema-on-read over the semi-structured ``props`` JSON column:
    extract ``$.k`` per row, aggregate per event_type.

    ``get_json_object`` is a codegen scalar (Jackson parse per row, no
    UDF); the integer sum is exact, so no rounding hazards. At 10^12 rows
    prefer parsing ONCE into a materialized column (or a from_json struct
    pushed into the silver table) over re-extracting per query — this
    operator is the query-time form.

    ``k`` counts only when it is a canonical integer that fits in INT
    (anchored-regex guard before the cast): hostile props — malformed
    JSON, ``"k": 2.7``, ``"k": "x"`` — yield NULL on both engines instead
    of an ANSI cast error here vs DuckDB's rounding TRY_CAST ('2.7' -> 3).
    """
    raw_k = F.get_json_object("props", "$.k")
    k = F.when(raw_k.rlike(r"^-?[0-9]{1,9}$"), raw_k.cast("int"))
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


def approx_distinct_daily(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """Daily approximate distinct users (HyperLogLog++).

    The 10^12-row path for COUNT(DISTINCT): the HLL sketch partial-
    aggregates map-side (fixed ~1.5/rsd² bytes per group), so the shuffle
    carries sketches, not user_ids — exact distinct shuffles every
    distinct (day, user) pair. Probabilistic -> no DuckDB oracle row;
    tests assert relative error vs the exact count.
    """
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame, stages: tuple[str, str, str] = FUNNEL_STAGES
) -> DataFrame:
    """Ordered-funnel analysis (strict sequence): per user, the first
    stage-1 event, the first stage-2 event STRICTLY AFTER it, and the
    first stage-3 event strictly after that, plus the deepest stage
    reached — the conversion query every event-analytics engine ships.

    Scale shape: each stage aggregate shuffles ONLY its own
    event_type-filtered slice — the three slices are disjoint, so the
    total shuffled volume is bounded by one corpus shuffle — and every
    aggregate/join keys on user_id, so the stitched chain is either
    broadcast (AQE, when a stage cohort is small) or co-partitioned. No
    per-user arrays or sequence materialization: a hot user with 10^8
    events keeps O(1) aggregate state per stage (min-timestamp), unlike
    sort-array/collect_list funnel formulations.
    """
    s1, s2, s3 = stages
    e = events.select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == s1)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == s2)
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == s3)
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            F.col("t1").alias(f"t_{s1}"),
            F.col("t2").alias(f"t_{s2}"),
            F.col("t3").alias(f"t_{s3}"),
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .otherwise(1)
            .cast("int")
            .alias("funnel_stage"),
        )
    )


HISTOGRAM_BINS = 10


def value_histogram(
    events: DataFrame, col: str = "value", bins: int = HISTOGRAM_BINS
) -> DataFrame:
    """Fixed-width histogram of a numeric column (data-profiling staple):
    global [min, max] split into ``bins`` equal bins, per-bin count and
    share; the max value closes into the last bin; nulls are reported as
    bin -1.

    Scale shape: one partial-agg pass for the global range (2 doubles per
    task through the shuffle), broadcast back as a 1-row frame; the bin
    assignment is a row-local projection and the per-bin rollup
    partial-aggregates into at most bins+1 cells. The share divides exact
    integer counts — no float-aggregation noise anywhere.
    """
    rng = events.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
        F.count("*").alias("n_total"),
    )
    v = F.col(col).cast("double")
    width = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    bin_ = (
        F.when(v.isNull(), F.lit(-1))
        .when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((v - F.col("lo")) / width).cast("int"),
                F.lit(bins - 1),
            )
        )
        .cast("int")
    )
    return (
        events.crossJoin(F.broadcast(rng))
        .select(bin_.alias("bin"), "n_total", F.col("lo"), width.alias("w"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.first("n_total").alias("n_total"),
            F.when(
                F.col("bin") >= 0,
                F.round(F.first("lo") + F.col("bin") * F.first("w"), 6),
            ).alias("bin_lo"),
        )
        .select(
            "bin",
            "bin_lo",
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("share"),
        )
    )


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Classic weekly retention-cohort analysis: users grouped by the ISO
    week of their FIRST event (the cohort), then for every later week the
    share of the cohort still active — the product-analytics rollup every
    event-stream warehouse ships (reference analog: the per-day activity
    summaries of ``analyzer.py``'s daily report, generalized to
    cohort × offset).

    Conventions: NULL-``ts`` events can't be placed on the timeline and
    NULL-``user_id`` events have no identity to retain — both excluded,
    mirrored by the oracle (the :func:`sessionize` NULL policy). Weeks
    are ``date_trunc('week')`` — ISO Monday start on both engines; the
    offset is an exact integer day-diff / 7 (week starts align, so the
    division is exact). ``week_offset = 0`` always exists (the cohort
    week itself), so ``cohort_size`` comes from a window max over the
    cohort partition, not a second join.

    Output: ``(cohort_week, week_offset, n_active, cohort_size,
    retention_rate)`` — one row per (cohort, offset) with activity.

    Scale shape (100 TB): (user, week) distinct first — the ONLY stage
    that sees event volume, map-side partial distinct on narrow keys;
    the per-user min and the activity join then run on user×week rows
    (bounded by users × horizon weeks); final agg is (cohort, offset)
    cells with a cells-only window for the rate. No broadcast needed,
    no skew risk beyond the user-key distinct (hot users collapse to one
    row per week in the partial distinct).
    """
    week = F.date_trunc("week", F.col("ts").cast("timestamp")).cast("date")
    uw = (
        events.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", week.alias("week"))
        .distinct()
    )
    first = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        uw.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    w = Window.partitionBy("cohort_week")
    size = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(w)
    return cells.select(
        "cohort_week",
        "week_offset",
        "n_active",
        size.alias("cohort_size"),
        F.round(F.col("n_active") / size, 6).alias("retention_rate"),
    )


EWMA_ALPHA = 0.25  # exact binary fraction: the recursion is pure IEEE +/*
EWMA_SPIKE_FACTOR = 2.0


def ewma_traffic(
    events: DataFrame,
    alpha: float = EWMA_ALPHA,
    spike_factor: float = EWMA_SPIKE_FACTOR,
) -> DataFrame:
    """EWMA-smoothed hourly traffic per event type with spike flags — the
    classic sequential-state operator (s_t = α·x_t + (1−α)·s_{t−1},
    pandas ``ewm(adjust=False)`` semantics) that Spark's window functions
    CANNOT express (the recursion isn't a frame aggregate), implemented
    as the brief's custom-stateful-operator pattern: ``applyInPandas``
    over per-group ordered series.

    A bucket is a spike when its count exceeds ``spike_factor`` × the
    forecast (the EWMA of everything BEFORE it); the first bucket of a
    group has no forecast and is never a spike.

    Cross-engine determinism: the input counts are exact integers, α is
    an exact binary fraction (0.25 by default), and the recursion is a
    fixed-order chain of IEEE +/× — bit-identical in any engine that
    evaluates the same recurrence (the DuckDB oracle uses a recursive
    CTE), so only the OUTPUT is rounded (6 dp). NULL-``ts`` events are
    excluded (the :func:`sessionize` policy); a NULL ``event_type`` is a
    legitimate group on both engines.

    Output: ``(event_type, hour, n_events, ewma, is_spike)``.

    Scale shape (100 TB): the (event_type, hour) pre-aggregate is the
    ONLY stage that sees event volume (map-side partial agg on narrow
    keys); ``applyInPandas`` then runs on the few-cells-per-group series
    — state is one double per group, series length is the time horizon,
    not the row count. At many groups the stage parallelizes per group;
    a single global series is inherently sequential (the recurrence's
    data dependency), which is why the grouping key is part of the
    operator contract.
    """
    import pandas as pd

    hourly = (
        events.where(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("hour"),
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("hour").reset_index(drop=True)
        s = None
        ewma, spike = [], []
        for x in pdf["n_events"]:
            xf = float(x)
            if s is None:
                spike.append(False)
                s = xf
            else:
                spike.append(xf > spike_factor * s)
                s = alpha * xf + (1.0 - alpha) * s
            ewma.append(round(s, 6))
        pdf["ewma"] = ewma
        pdf["is_spike"] = spike
        return pdf

    return hourly.groupBy("event_type").applyInPandas(
        run,
        "event_type string, hour timestamp, n_events bigint, "
        "ewma double, is_spike boolean",
    )
