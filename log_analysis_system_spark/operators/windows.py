"""Conversation-window aggregates (the graft's north-star operators).

The reference has no ranking/lead-lag (SURVEY §2.5); the transcript payload
adds them: stable ``(conv_id, turn_idx)`` ordering, turns-per-conversation,
tool-invocation counts, and per-conversation alert rates, all via Spark SQL
window functions partitioned by ``conv_id``.

Scale note (SURVEY §7.3.7): per-conv windows shuffle on ``conv_id``; hot
conversations are bounded by max conversation length, and order-insensitive
aggregates get the salted two-phase variant in ``salted_turn_counts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turns_per_conversation(transcripts: DataFrame) -> DataFrame:
    """Per-conv turn counts + role mix; one shuffle on conv_id."""
    return transcripts.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user_turns"),
        F.sum((F.col("role") == "assistant").cast("long")).alias("n_assistant_turns"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def tool_invocation_counts(transcripts: DataFrame) -> DataFrame:
    """Tool usage histogram across all conversations."""
    return (
        transcripts.where(F.col("tool").isNotNull())
        .groupBy("tool")
        .agg(
            F.count("*").alias("n_invocations"),
            F.countDistinct("conv_id").alias("n_conversations"),
        )
    )


def turn_ordering_check(transcripts: DataFrame) -> DataFrame:
    """Stable-order invariant: within each conv, row_number ordered by
    turn_idx equals turn_idx+1 (dense, unique). Returns violating rows
    (empty = invariant holds)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    checked = transcripts.select(
        "conv_id",
        "turn_idx",
        (F.row_number().over(w) - 1).alias("expected_idx"),
    )
    return checked.where(F.col("turn_idx") != F.col("expected_idx"))


def turn_gaps(transcripts: DataFrame) -> DataFrame:
    """lead/lag over (conv_id, turn_idx): inter-turn latency per turn."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.lag("ts").over(w).alias("prev_ts"),
        "ts",
    ).withColumn(
        "gap_seconds",
        F.when(
            F.col("prev_ts").isNotNull(),
            F.col("ts").cast("double") - F.col("prev_ts").cast("double"),
        ),
    )


def conversation_alert_rates(
    transcripts: DataFrame, events: DataFrame
) -> DataFrame:
    """Per-conversation alert rate: security events per turn. Events carry
    (conv_id, turn_idx) lineage; aggregate both sides THEN join so the join
    input is one row per conv (shuffle-light)."""
    turns = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    alerts = (
        events.where(F.col("conv_id").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_alerts"),
            F.sum((F.col("severity") == "high").cast("long")).alias("n_high"),
        )
    )
    return (
        turns.join(alerts, "conv_id", "left")
        .fillna(0, subset=["n_alerts", "n_high"])
        .withColumn(
            "alert_rate", F.col("n_alerts").cast("double") / F.col("n_turns")
        )
    )


def salted_turn_counts(transcripts: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Skew-defused two-phase count (SURVEY §4.1): partial aggregate per
    (conv_id, salt) then merge per conv_id. Correct for order-insensitive
    aggregates; hot conversations spread over ``salt_buckets`` reducers in
    phase 1. Equivalent to turns_per_conversation's counts."""
    salted = transcripts.withColumn(
        "_salt", F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("conv_id", "_salt").agg(
        F.count("*").alias("pc"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("pt"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("pc").alias("n_turns"), F.sum("pt").alias("n_tool_turns")
    )


def conversation_format_detection(
    transcripts_parsed: DataFrame, sample_turns: int = 100
) -> DataFrame:
    """S3 (apache_parser.py:136-186 ``detect_format``), per conversation:
    sample the first ``sample_turns`` turns (0-based ``turn_idx`` — the
    file analog of "read up to 100 lines"), count matches per format, and
    declare the majority format when it covers >= 50% of sampled turns,
    else 'unknown'. Tie-break mirrors the reference's dict iteration order
    (common, combined, combined_time, error)."""
    sampled = transcripts_parsed.where(F.col("turn_idx") < sample_turns)
    counts = sampled.groupBy("conv_id").agg(
        F.count("*").alias("n_sampled"),
        F.sum((F.col("log_format") == "common").cast("long")).alias("c_common"),
        F.sum((F.col("log_format") == "combined").cast("long")).alias("c_combined"),
        F.sum((F.col("log_format") == "combined_time").cast("long")).alias("c_ct"),
        F.sum((F.col("log_format") == "error").cast("long")).alias("c_error"),
    )
    c_cm, c_cb = F.col("c_common"), F.col("c_combined")
    c_ct, c_er = F.col("c_ct"), F.col("c_error")
    best_count = F.greatest(c_cm, c_cb, c_ct, c_er)
    best = (
        F.when((c_cm >= c_cb) & (c_cm >= c_ct) & (c_cm >= c_er), F.lit("common"))
        .when((c_cb >= c_ct) & (c_cb >= c_er), F.lit("combined"))
        .when(c_ct >= c_er, F.lit("combined_time"))
        .otherwise(F.lit("error"))
    )
    detected = F.when(
        (best_count > 0) & (best_count / F.col("n_sampled") >= 0.5), best
    ).otherwise(F.lit("unknown"))
    return counts.select(
        "conv_id", detected.alias("detected_format"), "n_sampled"
    ).orderBy("conv_id")


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """Role-transition matrix: counts of (prev_role -> role) adjacencies in
    stable ``(conv_id, turn_idx)`` order — the conversation-structure
    profile (who speaks after whom, tool-call sandwiches, double-assistant
    turns) a transcript QA pass reads before training; conversation starts
    count under prev_role = '<start>'.

    Scale: one conv_id shuffle for the lag window (hot conversations
    bounded by max conversation length), then a |roles|^2-cell rollup that
    partial-aggregates map-side.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = transcripts.select(
        "conv_id",
        F.coalesce(F.lag("role").over(w), F.lit("<start>")).alias("prev_role"),
        "role",
    )
    return lagged.groupBy("prev_role", "role").agg(
        F.count("*").alias("n"),
        F.count_distinct("conv_id").alias("n_conversations"),
    )


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Hot-key diagnostic: the per-key row-count distribution a 100 TB
    intake inspects BEFORE choosing salt factors / bucket counts (the north
    rule's "salting of hot conversations" needs the hot list first). Emits
    the ``top_n`` heaviest keys with rank, count, share of all rows, and
    the skew multiplier vs the mean key (``x_mean``).

    Scale: one partial-agg shuffle keyed by ``key_col`` (counts only — the
    payload never moves); the (total, n_keys) scalar frame is a 1-row
    broadcast back onto the per-key counts; ranking top-n over the count
    frame uses WindowGroupLimit so each partition forwards at most
    ``top_n`` candidates to the final sort.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.count("*").alias("_n_keys")
    )
    w = Window.orderBy(F.col("n_rows").desc(), F.col(key_col))
    top = (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= top_n)
        .join(F.broadcast(totals))
    )
    return top.select(
        "rank",
        key_col,
        "n_rows",
        F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
        # n * n_keys / total: integer product in BIGINT (exact), one double
        # division — identical expression tree on the oracle side
        F.round(
            (F.col("n_rows") * F.col("_n_keys")).cast("double") / F.col("_total"), 6
        ).alias("x_mean"),
        F.col("_total").alias("total_rows"),
        F.col("_n_keys").alias("n_keys"),
    ).orderBy("rank")


def salted_dim_join(
    transcripts: DataFrame, salt_buckets: int = 16
) -> DataFrame:
    """Skew-defused JOIN (the second half of the north rule's hot-conv
    salting — ``salted_turn_counts`` covers aggregation): join every turn
    to its conversation-level rollup without letting one hot conversation
    pin a single reducer.

    Mechanics: the fact side salts deterministically on ``turn_idx``
    (pmod(xxhash64) — no rand(), so re-runs are identical); the dim side
    EXPLODES into ``salt_buckets`` replicas; the join keys on
    (conv_id, salt), so a conversation with 10^9 turns spreads over
    ``salt_buckets`` reducers instead of one. Dim replication costs
    |dim| x buckets rows — the technique for dims too big to broadcast
    but far smaller than the fact. Output verifies itself: n_joined per
    conversation must equal the dim's own n_turns.
    """
    dim = transcripts.groupBy("conv_id").agg(F.count("*").alias("n_turns"))
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    fact = transcripts.select(
        "conv_id",
        "turn_idx",
        F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)).alias("_salt"),
    )
    joined = fact.join(salted_dim, ["conv_id", "_salt"])
    return joined.groupBy("conv_id").agg(
        F.count("*").alias("n_joined"),
        F.min("n_turns").alias("n_turns"),
    )


CONTEXT_TURNS = 3  # preceding turns assembled per training example


def conversation_context(
    transcripts: DataFrame, n_context: int = CONTEXT_TURNS
) -> DataFrame:
    """Training-example assembly: for every turn, gather the previous
    ``n_context`` turns of the same conversation into one
    ``role: text``-formatted context block (newline-joined, oldest
    first) — the (context, target) pair construction step for
    instruction-tuning data built from agent transcripts.

    The first turn of a conversation has no context -> NULL (both
    engines agree: an empty window frame aggregates to NULL).

    Null semantics are aligned cross-engine BY CONSTRUCTION: each line is
    built with null-propagating ``concat`` (matching SQL ``||``, NOT
    ``concat_ws`` which skips NULL args), so a turn with NULL role or
    text contributes a NULL line; ``collect_list`` then skips it exactly
    as ``string_agg`` does. ``n_context_turns`` counts the FRAME
    (``count(*)``-equivalent), not the surviving lines, on both engines.

    Scale shape: ONE shuffle on conv_id, then a rows-bounded window
    frame (BETWEEN n PRECEDING AND 1 PRECEDING) — per-row state is
    bounded by ``n_context`` lines x turn length, never by conversation
    length, so a 10^9-turn hot conversation streams through the frame
    without accumulating it. collect_list over a *bounded* frame is the
    allowlisted exception to the no-per-group-arrays rule
    (test_plans.py): the array is O(n_context), not O(group).
    """
    line = F.concat("role", F.lit(": "), "text")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-n_context, -1)
    )
    ctx_lines = F.collect_list(line).over(w)
    return transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.when(
            F.size(ctx_lines) > 0, F.array_join(ctx_lines, "\n")
        ).alias("context"),
        F.count(F.lit(1)).over(w).cast("int").alias("n_context_turns"),
    )
