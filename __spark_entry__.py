"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (grok-parse the transcript payload
derived from events, then the per-endpoint performance report — the
reference's ``database.py:322-363`` / ``performance.py:60-74`` semantics).

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with a DuckDB oracle over the shared parquet views.

Registry ordering is deliberate: the driver's correctness gate checks the
FIRST 50 entries in iteration order. Round-5 rotation (VERDICT.md r4
next-round items #1-#2): ``_DRIVER_WINDOW`` front-loads

(a) the 38 staleness-bound must-includes — every oracle-paired query whose
most recent driver row is round 2. ``tools/coverage_ledger.py --next-plan``
emitted exactly this list; left outside the r5 window their staleness
would reach 4 rounds at the post-r5 ledger read, past the 3-round bound
that 153 registered queries over a 50-slot window arithmetically allow.

(b) the 12 TPC-H completion shapes promoted into the registry this round
(``queries_tpch.PROMOTED`` — Q2, Q7-Q11, Q15-Q17, Q19-Q21), taking their
first driver rows. They fill the remaining 12 slots exactly; the 13th
completion shape, ``tpch_shipping_delays`` (Q12), stays pytest-gated in
``queries_tpch.EXTRA_QUERIES`` (rationale at the promotion block there:
the never-covered rule forbids registering without a slot, and Q12's
conditional-aggregation family already has driver-green representatives).

Rotated OUT relative to round 4: the full r4 window (all green in
CORRECTNESS_r04.json, staleness 1) including — per VERDICT r4
"What's wrong" #1 — the two permanently-``no_oracle`` sketch queries
``approx_distinct_daily`` / ``value_percentiles_approx``, which can never
produce a green hash row; their value evidence is the r3-green
oracle-paired check wrappers ``approx_distinct_check`` /
``percentiles_approx_check`` (exact+sketch compared in one frame).
Every rotated-out query stays registered and is re-verified by the local
replica gate (``tools/check_correctness.py``) + pytest each round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from log_analysis_system_spark.queries_log import ORACLES as _LOG_ORACLES
from log_analysis_system_spark.queries_log import QUERIES as _LOG_QUERIES

# First 50 = the driver's correctness window (see module docstring).
_DRIVER_WINDOW = [
    # (a) the 38 staleness-bound must-includes: every oracle-paired query
    # whose most recent driver row is r2 (tools/coverage_ledger.py
    # --next-plan emitted exactly this list) — outside the r5 window their
    # staleness would reach 4 rounds at the post-r5 ledger read, past the
    # 3-round bound. Grouped by family.
    #   transcript front door + parse
    "transcripts_roundtrip",
    "parsed_turns_pandas",
    "format_detection",
    #   performance aggregates (A1-A10, A15-A16, S10-S11)
    "status_counts",
    "overall_response_stats",
    "slow_endpoints",
    "performance_metrics",
    "overall_error_rate",
    "error_endpoints",
    "traffic_hourly",
    "peak_traffic",
    "error_rate_5min",
    "timeframe_logs",
    "error_timeframe_logs",
    "endpoint_stats_timeframe",
    "daily_summary",
    #   security detectors (J1-J4, A11-A13)
    "brute_force",
    "suspicious_ips",
    "unusual_methods",
    #   anomaly (W1)
    "zscore_anomalies",
    "per_conv_zscore",
    #   transcript windows / skew / enrichment
    "turns_per_conversation",
    "tool_invocations",
    "turn_gaps",
    "turn_ordering_check",
    "conversation_alert_rates",
    "salted_turn_counts",
    "pii_redaction",
    "enriched_status_counts",
    "enriched_role_counts",
    #   dedup + ANN exact baselines
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "ann_topk_cosine",
    "ann_topk_cosine_np",
    "ann_ivf_fullprobe",
    # (b) the 12 TPC-H completion shapes promoted into the registry this
    # round (queries_tpch.PROMOTED; VERDICT r4 item #1) — first driver
    # rows. They fill the 12 free slots exactly; tpch_shipping_delays
    # (Q12) stays pytest-gated in EXTRA_QUERIES (rationale at the
    # promotion block in queries_tpch.py). The two permanently-no_oracle
    # sketch queries (approx_distinct_daily, value_percentiles_approx)
    # rotate OUT per VERDICT item "What's wrong" #1 — their value
    # evidence remains the r3-green oracle-paired check wrappers.
    "tpch_volume_shipping",
    "tpch_market_share",
    "tpch_product_profit",
    "tpch_returned_items",
    "tpch_important_parts",
    "tpch_top_supplier",
    "tpch_parts_suppliers",
    "tpch_small_qty_revenue",
    "tpch_discounted_revenue",
    "tpch_min_cost_supplier",
    "tpch_dominant_suppliers",
    "tpch_waiting_suppliers",
]



def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _LOG_QUERIES["endpoint_stats"](spark, "/root/testdata/sf0.001")


def _merged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(_LOG_QUERIES)
    for mod in ("queries_data", "queries_events", "queries_tpch", "queries_checks"):
        try:
            m = __import__(f"log_analysis_system_spark.{mod}", fromlist=["QUERIES"])
            out.update(m.QUERIES)
        except ImportError:
            pass
    return out


def _reorder(d: dict, require_all: bool = True) -> dict:
    # hard-fail on a missing window entry: a silent ImportError in a query
    # module would otherwise SHIFT the driver's first-50 window and change
    # which queries get correctness rows. oracle_sql() passes
    # require_all=False — two in-window sketch queries (approx_distinct_daily,
    # value_percentiles_approx) have no oracle BY DESIGN and must not trip it.
    missing = [n for n in _DRIVER_WINDOW if n not in d]
    if missing and require_all:
        raise RuntimeError(f"driver-window queries missing from registry: {missing}")
    front = {n: d[n] for n in _DRIVER_WINDOW if n in d}
    rest = {n: v for n, v in d.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reorder(_merged_queries())


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_LOG_ORACLES)
    for mod in ("queries_data", "queries_events", "queries_tpch", "queries_checks"):
        try:
            m = __import__(f"log_analysis_system_spark.{mod}", fromlist=["ORACLES"])
            out.update(m.ORACLES)
        except ImportError:
            pass
    return _reorder(out, require_all=False)
