"""PySpark-native log/telemetry analytics engine.

A from-scratch rebuild of the capabilities of the reference system
``ketankshukla/log_analysis_system`` (grok/regex parse -> lookup enrich ->
threshold/pattern alert-route -> windowed aggregate -> fan-out sinks), grafted
onto multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts) and expressed Spark-first:
DataFrame/SQL plans optimized by Catalyst, vectorized pandas/Arrow UDFs for
the grok stage, broadcast joins for dimensions, window functions ordered by
(conv_id, turn_idx), and explicit partition/skew/state handling for
trillion-turn scale.
"""

__version__ = "0.1.0"
