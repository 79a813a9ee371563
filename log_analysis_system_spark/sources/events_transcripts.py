"""Deterministic events -> transcripts derivation, in two SQL dialects.

The driver's correctness oracle (DuckDB) only sees the shared parquet views
(``events`` et al.), not our transcripts table. So for the correctness gate we
*derive* the transcripts table — schema per BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` — as a pure deterministic function of the ``events`` table,
rendered as Apache-format log lines (the reference's grok surface,
``/root/reference/config/patterns.yaml:6-15``).

The same derivation is emitted in Spark SQL and in DuckDB SQL from one
template, so the two sides are byte-identical by construction; a pytest
asserts per-turn ``text`` byte-equality under ``(conv_id, turn_idx)`` order
(the BASELINE.json invariant).

Format mix per FIXTURES.md: slot = event_id %% 20 ->
0-10 combined_time (55%%), 11-14 combined (20%%), 15-17 common (15%%),
18 error (5%%), 19 malformed (5%%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import DANGEROUS_METHODS, SUSPICIOUS_IPS

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "browser", "python", "bash"]

# 23 endpoints; indices (1-based) 14-16 hit the reference's login keywords,
# 17-19 its attack patterns, 20-23 its scan patterns (config/config.yaml:25-38).
ENDPOINTS = [
    "/index.html",
    "/api/users",
    "/api/orders",
    "/api/products",
    "/checkout",
    "/profile",
    "/images/logo.png",
    "/static/app.js",
    "/search?q=spark",
    "/docs/guide.html",
    "/api/items?id=1",
    "/health",
    "/metrics",
    "/login",
    "/admin/login",
    "/wp-login.php",
    "/search?q=SELECT+*+FROM+users",
    "/files/../../etc/passwd",
    "/comment?text=<script>alert(1)</script>",
    "/.env",
    "/wp-admin/setup.php",
    "/.git/config",
    "/phpMyAdmin/index.php",
]

STATUSES = [
    "200", "200", "200", "200", "200", "301", "304", "201",
    "400", "401", "403", "404", "405", "500", "502", "503",
]

USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64)",
    "curl/8.5.0",
    "python-requests/2.31.0",
]

ERROR_LEVELS = ["error", "warn", "notice"]
ERROR_MODULES = ["core", "mpm_prefork", "ssl", "rewrite"]
ERROR_MESSAGES = [
    "File does not exist: /var/www/html/favicon.ico",
    "client denied by server configuration",
    "script timed out before returning headers",
    "Directory index forbidden by Options directive",
    "Invalid method in request",
]

_SPARK = {
    "STR": "STRING",
    "el": lambda items, idx: "element_at(array({}), CAST({} AS INT))".format(
        ", ".join("'" + i.replace("'", "''") + "'" for i in items), idx
    ),
    "idiv": lambda a, b: f"({a} div {b})",
    "ts_access": "date_format(ts, 'dd/MMM/yyyy:HH:mm:ss')",
    "ts_error": "date_format(ts, 'EEE MMM dd HH:mm:ss yyyy')",
    "fmt": "format_string",
}

_DUCKDB = {
    "STR": "VARCHAR",
    "el": lambda items, idx: "(['{}'])[{}]".format(
        "', '".join(i.replace("'", "''") for i in items), idx
    ),
    "idiv": lambda a, b: f"({a} // {b})",
    "ts_access": "strftime(ts, '%d/%b/%Y:%H:%M:%S')",
    "ts_error": "strftime(ts, '%a %b %d %H:%M:%S %Y')",
    "fmt": "printf",
}


def _parts(d: dict) -> dict[str, str]:
    """Field-level sub-expressions for one dialect (shared by the text
    renderer and the DuckDB parsed-oracle)."""
    s = d["STR"]
    el, idiv = d["el"], d["idiv"]

    ip = (
        "CASE WHEN event_id % 37 = 0 THEN {} ELSE '192.168.' || "
        "CAST(user_id % 200 AS {}) || '.' || CAST(user_id % 97 + 1 AS {}) END"
    ).format(el(SUSPICIOUS_IPS, f"{idiv('event_id', 37)} % 7 + 1"), s, s)

    method = (
        "CASE WHEN event_id % 16 < 10 THEN 'GET' "
        "WHEN event_id % 16 < 13 THEN 'POST' "
        "WHEN event_id % 16 = 13 THEN 'HEAD' "
        "WHEN event_id % 16 = 14 THEN {} "
        "ELSE 'POST' END"
    ).format(el(DANGEROUS_METHODS, f"{idiv('event_id', 16)} % 5 + 1"))

    endpoint = el(ENDPOINTS, "event_id % 23 + 1")
    status = el(STATUSES, "event_id % 16 + 1")
    bytes_sent = (
        "CASE WHEN event_id % 17 = 0 THEN '-' "
        f"ELSE CAST(event_id % 5000 AS {s}) END"
    )
    referer = f"'http://example.com/page' || CAST(event_id % 10 AS {s})"
    user_agent = el(USER_AGENTS, "event_id % 3 + 1")
    # response-time outliers (z>3 anomalies) every 101st event
    rt_ms = (
        "CASE WHEN event_id % 101 = 0 THEN 5000 + event_id % 1000 "
        "ELSE 50 + event_id % 400 END"
    )
    return {
        "ip": ip,
        "method": method,
        "endpoint": endpoint,
        "status": status,
        "bytes_sent": bytes_sent,
        "referer": referer,
        "user_agent": user_agent,
        "rt_ms": rt_ms,
        "err_level": el(ERROR_LEVELS, "event_id % 3 + 1"),
        "err_module": el(ERROR_MODULES, "event_id % 4 + 1"),
        "err_pid": f"'pid ' || CAST(1000 + event_id % 9000 AS {s})",
        "err_message": el(ERROR_MESSAGES, "event_id % 5 + 1"),
        "role": el(ROLES, "event_id % 4 + 1"),
        "tool": "CASE WHEN event_id % 4 = 3 THEN {} END".format(
            el(TOOLS, f"{idiv('event_id', 4)} % 4 + 1")
        ),
        "conv_id": f"'conv-' || lpad(CAST(user_id AS {s}), 8, '0')",
    }


def _exprs(d: dict) -> dict[str, str]:
    """Transcript column expressions (conv_id..ts) for one dialect."""
    p = _parts(d)
    idiv, fmt = d["idiv"], d["fmt"]
    ip, method, endpoint, status = p["ip"], p["method"], p["endpoint"], p["status"]
    bytes_sent, referer, user_agent = p["bytes_sent"], p["referer"], p["user_agent"]
    rt_ms = p["rt_ms"]
    rt = f"{fmt}('%d.%03d', {idiv(rt_ms, 1000)}, ({rt_ms}) % 1000)"

    request = (
        f"'\"' || {method} || ' ' || {endpoint} || ' HTTP/1.1\" ' || {status}"
        f" || ' ' || {bytes_sent}"
    )
    common = (
        f"{ip} || ' - - [' || {d['ts_access']} || ' -0700] ' || {request}"
    )
    combined = (
        f"{common} || ' \"' || {referer} || '\" \"' || {user_agent} || '\"'"
    )
    combined_time = f"{combined} || ' ' || {rt}"

    error_line = (
        f"'[' || {d['ts_error']} || '] [' || {p['err_level']}"
        f" || '] [' || {p['err_module']}"
        f" || '] [' || {p['err_pid']} || '] '"
        f" || {p['err_message']}"
    )
    malformed = (
        f"'This is not a valid log line #' || CAST(event_id AS {d['STR']})"
    )

    text = (
        "CASE WHEN event_id % 20 <= 10 THEN {ct} "
        "WHEN event_id % 20 <= 14 THEN {c} "
        "WHEN event_id % 20 <= 17 THEN {cm} "
        "WHEN event_id % 20 = 18 THEN {err} "
        "ELSE {bad} END"
    ).format(ct=combined_time, c=combined, cm=common, err=error_line, bad=malformed)

    turn_idx = (
        "CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 "
        "AS INT)"
    )
    return {
        "conv_id": p["conv_id"],
        "turn_idx": turn_idx,
        "role": p["role"],
        "text": text,
        "tool": p["tool"],
        "ts": "ts",
    }


def render_transcripts(events_df: DataFrame) -> DataFrame:
    """Spark-side derivation: events -> transcripts, all JVM built-ins."""
    e = _exprs(_SPARK)
    return events_df.selectExpr(
        *(f"{expr} AS {name}" for name, expr in e.items())
    )


def duckdb_transcripts_cte(extended: bool = False) -> str:
    """`WITH transcripts AS (...)` body for the DuckDB oracle, reading the
    pre-registered ``events`` view. ``extended`` keeps event_id/user_id for
    the downstream parsed-oracle CTE."""
    e = _exprs(_DUCKDB)
    cols = ",\n    ".join(f"{expr} AS {name}" for name, expr in e.items())
    extra = ",\n    event_id, user_id" if extended else ""
    return f"SELECT\n    {cols}{extra}\nFROM events"


def duckdb_parsed_cte() -> str:
    """Independent DuckDB oracle for the parse stage: the reference-semantics
    parsed fields derived from the *event formulas* (never from regex), so
    the Spark render+grok round trip is checked against an independent path.
    Reads the extended transcripts CTE (needs event_id/user_id)."""
    p = _parts(_DUCKDB)
    slot = "(event_id % 20)"
    acc = f"{slot} <= 17"
    rich = f"{slot} <= 14"
    ct = f"{slot} <= 10"
    err = f"{slot} = 18"
    status_int = "([200,200,200,200,200,301,304,201,400,401,403,404,405,500,502,503])[CAST(event_id % 16 + 1 AS INT)]"
    fields = {
        "log_format": (
            f"CASE WHEN {ct} THEN 'combined_time' WHEN {rich} THEN 'combined' "
            f"WHEN {acc} THEN 'common' WHEN {err} THEN 'error' END"
        ),
        "log_type": f"CASE WHEN {acc} THEN 'access' WHEN {err} THEN 'error' END",
        "ip_address": f"CASE WHEN {acc} THEN {p['ip']} END",
        "ts_parsed": f"CASE WHEN {slot} <= 18 THEN date_trunc('second', ts) END",
        "method": f"CASE WHEN {acc} THEN {p['method']} END",
        "endpoint": f"CASE WHEN {acc} THEN {p['endpoint']} END",
        "protocol": f"CASE WHEN {acc} THEN 'HTTP/1.1' END",
        "status": f"CASE WHEN {acc} THEN CAST({status_int} AS INT) END",
        "bytes_sent": (
            f"CASE WHEN {acc} THEN CAST(CASE WHEN event_id % 17 = 0 THEN 0 "
            f"ELSE event_id % 5000 END AS BIGINT) END"
        ),
        "referer": f"CASE WHEN {rich} THEN {p['referer']} END",
        "user_agent": f"CASE WHEN {rich} THEN {p['user_agent']} END",
        "response_time": (
            f"CASE WHEN {ct} THEN ({p['rt_ms']}) / 1000.0 "
            f"WHEN {acc} THEN 0.0 END"
        ),
        "level": f"CASE WHEN {err} THEN {p['err_level']} END",
        "module": f"CASE WHEN {err} THEN {p['err_module']} END",
        "pid": f"CASE WHEN {err} THEN {p['err_pid']} END",
        "message": f"CASE WHEN {err} THEN {p['err_message']} END",
    }
    cols = ",\n    ".join(f"{expr} AS {name}" for name, expr in fields.items())
    return (
        "SELECT\n    conv_id, turn_idx, role, tool, ts, text,\n    "
        + cols
        + "\nFROM transcripts"
    )


def oracle_prefix() -> str:
    """The shared `WITH ...` prefix for every transcript-pipeline oracle SQL:
    `transcripts` (6-column contract + ids) and `parsed` CTEs over the
    driver's pre-registered ``events`` view."""
    return (
        f"WITH transcripts AS ({duckdb_transcripts_cte(extended=True)}),\n"
        f"parsed AS ({duckdb_parsed_cte()})\n"
    )
