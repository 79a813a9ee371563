"""Analyzer goldens ported from /root/reference/tests/test_analyzers.py
(5-row fixture: mean≈0.52, error_rate=0.4, status counts {200:3,404:1,500:1})
and the suspicious-logs security fixture (:369-438)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from log_analysis_system_spark.functions.parse import parse_transcripts
from log_analysis_system_spark.operators import performance as perf
from log_analysis_system_spark.operators import security as sec

from tests.conftest import access_line, make_transcripts

# the reference's 5-row fixture (test_analyzers.py:196-237) rendered as
# combined_time log lines
FIXTURE = [
    ("192.168.1.1", "10/Oct/2023:13:55:36", "GET", "/index.html", 200, 0.1),
    ("192.168.1.2", "10/Oct/2023:13:56:30", "GET", "/about.html", 200, 0.2),
    ("192.168.1.3", "10/Oct/2023:13:57:15", "GET", "/api/data", 200, 0.8),
    ("192.168.1.4", "10/Oct/2023:13:58:20", "POST", "/api/data", 500, 1.2),
    ("192.168.1.5", "10/Oct/2023:13:59:10", "GET", "/api/data", 404, 0.3),
]

# the reference's suspicious fixture (test_analyzers.py:369-410)
SUSPICIOUS = [
    ("192.168.1.1", "GET", "/index.html", 200, 0.1),
    ("192.168.1.100", "GET", "/admin/login.php", 404, 0.2),
    ("192.168.1.100", "GET", "/../../../etc/passwd", 403, 0.3),
    ("192.168.1.101", "GET", "/page.php?id=1+UNION+SELECT+username,password+FROM+users", 500, 0.4),
    ("192.168.1.101", "GET", "/page?<script>alert(xss)</script>", 200, 0.5),
]


@pytest.fixture(scope="module")
def parsed5(spark):
    rows = [
        (
            "c1",
            i,
            "user",
            access_line(
                ip=ip,
                ts=f"{ts} -0700",
                method=m,
                endpoint=e,
                status=s,
                referer="r",
                user_agent="ua",
                response_time=f"{rt:.3f}",
            ),
            None,
            "2023-10-10 13:55:36",
        )
        for i, (ip, ts, m, e, s, rt) in enumerate(FIXTURE)
    ]
    df = parse_transcripts(make_transcripts(spark, rows))
    df.persist()
    yield df
    df.unpersist()


def test_overall_mean(parsed5):
    stats = perf.overall_response_stats(parsed5).collect()[0]
    # test_analyzers.py:255
    assert abs(stats["mean"] - 0.52) < 1e-9
    assert stats["max"] == 1.2


def test_status_counts(parsed5):
    counts = {r.status: r.n for r in perf.status_counts(parsed5).collect()}
    # test_analyzers.py:280-282
    assert counts == {200: 3, 500: 1, 404: 1}


def test_error_rate(parsed5):
    r = perf.overall_error_rate(parsed5).collect()[0]
    assert r.error_rate == 0.4  # test_analyzers.py:286


def test_slow_endpoints(parsed5):
    slow = {r.endpoint for r in perf.slow_endpoints(parsed5).collect()}
    # /api/data mean = (0.8+1.2+0.3)/3 = 0.7667 > 0.5 (config.yaml:18)
    assert slow == {"/api/data"}


def test_error_endpoints(parsed5):
    rows = {r.endpoint: r for r in perf.error_endpoints(parsed5).collect()}
    assert set(rows) == {"/api/data"}
    assert rows["/api/data"].error_count == 2
    assert rows["/api/data"].total_count == 3


def test_performance_metrics_min_support(parsed5):
    # every endpoint has <5 requests -> no metrics (performance.py:82)
    assert perf.performance_metrics(parsed5).count() == 0


@pytest.fixture(scope="module")
def parsed_suspicious(spark):
    rows = [
        (
            "c1",
            i,
            "user",
            access_line(
                ip=ip, method=m, endpoint=e, status=s,
                response_time=f"{rt:.3f}", referer="r", user_agent="ua",
            ),
            None,
            "2023-10-10 13:55:36",
        )
        for i, (ip, m, e, s, rt) in enumerate(SUSPICIOUS)
    ]
    return parse_transcripts(make_transcripts(spark, rows))


def test_attack_detection(spark, parsed_suspicious):
    events = sec.attack_events(parsed_suspicious).collect()
    by_ep = {e.endpoint: e for e in events}
    # ../.. fires on the traversal endpoint; first-match-wins ordering:
    # UNION SELECT line matches 'SELECT.*FROM' (listed before 'UNION.*SELECT')
    assert any("/etc/passwd" in ep or "../" in ep for ep in by_ep)
    union_ev = [e for e in events if "UNION" in e.endpoint]
    assert union_ev and "SELECT.*FROM" in union_ev[0].description
    # reference-faithful subtlety: '../..' is a REGEX ('.' = any char), so
    # ')</sc' inside '</script>' matches it, and it precedes '<script>' in
    # the pattern list (config.yaml:26-31) -> first-match-wins picks '../..'
    script_ev = [e for e in events if "script" in e.endpoint]
    assert script_ev and "../.." in script_ev[0].description
    assert all(e.severity == "high" for e in events)


def test_threat_scores(spark, parsed_suspicious):
    events = sec.all_security_events(parsed_suspicious)
    scores = {r.ip_address: r for r in sec.ip_threat_scores(events).collect()}
    assert "192.168.1.100" in scores
    assert "192.168.1.101" in scores
    # severity weights: high=10 (security.py:346-350)
    assert scores["192.168.1.101"].score >= 20
    assert scores["192.168.1.101"].threat_level == "high"


def test_brute_force_threshold(spark):
    # 5 failed logins from one IP -> exactly one event (security.py:279)
    rows = [
        (
            "c1",
            i,
            "user",
            access_line(
                ip="10.0.0.9", endpoint="/login", status=401,
                referer="r", user_agent="ua", response_time="0.100",
            ),
            None,
            "2023-10-10 13:55:36",
        )
        for i in range(5)
    ] + [
        (
            "c1",
            5,
            "user",
            access_line(
                ip="10.0.0.8", endpoint="/login", status=401,
                referer="r", user_agent="ua", response_time="0.100",
            ),
            None,
            "2023-10-10 13:55:36",
        )
    ]
    parsed = parse_transcripts(make_transcripts(spark, rows))
    events = sec.brute_force_events(parsed).collect()
    assert len(events) == 1
    assert events[0].ip_address == "10.0.0.9"
    assert "5 failed login attempts" in events[0].description


def test_unusual_methods(spark):
    rows = [
        ("c1", 0, "user", access_line(method="DELETE", ip="10.0.0.1"), None,
         "2023-10-10 13:55:36"),
        ("c1", 1, "user", access_line(method="GET", ip="10.0.0.1"), None,
         "2023-10-10 13:55:36"),
        ("c1", 2, "user", access_line(method="TRACE", ip="10.0.0.2"), None,
         "2023-10-10 13:55:36"),
    ]
    parsed = parse_transcripts(make_transcripts(spark, rows))
    events = sec.unusual_method_events(parsed).collect()
    assert {(e.ip_address, e.description.split()[3]) for e in events} == {
        ("10.0.0.1", "DELETE"),
        ("10.0.0.2", "TRACE"),
    }
    assert all(e.severity == "medium" for e in events)


def test_suspicious_ip_broadcast_join(spark):
    rows = [
        ("c1", 0, "user", access_line(ip="45.33.10.20", endpoint="/a"), None,
         "2023-10-10 13:55:36"),
        ("c1", 1, "user", access_line(ip="45.33.10.20", endpoint="/b"), None,
         "2023-10-10 13:55:36"),
        ("c1", 2, "user", access_line(ip="1.2.3.4"), None,
         "2023-10-10 13:55:36"),
    ]
    parsed = parse_transcripts(make_transcripts(spark, rows))
    events = sec.suspicious_ip_events(parsed).collect()
    assert len(events) == 1
    e = events[0]
    assert e.ip_address == "45.33.10.20"
    assert e.endpoint == "/a"  # deterministic first by (conv_id, turn_idx)
    assert "(2 requests)" in e.description


def test_endpoint_method_rollup_levels(parsed5):
    got = perf.endpoint_method_rollup(parsed5).collect()
    by_lvl = {}
    for r in got:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # finest level: 4 (endpoint, method) cells
    fine = {(r["endpoint"], r["method"]): r for r in by_lvl[0]}
    assert len(fine) == 4
    assert fine[("/api/data", "GET")]["n_requests"] == 2
    assert fine[("/api/data", "GET")]["n_errors"] == 1
    assert fine[("/api/data", "POST")]["n_errors"] == 1
    # endpoint subtotals: method IS NULL
    sub = {r["endpoint"]: r for r in by_lvl[1]}
    assert all(r["method"] is None for r in by_lvl[1])
    assert sub["/api/data"]["n_requests"] == 3
    assert sub["/api/data"]["n_errors"] == 2
    # grand total reproduces the reference's 5-row goldens
    (gt,) = by_lvl[3]
    assert gt["endpoint"] is None and gt["method"] is None
    assert gt["n_requests"] == 5 and gt["n_errors"] == 2
    assert abs(gt["mean_time"] - 0.52) < 1e-9


def test_traffic_status_pivot_dense_matrix(parsed5):
    got = perf.traffic_status_pivot(parsed5).collect()
    by_hour = {r["hour"]: r for r in got}
    # fixture hours 13 only; statuses 200x3, 404, 500
    assert set(by_hour) == {13}
    r = by_hour[13]
    assert (r["c2xx"], r["c3xx"], r["c4xx"], r["c5xx"], r["other"]) == (
        3, 0, 1, 1, 0,
    )


def test_ip_overlap_sets_partition(parsed5):
    # fixture: errors from .4 (500, rt 1.2) and .5 (404, rt 0.3);
    # slow (>1.0s) only .4 -> both={.4}, error_only={.5}, slow_only={}
    got = {r["ip_class"]: r["n_ips"] for r in perf.ip_overlap_sets(parsed5).collect()}
    assert got == {"both": 1, "error_only": 1, "slow_only": 0}


def test_traffic_sliding_four_windows_per_row(parsed5):
    # all 5 fixture rows sit inside one 5-minute span (13:55-13:59), so
    # they share the same 4 sliding windows (1h window, 15min slide)
    got = perf.traffic_sliding(parsed5).collect()
    assert len(got) == 4
    starts = [r["window_start"] for r in got]
    assert all(s % 900 == 0 for s in starts)
    assert [s2 - s1 for s1, s2 in zip(starts, starts[1:])] == [900, 900, 900]
    assert all(r["n_requests"] == 5 for r in got)
