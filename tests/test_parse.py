"""Parse-stage unit tests porting the reference's literal assertions
(/root/reference/tests/test_parsers.py:18-93) plus coercion edge cases
(apache_parser.py:68-99), run through BOTH parse engines."""

from __future__ import annotations

from datetime import datetime

import pytest

from log_analysis_system_spark.functions.parse import parse_transcripts

from tests.conftest import access_line, make_transcripts

# the reference's own sample lines (tests/test_parsers.py:18-21)
COMMON = '192.168.1.1 - john [10/Oct/2023:13:55:36 -0700] "GET /index.html HTTP/1.1" 200 2326'
COMBINED = (
    '192.168.1.1 - john [10/Oct/2023:13:55:36 -0700] "GET /index.html HTTP/1.1" '
    '200 2326 "http://example.com/start.html" "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"'
)
COMBINED_TIME = COMBINED + " 0.005"
ERROR_LINE = (
    "[Wed Oct 11 14:32:52 2023] [error] [core] [pid 1234] "
    "File does not exist: /var/www/html/favicon.ico"
)
MALFORMED = "This is not a valid log line"


def _parse_one(spark, text, engine):
    df = make_transcripts(
        spark, [("c1", 0, "user", text, None, "2023-10-10 13:55:36")]
    )
    return parse_transcripts(df, engine=engine).collect()[0]


@pytest.mark.parametrize("engine", ["sql", "pandas"])
class TestParse:
    def test_common(self, spark, engine):
        r = _parse_one(spark, COMMON, engine)
        assert r.log_format == "common"
        assert r.log_type == "access"
        assert r.ip_address == "192.168.1.1"
        assert r.method == "GET"
        assert r.endpoint == "/index.html"
        assert r.protocol == "HTTP/1.1"
        assert r.status == 200
        assert r.bytes_sent == 2326
        # tz token discarded (apache_parser.py:71)
        assert r.ts_parsed == datetime(2023, 10, 10, 13, 55, 36)
        # absent response_time -> 0.0, NOT null (apache_parser.py:98-99)
        assert r.response_time == 0.0
        assert r.referer is None and r.user_agent is None

    def test_combined(self, spark, engine):
        r = _parse_one(spark, COMBINED, engine)
        assert r.log_format == "combined"
        assert r.referer == "http://example.com/start.html"
        assert r.user_agent == "Mozilla/5.0 (Windows NT 10.0; Win64; x64)"
        assert r.response_time == 0.0

    def test_combined_time(self, spark, engine):
        r = _parse_one(spark, COMBINED_TIME, engine)
        assert r.log_format == "combined_time"
        assert r.response_time == 0.005

    def test_error(self, spark, engine):
        r = _parse_one(spark, ERROR_LINE, engine)
        assert r.log_format == "error"
        assert r.log_type == "error"
        assert r.level == "error"
        assert r.module == "core"
        assert r.pid == "pid 1234"  # whole bracket content (patterns.yaml:15)
        assert r.message == "File does not exist: /var/www/html/favicon.ico"
        assert r.ts_parsed == datetime(2023, 10, 11, 14, 32, 52)
        assert r.ip_address is None and r.status is None

    def test_malformed_and_empty(self, spark, engine):
        for text in [MALFORMED, "", "   "]:
            r = _parse_one(spark, text, engine)
            assert r.log_format is None
            assert r.log_type is None

    def test_bytes_dash_to_zero(self, spark, engine):
        r = _parse_one(spark, access_line(nbytes="-"), engine)
        assert r.bytes_sent == 0  # apache_parser.py:85-86

    def test_bad_timestamp_null(self, spark, engine):
        r = _parse_one(
            spark, access_line(ts="99/Zzz/2023:99:99:99 -0700"), engine
        )
        assert r.log_format == "common"
        assert r.ts_parsed is None  # apache_parser.py:74-76

    def test_cascade_priority(self, spark, engine):
        # a combined_time line also matches combined and common; the cascade
        # must pick the most specific (apache_parser.py:57-62)
        r = _parse_one(spark, COMBINED_TIME, engine)
        assert r.log_format == "combined_time"


def test_engines_identical(spark):
    lines = [
        COMMON, COMBINED, COMBINED_TIME, ERROR_LINE, MALFORMED, "",
        access_line(nbytes="-"), access_line(status=503),
        access_line(referer="", user_agent=""),  # empty capture groups
    ]
    rows = [
        ("c1", i, "user", t, None, "2023-10-10 13:55:36")
        for i, t in enumerate(lines)
    ]
    df = make_transcripts(spark, rows)
    a = parse_transcripts(df, engine="sql").orderBy("turn_idx").collect()
    b = parse_transcripts(df, engine="pandas").orderBy("turn_idx").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
