"""Anomaly-detector semantics tests (ddof traps, min-points gate) mirroring
/root/reference/tests/test_alerting.py and detector.py behavior."""

from __future__ import annotations

import numpy as np


def _zscore_pop(a):
    """scipy.stats.zscore semantics (ddof=0 — detector.py:54) without scipy
    (not installed here)."""
    a = np.asarray(a, dtype=float)
    return (a - a.mean()) / a.std(ddof=0)

from log_analysis_system_spark.functions.parse import parse_transcripts
from log_analysis_system_spark.operators import anomaly as an

from tests.conftest import access_line, make_transcripts


def _parsed_with_rts(spark, rts, status=200):
    rows = [
        (
            "c1",
            i,
            "user",
            access_line(
                status=status, referer="r", user_agent="ua",
                ts=f"10/Oct/2023:13:{55 + i // 60:02d}:{i % 60:02d} -0700",
                response_time=f"{rt:.3f}",
            ),
            None,
            "2023-10-10 13:55:36",
        )
        for i, rt in enumerate(rts)
    ]
    return parse_transcripts(make_transcripts(spark, rows))


def test_zscore_matches_scipy(spark):
    rts = [0.1, 0.12, 0.11, 0.09, 0.13, 0.12, 0.11, 0.10, 0.12, 0.11, 5.0]
    parsed = _parsed_with_rts(spark, rts)
    found = an.response_time_zscore_anomalies(parsed).collect()

    # reference: scipy.stats.zscore (POPULATION std, detector.py:54), |z| > 3
    z = np.abs(_zscore_pop(rts))
    expected_idx = set(np.where(z > 3.0)[0].tolist())
    assert expected_idx == {10}
    assert {r.turn_idx for r in found} == expected_idx
    r = [x for x in found if x.turn_idx == 10][0]
    assert abs(r.z_score - _zscore_pop(rts)[10]) < 1e-9
    assert abs(r.expected_value - np.mean(rts)) < 1e-9
    assert r.actual_value == 5.0


def test_min_data_points_gate(spark):
    # 9 points < min_data_points=10 -> no anomalies even with a huge outlier
    rts = [0.1] * 8 + [50.0]
    parsed = _parsed_with_rts(spark, rts)
    assert an.response_time_zscore_anomalies(parsed).count() == 0


def test_sigma_zero_guard(spark):
    # all-identical values: sigma=0 -> z forced to 0 -> nothing flagged
    parsed = _parsed_with_rts(spark, [0.5] * 12)
    assert an.response_time_zscore_anomalies(parsed).count() == 0


def test_rolling_bands_sample_std(spark):
    """pandas rolling(5, min_periods=3).std() is SAMPLE std (ddof=1,
    detector.py:83); verify our windowed variant agrees with pandas."""
    import pandas as pd

    # detection math note: rolling(5) INCLUDES the current point, so with
    # ddof=1 a lone spike can never exceed 3 sigma of its own window
    # (z <= 4/(5*sqrt(1/5)) ≈ 1.79); pandas/the reference only flag points in
    # the min_periods warm-up (global fallback band). Spike at idx 1 (rcount
    # 2 < 3) is judged against the global band and escapes it.
    counts = [10, 100, 9, 10, 12, 11, 10, 9, 11, 10, 11, 10]
    # one access row per hour bucket h with n=counts[h] requests
    rows = []
    k = 0
    for h, n in enumerate(counts):
        for j in range(n):
            rows.append(
                (
                    "c1",
                    k,
                    "user",
                    access_line(
                        ts=f"10/Oct/2023:{h:02d}:{j % 60:02d}:00 -0700",
                        referer="r", user_agent="ua", response_time="0.100",
                    ),
                    None,
                    "2023-10-10 13:55:36",
                )
            )
            k += 1
    parsed = parse_transcripts(make_transcripts(spark, rows))
    found = an.traffic_rolling_anomalies(parsed, "1 hour").collect()

    s = pd.Series(counts)
    rm = s.rolling(5, min_periods=3).mean().fillna(s.mean())
    rs = s.rolling(5, min_periods=3).std().fillna(s.std())
    upper = rm + 3.0 * rs
    lower = rm - 3.0 * rs
    expected = set(s[(s > upper) | (s < lower)].index.tolist())
    got = {int(r.window_start.hour) for r in found}
    assert got == expected and expected == {1}


def test_iqr_fence(spark):
    """detector.py:117-127: only the HIGH side of the IQR fence flags."""
    # 5-min buckets with error rates: mostly 0, one bucket all-errors
    rows = []
    k = 0
    for b in range(12):
        status = 500 if b == 7 else 200
        for j in range(4):
            rows.append(
                (
                    "c1",
                    k,
                    "user",
                    access_line(
                        ts=f"10/Oct/2023:13:{5 * b:02d}:{j:02d} -0700",
                        status=status, referer="r", user_agent="ua",
                        response_time="0.100",
                    ),
                    None,
                    "2023-10-10 13:55:36",
                )
            )
            k += 1
    parsed = parse_transcripts(make_transcripts(spark, rows))
    found = an.error_rate_iqr_anomalies(parsed, "5 minutes").collect()
    assert len(found) == 1
    assert found[0].actual_value == 1.0
    assert found[0].metric_name == "error_rate"
