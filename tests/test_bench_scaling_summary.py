"""bench._scaling_summary generation logic (no Spark session needed).

The summary feeds the bench JSON's ``scaling`` block — the north rule's
N -> 4N evidence — so its merge rules are contract, not convenience:
min-wall only within one code generation, pairing only at a common input
size, newest PAIRABLE generation wins with older generations as the
fallback.
"""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _write_log(tmp_path, name, records):
    p = tmp_path / "tools"
    p.mkdir(exist_ok=True)
    with open(p / name, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _trial(cores, turns, wall, clean=True):
    return {
        "cores": cores,
        "probe": {"clean": clean},
        "trial": {
            "cores": cores,
            "turns": turns,
            "wall_s": wall,
            "turns_per_sec": round(turns / wall, 1),
        },
    }


@pytest.fixture()
def fake_repo(tmp_path, monkeypatch):
    """Point the summary at a synthetic repo dir with controlled logs."""
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda _: str(tmp_path / "bench.py")
    )
    return tmp_path


def test_real_repo_summary_is_r5_generation():
    s = bench._scaling_summary()
    assert s is not None
    assert "r5" in s["protocol"]
    assert s["scaling_efficiency"] >= 0.8
    assert s["parallelism_ratio"] == 4.0


def test_unpairable_newest_generation_falls_through(fake_repo, monkeypatch):
    """Two core levels at DIFFERENT input sizes are not a pair: the
    summary must fall through to the older generation, not return None."""
    _write_log(fake_repo, "gen_new.jsonl", [
        _trial(8, 16_000_000, 100.0),
        _trial(2, 400_000, 50.0),  # smoke-size small level: unpairable
    ])
    _write_log(fake_repo, "gen_old.jsonl", [
        _trial(8, 16_000_000, 150.0),
        _trial(2, 16_000_000, 540.0),
    ])
    monkeypatch.setattr(
        bench, "SCALING_LOG_GENERATIONS", [["gen_new.jsonl"], ["gen_old.jsonl"]]
    )
    s = bench._scaling_summary()
    assert s is not None and s["input_turns"] == 16_000_000
    assert s["turns_per_sec_large"] == round(16_000_000 / 150.0, 1)


def test_newest_pairable_generation_wins(fake_repo, monkeypatch):
    _write_log(fake_repo, "gen_new.jsonl", [
        _trial(8, 16_000_000, 200.0),
        _trial(2, 16_000_000, 800.0),
    ])
    _write_log(fake_repo, "gen_old.jsonl", [
        _trial(8, 16_000_000, 100.0),  # faster, but older code
        _trial(2, 16_000_000, 400.0),
    ])
    monkeypatch.setattr(
        bench, "SCALING_LOG_GENERATIONS", [["gen_new.jsonl"], ["gen_old.jsonl"]]
    )
    s = bench._scaling_summary()
    assert s["turns_per_sec_large"] == round(16_000_000 / 200.0, 1)


def test_unclean_trials_never_count(fake_repo, monkeypatch):
    _write_log(fake_repo, "gen.jsonl", [
        _trial(8, 16_000_000, 50.0, clean=False),  # starved-window artifact
        _trial(8, 16_000_000, 150.0),
        _trial(2, 16_000_000, 540.0),
    ])
    monkeypatch.setattr(bench, "SCALING_LOG_GENERATIONS", [["gen.jsonl"]])
    s = bench._scaling_summary()
    assert s["turns_per_sec_large"] == round(16_000_000 / 150.0, 1)


def test_no_pairable_generation_returns_none(fake_repo, monkeypatch):
    _write_log(fake_repo, "gen.jsonl", [_trial(8, 16_000_000, 100.0)])
    monkeypatch.setattr(bench, "SCALING_LOG_GENERATIONS", [["gen.jsonl"]])
    assert bench._scaling_summary() is None
