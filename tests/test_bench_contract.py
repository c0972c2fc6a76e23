"""The driver-facing bench contract: `python bench.py` must end with ONE
stdout line that a bounded (~2000 char) tail window always contains in
full and that json-parses to the headline metric.  r12's enriched single
line outgrew the window and the round recorded no bench value — these
tests pin the fix (VERDICT r12 #1) without running Spark."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _payload(n_queries: int) -> dict:
    qs = {f"very_long_query_name_family_{i:03d}": 1.2345 for i in range(n_queries)}
    return {
        "metric": "headline_queries_total_time",
        "value": 12.3456,
        "unit": "sec",
        "queries": qs,
        "queries_p50": {k: v * 1.3 for k, v in qs.items()},
        "total_p50": 16.0,
        "calibration": {
            "best": 0.5, "p50": 0.6, "io_write_best": 1.1,
            "io_write_p50": 1.2, "io_read_best": 0.4, "io_read_p50": 0.5,
        },
        "vs_prev": {
            "prev": "BENCH_r12.json",
            "probe_ratios": {"best": 1.0, "io_write_best": 1.0},
            "noise_band": 1.15,
            "total_ratio": 0.95,
            "flagged_beyond_band": {k: 1.3 for k in qs},
        },
        "sf": 0.1,
    }


def test_stdout_line_fits_budget_and_parses():
    line = bench.stdout_line(_payload(25))
    assert len(line) <= bench._STDOUT_LINE_BUDGET
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total_time"
    assert d["value"] == 12.3456 and d["unit"] == "sec"
    assert d["calibration"]["io_read_best"] == 0.4
    # per-query maps that fit are kept; the enriched-only keys never
    # reach stdout
    assert len(d["queries"]) == 25
    assert "vs_prev" not in d and "queries_p50" not in d


def test_stdout_line_drops_queries_when_crowded():
    # enough queries to overflow the tail window: the headline survives
    line = bench.stdout_line(_payload(200))
    assert len(line) <= bench._STDOUT_LINE_BUDGET
    d = json.loads(line)
    assert d["value"] == 12.3456 and "queries" not in d
    assert d["calibration"]["best"] == 0.5 and d["sf"] == 0.1


def test_latest_recorded_bench_accepts_compact_artifacts(tmp_path):
    # a future compact artifact (no per-query map) still anchors the
    # cross-round comparison via its headline value + calibration
    (tmp_path / "BENCH_r98.json").write_text(json.dumps({
        "parsed": {"metric": "headline_queries_total_time", "value": 20.0,
                   "unit": "sec", "calibration": {"best": 0.5}, "sf": 0.1}
    }))
    (tmp_path / "BENCH_r99.json").write_text(json.dumps({
        "parsed": {"metric": "headline_queries_total_time", "value": 18.0,
                   "unit": "sec", "calibration": {"best": 0.5}, "sf": 0.1}
    }))
    name, d = bench._latest_recorded_bench(str(tmp_path), 0.1)
    assert name == "BENCH_r99.json" and d["value"] == 18.0
    # and an artifact at another sf is never matched
    name2, _ = bench._latest_recorded_bench(str(tmp_path), 1.0)
    assert name2 is None
