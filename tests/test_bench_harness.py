"""End-to-end proof that bench.py can no longer lose the driver record.

Round-10 postmortem: the driver's bench run OOMed inside the final
scaling diagnostic (the n=128 multi-series curve point) AFTER the
headline, sf1 and skew sections had all completed — and because the
driver-consumable headline line printed only at the very end, the round
had no bench record at all (BENCH_r10.json: rc 1, parsed null).

This test runs bench.py as the driver does (a subprocess, stdout
captured) with a forced failure injected into EVERY scaling section
(SPARK_GRAFT_BENCH_INJECT_FAIL=sf1,skew,curve — the curve failure fires
inside the --curve-child subprocess, exercising the rc!=0 path) and
asserts the worst case the r10 driver hit now yields:
  * exit code 0,
  * exactly one stdout line, parseable, with the headline schema,
  * the full artifact carrying {"err": ...} for each failed section
    (the evidence survives even when the diagnostics don't).

Runs on sf0.001 with a 2-query headline and single passes so the whole
proof costs ~2 min, not a full bench run.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_headline_survives_scaling_failures(tmp_path):
    full_out = tmp_path / "full.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_RATIO_RUNS="1",
        SPARK_GRAFT_BENCH_QUERIES="agg_pricing_summary,join_inner_broadcast",
        SPARK_GRAFT_BENCH_SCALE_FORCE="1",
        SPARK_GRAFT_BENCH_INJECT_FAIL="sf1,skew,curve",
        SPARK_GRAFT_BENCH_FULL_OUT=str(full_out),
        # the headline itself must be cheap here; scaling never runs
        SPARK_GRAFT_BENCH_DRIVER_MEM="8g",
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)

    assert r.returncode == 0, (
        f"bench.py rc={r.returncode}\nstderr tail:\n{r.stderr[-2000:]}")

    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE line, got {len(lines)}"
    head = json.loads(lines[0])
    assert head["metric"] == "headline_queries_total"
    assert head["unit"] == "sec"
    assert set(head["queries"]) == {
        "agg_pricing_summary", "join_inner_broadcast", "signal_pipeline"}
    assert all(v >= 0 for v in head["queries"].values())
    assert len(lines[0]) < 1900   # the driver's ~2 KB tail capture

    full = json.loads(full_out.read_text())
    for section in ("sf1", "skew", "signal_multi_series_curve"):
        assert "err" in full[section], (
            f"section {section} should have recorded its injected "
            f"failure, got {full[section]!r}")
        assert "injected failure" in full[section]["err"] or (
            section == "signal_multi_series_curve"
            and "rc=" in full[section]["err"])
