"""End-to-end proof that bench.py can no longer lose the driver record.

The driver parses the trailing JSON out of a ~2 KB COMBINED
stdout+stderr tail of the bench run. Three rounds lost the record three
ways: r5 (the full dict outgrew the tail), r10 (JVM OOM in the final
curve diagnostic before the line printed at all), r11 (the line printed
early, then the curve child's INHERITED stderr buried it under executor
crash spam). The contract that actually failed is therefore the one
asserted here: bench.py is run as the driver runs it — a subprocess
with stderr MERGED into stdout — and the merged output must END with
the parseable headline line, under

  * a forced failure in every scaling section
    (SPARK_GRAFT_BENCH_INJECT_FAIL=sf1,skew,curve — the curve failure
    fires inside the --curve-child subprocess, exercising the rc!=0
    path), and
  * the exact r11 mode: a curve child that floods stderr with executor
    crash spam and then dies by SIGKILL mid-run (inject key
    `curve-kill`) — the spam must land in the child's log file, never
    in this process's captured streams.

Both runs use sf0.001 with a 2-query headline and single passes so the
whole proof costs minutes, not a full bench run.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(tmp_path, inject: str):
    full_out = tmp_path / "full.json"
    curve_log = tmp_path / "curve_stderr.log"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_RATIO_RUNS="1",
        SPARK_GRAFT_BENCH_QUERIES="agg_pricing_summary,join_inner_broadcast",
        SPARK_GRAFT_BENCH_SCALE_FORCE="1",
        SPARK_GRAFT_BENCH_INJECT_FAIL=inject,
        SPARK_GRAFT_BENCH_FULL_OUT=str(full_out),
        SPARK_GRAFT_BENCH_CURVE_LOG=str(curve_log),
        # the headline itself must be cheap here; scaling never runs
        SPARK_GRAFT_BENCH_DRIVER_MEM="8g",
    )
    # stderr MERGED into stdout: the driver's tail capture is combined,
    # and the r11 loss happened on the combined stream — assert on it
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO, timeout=600)
    return r, full_out, curve_log


def _check_merged_contract(r):
    """rc 0; the merged stdout+stderr ENDS with the headline JSON line,
    which also printed once early (crash-before-end insurance)."""
    assert r.returncode == 0, (
        f"bench.py rc={r.returncode}\nmerged tail:\n{r.stdout[-2000:]}")
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert lines, "no output at all"
    head = json.loads(lines[-1])   # the driver's parse: trailing JSON
    assert head["metric"] == "headline_queries_total"
    assert head["unit"] == "sec"
    assert set(head["queries"]) == {
        "agg_pricing_summary", "join_inner_broadcast", "signal_pipeline"}
    assert all(v >= 0 for v in head["queries"].values())
    assert len(lines[-1]) < 1900   # the driver's ~2 KB tail capture
    # the early copy is present too, identical — both failure modes
    # (crash before the end, spam after the early print) stay covered
    assert lines.count(lines[-1]) == 2, (
        f"headline line must appear exactly twice (early + final), "
        f"got {lines.count(lines[-1])}")
    return head


def test_bench_headline_survives_scaling_failures(tmp_path):
    r, full_out, _ = _run_bench(tmp_path, inject="sf1,skew,curve")
    _check_merged_contract(r)
    full = json.loads(full_out.read_text())
    for section in ("sf1", "skew", "signal_multi_series_curve"):
        assert "err" in full[section], (
            f"section {section} should have recorded its injected "
            f"failure, got {full[section]!r}")
        assert "injected failure" in full[section]["err"] or (
            section == "signal_multi_series_curve"
            and "rc=" in full[section]["err"])


def test_bench_refuses_silently_empty_curve(tmp_path):
    """A curve child that exits rc 0 WITHOUT writing its result file
    must yield an err marker in the artifact, never an empty curve
    recorded as success (the r5/r10/r11 silent-loss class)."""
    r, full_out, _ = _run_bench(tmp_path, inject="sf1,skew,curve-silent")
    _check_merged_contract(r)
    full = json.loads(full_out.read_text())
    curve = full["signal_multi_series_curve"]
    assert "err" in curve and "no readable result" in curve["err"], curve


def test_bench_headline_survives_curve_child_sigkill(tmp_path):
    """The exact r11 failure: the curve child floods stderr with
    executor crash spam and dies uncleanly. The spam must land in the
    child's log file — the parent's merged output still ends with the
    headline line, and the artifact records the child's exit."""
    r, full_out, curve_log = _run_bench(tmp_path, inject="sf1,skew,curve-kill")
    _check_merged_contract(r)
    assert "Python worker exited unexpectedly" not in r.stdout, (
        "child crash spam leaked into the parent's captured streams")
    assert curve_log.exists()
    assert "Python worker exited unexpectedly" in curve_log.read_text()
    full = json.loads(full_out.read_text())
    curve = full["signal_multi_series_curve"]
    assert "err" in curve and "rc=" in curve["err"], curve
