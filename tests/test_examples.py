"""Smoke the shipped example compositions: each demo must run end-to-end
on sf0.001 against the CURRENT registry — a demo that drifts from a
renamed face or changed schema fails here, not in front of a user."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_demo(name):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=600, env=env)
    assert p.returncode == 0, p.stderr[-2000:]
    return p.stdout


def test_training_mix_demo_runs():
    out = _run_demo("training_mix_demo.py")
    assert "leakage-safe split" in out
    assert "epoch-0 stream head" in out
    assert "resume after position" in out


def test_mix_decision_demo_runs():
    out = _run_demo("mix_decision_demo.py")
    assert "quality-gate survival" in out
    assert "DoReMi weights" in out
    assert "curriculum head" in out
    assert "anneal phase starts at stream position" in out


def test_corpus_qa_demo_runs():
    out = _run_demo("corpus_qa_demo.py")
    assert "gate attribution over" in out
    assert "worst offenders" in out
    assert "most-overlapping source pairs" in out
    assert "assemble_v3 kept" in out


def test_tokenizer_dedup_policy_demo_runs():
    out = _run_demo("tokenizer_dedup_policy_demo.py")
    assert "word burstiness" in out
    assert "OOV rate per source" in out
    assert "gate-rule ablation" in out
    assert "duplication budget" in out
    assert "IVF cell balance" in out
    assert "margin mining" in out


def test_curation_economics_demo_runs():
    out = _run_demo("curation_economics_demo.py")
    assert "near-dup threshold sweep" in out
    assert "Gopher-gate strictness tradeoff" in out
    assert "vocabulary-size coverage curve" in out
    assert "max-min fair" in out
