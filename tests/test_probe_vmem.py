"""Smoke-test the VMEM probe tool (tools/probe_vmem.py) in interpret
mode on CPU: the probe decides the fused-path H-caps (models/ann.py),
so a harness bug that masquerades as a compile failure would silently
bias cap decisions (round-4 review found exactly that: a scalar
drop_seed crashed every --drop probe)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "probe_vmem.py")


def _run(*extra):
    out = subprocess.run(
        [sys.executable, TOOL, *extra, "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_probe_compiles_and_reports_plan():
    r = _run("rnn", "128", "--B", "8", "--T", "8")
    assert r["ok"] is True
    assert r["plan"]["bt"] >= 8 and r["plan"]["Hp"] == 128


def test_probe_dropout_and_affine_paths():
    # the (2,)-shaped kernel seed wiring (regression: scalar seed crash)
    r = _run("ligru", "128", "--B", "8", "--T", "8",
             "--drop", "0.1", "--affine")
    assert r["ok"] is True


def test_probe_time_ab_is_fair():
    # --time must wire affine+dropout into BOTH sides; failure mode is a
    # tracer/arg error, so completing with finite numbers is the check
    r = _run("rnn", "128", "--B", "8", "--T", "8",
             "--affine", "--drop", "0.1", "--time")
    assert r["ok"] is True
    assert r["fused_ms"] > 0 and r["scan_ms"] > 0
