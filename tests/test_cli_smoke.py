"""CLI smoke tests: corpus bench runner and the fuzz CLI entry."""

import json
import subprocess
import sys


def test_run_corpus_cli(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "sparse_matrix_tpu.bench.run_corpus",
         "--generate", "--small", "--dir", str(tmp_path), "--engine", "python", "--repeats", "1"],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root", "JAX_PLATFORMS": "cpu"},
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, out.stderr[-2000:]
    for line in lines:
        row = json.loads(line)
        assert row["spgemm_mprod_s"] > 0


def test_fuzz_cli():
    out = subprocess.run(
        [sys.executable, "-m", "sparse_matrix_tpu.verify.fuzz", "--cases", "20",
         "--finite-only"],
        capture_output=True, text=True, timeout=300,
        env={"PYTHONPATH": ".", "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
    )
    assert "20 cases OK" in out.stdout, out.stderr[-2000:]


def test_examples_smoke(tmp_path):
    """New examples run end-to-end on CPU at toy sizes."""
    env = {"PYTHONPATH": ".", "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root", "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, "examples/batched_systems.py", "8"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert "solved all 8" in out.stdout, out.stderr[-2000:]
    out = subprocess.run(
        [sys.executable, "examples/preconditioners.py", "48"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert "AMG-PCG" in out.stdout, out.stderr[-2000:]
