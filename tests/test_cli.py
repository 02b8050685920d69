"""CLI surface tests (fast paths only; full-length runs live in scripts/)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
B20 = "/root/reference/testcases/b20.in"


def _run(args, **kw):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    return subprocess.run([sys.executable, "-m", "nbody_tpu", *args],
                          capture_output=True, text=True, cwd=REPO, env=env,
                          **kw)


def test_cli_solves_and_writes(tmp_path):
    out = str(tmp_path / "o.out")
    r = _run([B20, out, "--n-steps", "50", "--stats"])
    assert r.returncode == 0, r.stderr
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 3
    stats = json.loads(r.stderr.strip().split("\n")[-1])
    assert stats["n"] == 20 and stats["n_steps"] == 50
    assert "problem_1_2" in stats["phases_s"]


def test_cli_missing_args():
    r = _run([])
    assert r.returncode != 0
    assert "required" in r.stderr


def test_cli_rejects_bad_precision():
    r = _run([B20, "/tmp/x.out", "--precision", "f16"])
    assert r.returncode != 0
    assert "invalid choice" in r.stderr


def test_full_b20_byte_golden(tmp_path):
    """Full-length b20 through the default f64 path must be byte-identical
    to the golden output (~15 s; the full 12-case sweep lives in scripts/)."""
    out = str(tmp_path / "b20.out")
    r = _run([B20, out])
    assert r.returncode == 0, r.stderr
    with open(out) as f, open("/root/reference/testcases/b20.out") as g:
        assert f.read() == g.read()
