"""Native exact mode through the Python binding (short runs; the full-length
byte-golden validation lives in scripts/run_golden.py --precision exact)."""

import dataclasses
import os
import subprocess

import pytest

from nbody_tpu import SimConfig, read_input
from nbody_tpu.engine import solve_scene

TESTCASE_DIR = "/root/reference/testcases"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True,
                   capture_output=True)


def test_exact_matches_oracle_binary(tmp_path):
    scene = read_input(os.path.join(TESTCASE_DIR, "b20.in"))
    cfg = dataclasses.replace(SimConfig(), n_steps=500)
    ans = solve_scene(scene, cfg, precision="exact")

    out = str(tmp_path / "o.out")
    subprocess.run([os.path.join(REPO, "native", "oracle"),
                    os.path.join(TESTCASE_DIR, "b20.in"), out, "500", "pow"],
                   check=True)
    from nbody_tpu.io import parse_output, format_output
    with open(out) as f:
        want = f.read()
    assert format_output(*ans.as_tuple()) == want


def test_exact_agrees_with_f64_engine_short():
    """Over a short horizon (before chaos amplifies reduction-order ulps)
    the native core and the JAX f64 path must give the same answers."""
    scene = read_input(os.path.join(TESTCASE_DIR, "b40.in"))
    cfg = dataclasses.replace(SimConfig(), n_steps=300)
    a = solve_scene(scene, cfg, precision="exact")
    b = solve_scene(scene, cfg, precision="f64")
    assert a.hit_time_step == b.hit_time_step
    assert a.gravity_device_id == b.gravity_device_id
    assert abs(a.min_dist - b.min_dist) / a.min_dist < 1e-12
