"""The ANSWER-GRADE e64 softfloat solver on the mesh (VERDICT round-2
item 2): byte-identical answers to the single-chip e64 path across mesh
shapes, BY CONSTRUCTION (the state rides body-replicated and only the
O(n^2) force rows split over 'body'; the spec's serial per-row fold never
re-associates — solver_sharded._p12_chunk_sharded_e64). The multi-chip
twin of the reference spreading the graded scenario over both its GPUs
(hw5.cu:564-588).

RUN_SLOW-gated: XLA:CPU takes minutes to compile the fused softfloat
graphs (a CPU-backend pathology absent on TPU — tests/test_e64_solver.py
header); the standing full-length validation is the TPU golden sweep.
"""

import dataclasses
import os

import numpy as np
import pytest

from nbody_tpu import SimConfig, read_input
from nbody_tpu.engine import solve_scene
from nbody_tpu.io import format_output
from nbody_tpu.parallel import make_mesh

TESTCASE_DIR = "/root/reference/testcases"

slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                          reason="minutes of XLA:CPU compile; RUN_SLOW=1")


@pytest.fixture(scope="module")
def tiny_scene():
    """First 6 bodies of b20 (planet, asteroid, a device among them)."""
    full = read_input(os.path.join(TESTCASE_DIR, "b20.in"))
    keep = sorted({full.planet, full.asteroid, int(full.device_idx[0]),
                   *range(3)})[:6]
    keep = np.asarray(sorted(set(keep)), dtype=int)
    remap = {int(b): i for i, b in enumerate(keep)}
    dev = np.asarray([remap[int(d)] for d in full.device_idx
                      if int(d) in remap], dtype=np.int64)
    return dataclasses.replace(
        full, n=len(keep), planet=remap[full.planet],
        asteroid=remap[full.asteroid], q=full.q[keep], v=full.v[keep],
        m=full.m[keep], types=[full.types[i] for i in keep],
        device_idx=dev)


@slow
def test_e64_mesh_byte_identical_to_single_chip(tiny_scene, monkeypatch):
    # Pad to 8 bodies, not the 128 TPU bucket: the wall here is the
    # XLA:CPU softfloat COMPILE (scales with the padded shape; the 128
    # bucket never finished in >100 min, measured round 4), and padding
    # is semantics-exact (+0.0 force identity, test_padding.py), so the
    # byte-identity claim is unchanged. Same override the dryrun uses.
    monkeypatch.setenv("NBODY_MESH_MIN_BUCKET", "8")
    cfg = dataclasses.replace(SimConfig(), n_steps=40)
    single = solve_scene(tiny_scene, cfg, precision="e64", platform="cpu")
    want = format_output(*single.as_tuple())
    for axes in ({"scen": 2, "body": 2}, {"scen": 1, "body": 8}):
        mesh = make_mesh(axes)
        got = solve_scene(tiny_scene, cfg, precision="e64", mesh=mesh)
        assert format_output(*got.as_tuple()) == want, axes
        # min_dist must agree to the BIT, not just the printed digits
        assert np.float64(got.min_dist).view(np.uint64) == \
            np.float64(single.min_dist).view(np.uint64), axes


@slow
def test_e64_mesh_p3_runs(tiny_scene, monkeypatch):
    """An inflated planet radius + fast missile force a hit so Problem 3
    actually integrates on the e64 mesh path; answers must match the
    single-chip e64 solve byte for byte."""
    monkeypatch.setenv("NBODY_MESH_MIN_BUCKET", "8")  # see test above
    cfg = dataclasses.replace(SimConfig(), n_steps=60,
                              planet_radius=2.05e14, missile_speed=1e30)
    single = solve_scene(tiny_scene, cfg, precision="e64", platform="cpu")
    assert single.hit_time_step != -2, "test setup: no hit"
    mesh = make_mesh({"scen": 2, "body": 4})
    got = solve_scene(tiny_scene, cfg, precision="e64", mesh=mesh)
    assert format_output(*got.as_tuple()) == \
        format_output(*single.as_tuple())
