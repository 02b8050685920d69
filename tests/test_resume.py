"""Preemption-safe solve: checkpointed P12 resumes bit-identically."""

import dataclasses
import os

import numpy as np

from nbody_tpu import SimConfig, read_input
from nbody_tpu.models.direct_sum import run_problems_12
from nbody_tpu.physics import oscillation_table

TESTCASE_DIR = "/root/reference/testcases"


def test_p12_checkpoint_resume_bitexact(tmp_path):
    scene = read_input(os.path.join(TESTCASE_DIR, "b30.in"))
    cfg = dataclasses.replace(SimConfig(), n_steps=200)
    fst = oscillation_table(cfg)

    ref = run_problems_12(scene, fst, cfg)

    ck = str(tmp_path / "p12.npz")
    # "crash" after 2 chunks: run only 120 of 200 steps by lying about
    # n_steps, leaving a checkpoint at step 120
    cfg_partial = dataclasses.replace(cfg, n_steps=120)
    run_problems_12(scene, oscillation_table(cfg_partial), cfg_partial,
                    host_chunk=60, checkpoint_path=ck)
    assert os.path.exists(ck)

    # resume with the full config from the same checkpoint file
    res = run_problems_12(scene, fst, cfg, host_chunk=60,
                          checkpoint_path=ck)
    assert res.min_dist == ref.min_dist
    assert res.hit_time_step == ref.hit_time_step
    np.testing.assert_array_equal(res.arrivals, ref.arrivals)
    np.testing.assert_array_equal(res.q_snaps, ref.q_snaps)
