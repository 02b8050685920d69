"""Pallas e64 force kernel (ops/pallas_forces_e64): byte-identical to
host binary64 running the serial spec's op order (native/core.cc:98-110,
samples/nbody.cc:57-88).

The reference here is plain numpy float64 — e64 IS binary64, so host f64
with the exact per-pair op order and the j-ascending fold is the full
expected bit pattern (much cheaper than compiling the XLA e64 kernel on
CPU, which hits the known XLA:CPU softfloat compile pathology). Runs in
interpret mode: Mosaic lowering is validated on the TPU (the kernel is
measured there; results/ACCURACY.md)."""

import os

import numpy as np
import pytest

from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.pallas_forces_e64 import pallas_accel_e64

slow = pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                          reason="extra interpret-mode compiles; RUN_SLOW=1")


def _host_f64_accel(q, gm, eps):
    """Serial-spec accelerations in host f64: dx = q[j] - q[i],
    d2 = ((dx2+dy2)+dz2)+eps2, d3 = d2*sqrt(d2), term = (gm[j]*dx)/d3,
    folded over ascending j (vectorized over i — each row's fold is
    independent)."""
    n = q.shape[0]
    acc = np.zeros((n, 3))
    for j in range(n):
        dq = q[j] - q
        d2 = ((dq[:, 0] * dq[:, 0] + dq[:, 1] * dq[:, 1])
              + dq[:, 2] * dq[:, 2]) + eps * eps
        d3 = d2 * np.sqrt(d2)
        acc = acc + (gm[j] * dq) / d3[:, None]
    return acc


def test_pallas_e64_byte_identical_to_host_f64():
    rng = np.random.RandomState(0)
    n = 128
    q = rng.randn(n, 3) * 1e10
    m = np.abs(rng.randn(n)) * 1e12
    G, eps = 6.674e-11, 1e-3
    gm = G * m

    got = pallas_accel_e64(fe.e64_from_f64_tree(q), fe.e64_from_f64_tree(gm),
                           eps=eps, rows_i=1, tile_j=32, interpret=True)
    want_h, want_l = fe.from_f64(_host_f64_accel(q, gm, eps))
    np.testing.assert_array_equal(want_h, np.asarray(got.hi))
    np.testing.assert_array_equal(want_l, np.asarray(got.lo))


def test_pallas_e64_batched_bit_identical_to_per_row():
    """The scenario-batch grid dimension never mixes rows: a (B, n, 3)
    call is byte-identical to B separate (n, 3) calls (each scenario is
    its own all-pairs problem — the solver's P1/P2/P3 rows)."""
    rng = np.random.RandomState(2)
    bat, n = 3, 128
    q = rng.randn(bat, n, 3) * 1e10
    m = np.abs(rng.randn(bat, n)) * 1e12
    gm = 6.674e-11 * m
    qe, gme = fe.e64_from_f64_tree(q), fe.e64_from_f64_tree(gm)

    got = pallas_accel_e64(qe, gme, eps=1e-3, rows_i=1, tile_j=32,
                           interpret=True)
    for b in range(bat):
        one = pallas_accel_e64(fe.e64_from_f64_tree(q[b]),
                               fe.e64_from_f64_tree(gm[b]),
                               eps=1e-3, rows_i=1, tile_j=32,
                               interpret=True)
        np.testing.assert_array_equal(np.asarray(got.hi)[b],
                                      np.asarray(one.hi))
        np.testing.assert_array_equal(np.asarray(got.lo)[b],
                                      np.asarray(one.lo))


@slow
def test_pallas_e64_tile_shape_invariant():
    """Same bits for any (rows_i, tile_j) split: the fold order never
    depends on the blocking (ascending j-tiles x ascending in-tile j)."""
    rng = np.random.RandomState(1)
    n = 256
    q = rng.randn(n, 3)
    m = np.abs(rng.randn(n))
    gm = 6.674e-11 * m
    qe, gme = fe.e64_from_f64_tree(q), fe.e64_from_f64_tree(gm)

    a = pallas_accel_e64(qe, gme, eps=1e-3, rows_i=1, tile_j=256,
                         interpret=True)
    b = pallas_accel_e64(qe, gme, eps=1e-3, rows_i=2, tile_j=64,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(a.hi), np.asarray(b.hi))
    np.testing.assert_array_equal(np.asarray(a.lo), np.asarray(b.lo))
