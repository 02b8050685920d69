"""Pallas force-kernel logic, validated in interpreter mode on CPU.

(The compiled-kernel path is exercised on real TPU by bench.py and the dd/f32
golden sweeps; here the same kernel body runs interpreted so the CPU test
suite covers grid/accumulation semantics.)
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nbody_tpu.ops.pallas_forces import _accel_kernel
from nbody_tpu.ops.forces import pairwise_accel_fast


def _interpret_accel(q, gm, eps, tile_i, tile_j):
    n = q.shape[0]
    kernel = functools.partial(_accel_kernel, eps2=eps * eps)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(n // tile_i, n // tile_j),
            in_specs=[
                pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_j), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_j), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_i, 3), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 3), q.dtype),
            interpret=True,
        )(q, q.T, gm[None, :])


@pytest.mark.parametrize("tile_i,tile_j", [(32, 64), (64, 32), (128, 128)])
def test_kernel_matches_xla(tile_i, tile_j):
    n = 128
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(n, 3), jnp.float32)
    m = jnp.asarray(np.abs(rs.randn(n)) * 1e8, jnp.float32)
    G, eps = 6.674e-11, 1e-3
    a = _interpret_accel(q, G * m, eps, tile_i, tile_j)
    a_ref = pairwise_accel_fast(q, m, G=G, eps=eps)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               rtol=2e-5, atol=float(jnp.abs(a_ref).max()) * 1e-6)


def test_zero_mass_padding_contributes_nothing():
    n = 64
    rs = np.random.RandomState(1)
    q = rs.randn(n, 3).astype(np.float32)
    gm = (np.abs(rs.randn(n)) * 1e-3).astype(np.float32)
    gm[n // 2:] = 0.0            # padded half
    q[n // 2:] = 0.0             # coincident pad bodies at the origin
    a = _interpret_accel(jnp.asarray(q), jnp.asarray(gm), 1e-3, 32, 32)
    a2 = _interpret_accel(jnp.asarray(q[:n // 2]),
                          jnp.asarray(gm[:n // 2]), 1e-3, 32, 32)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a)[:n // 2], np.asarray(a2))


@pytest.mark.parametrize("n,tile_i,tile_j", [
    (128, 32, 64), (128, 64, 32), (128, 128, 128),
    # tj >= ti but tj % ti != 0: the i block straddles a j-tile boundary,
    # so the single-diag-tile fast path is ineligible and the kernel must
    # fall back to the unconditional mask (ADVICE r4 medium finding).
    (96, 32, 48),
])
def test_mxu_kernel_matches_xla(n, tile_i, tile_j):
    """The Gram/matmul-formulated kernel agrees with the dq-form reference
    to f32-Gram accuracy (the diagonal mask makes the self-term exactly 0;
    without it the result is pure noise — see _accel_kernel_mxu)."""
    from nbody_tpu.ops.pallas_forces import pallas_accel_mxu

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(n, 3), jnp.float32)
    m = jnp.asarray(np.abs(rs.randn(n)) * 1e8, jnp.float32)
    G, eps = 6.674e-11, 1e-3
    a = pallas_accel_mxu(q, G * m, eps=eps, tile_i=tile_i, tile_j=tile_j,
                         interpret=True)
    a_ref = pairwise_accel_fast(q, m, G=G, eps=eps)
    peak = float(jnp.abs(a_ref).max())
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref),
                               atol=peak * 1e-4)


def test_mxu_zero_mass_padding_contributes_nothing():
    """gm = 0 pad rows add +-0.0 to both matmul sums — exact."""
    from nbody_tpu.ops.pallas_forces import pallas_accel_mxu

    n = 64
    rs = np.random.RandomState(1)
    q = rs.randn(n, 3).astype(np.float32)
    gm = (np.abs(rs.randn(n)) * 1e-3).astype(np.float32)
    gm[n // 2:] = 0.0
    q[n // 2:] = q[0]            # pad bodies stacked on body 0
    a = pallas_accel_mxu(jnp.asarray(q), jnp.asarray(gm), eps=1e-3,
                         tile_i=32, tile_j=32, interpret=True)
    a2 = pallas_accel_mxu(jnp.asarray(q[:n // 2]),
                          jnp.asarray(gm[:n // 2]), eps=1e-3,
                          tile_i=32, tile_j=32, interpret=True)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(np.asarray(a)[:n // 2], np.asarray(a2),
                               rtol=1e-5, atol=1e-30)


def test_isplit_step_matches_monolithic():
    """pallas_step_isplit (the >60s-watchdog workaround for very large N)
    computes the identical result to the monolithic step: row sums are
    independent across i, so splitting the i-range changes nothing."""
    from nbody_tpu.ops.pallas_forces import pallas_step, pallas_step_isplit

    rng = np.random.RandomState(3)
    n = 64
    q = jnp.asarray(rng.randn(n, 3), jnp.float32)
    v = jnp.asarray(rng.randn(n, 3) * 0.1, jnp.float32)
    gm = jnp.asarray(np.abs(rng.randn(n)) * 1e-4, jnp.float32)
    q1, v1 = pallas_step(q, v, gm, eps=1e-3, dt=0.5, tile_i=16, tile_j=16,
                         interpret=True)
    for ns in (2, 4):
        q2, v2 = pallas_step_isplit(q, v, gm, eps=1e-3, dt=0.5, n_splits=ns,
                                    tile_i=16, tile_j=16, interpret=True)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
