"""Pallas TPU tiled all-pairs force kernel (fp32 throughput path).

The TPU-native replacement for the reference's hot CUDA kernel
`compute_accelerations_gpu` (hw5.cu:159-215). Design differences, per the
hardware:

  * The CUDA kernel assigns one thread per (i, j) pair and reduces rows with
    fp64 atomicAdd (hw5.cu:211-213) — non-deterministic summation. Here the
    grid is (i-tiles, j-tiles) with j the minor, sequentially-executed
    dimension: each i-row block accumulates its j-tiles IN ORDER into its
    VMEM-resident output block — deterministic by construction, no atomics
    (TPU has none; it doesn't need them).
  * Pallas pipelines the j-tile loads (coordinates as (3, TJ) rows, masses
    as (1, TJ)) from HBM into VMEM double buffers automatically, overlapping
    DMA with the (TI, TJ) VPU force evaluation.
  * The oscillating device masses are folded into `gm = G * m_eff(t)` by one
    (n,) elementwise XLA op per step — the same hoisting as the reference's
    PREPROCESS_FST table (hw5.cu:143-148) but fused rather than tabulated.

Self-interactions need no masking: dq = 0 makes the numerator zero while
softening keeps the denominator finite (the identity the serial spec's
`continue` expresses, samples/nbody.cc:59-60).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _accel_kernel(qcol_ref, qrow_ref, gm_ref, out_ref, *, eps2: float):
    """Grid point (i, j): row block i against column tile j.

    qcol_ref: (TI, 3)  — i-side positions (row block, constant over j)
    qrow_ref: (3, TJ)  — j-side position tile, lanes along bodies
    gm_ref:   (1, TJ)  — G * m_eff for the j tile
    out_ref:  (TI, 3)  — accumulated accelerations for the row block
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dx = qrow_ref[0:1, :] - qcol_ref[:, 0:1]      # (TI, TJ)
    dy = qrow_ref[1:2, :] - qcol_ref[:, 1:2]
    dz = qrow_ref[2:3, :] - qcol_ref[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz + eps2
    inv = lax.rsqrt(d2)
    w = gm_ref[0:1, :] * (inv * inv * inv)
    out_ref[:, 0:1] += jnp.sum(w * dx, axis=1, keepdims=True)
    out_ref[:, 1:2] += jnp.sum(w * dy, axis=1, keepdims=True)
    out_ref[:, 2:3] += jnp.sum(w * dz, axis=1, keepdims=True)


def pallas_accel(q, gm, *, eps: float, tile_i: int = 512,
                 tile_j: int = 2048, interpret: bool = False):
    """All-pairs accelerations. q: (n, 3) f32; gm: (n,) f32 = G*m_eff.

    n must be a multiple of tile_i and tile_j — pad with zero-mass bodies
    (exact: they contribute +0.0 to every sum).

    Tile area is VMEM-bound: ~3 live (TI, TJ) f32 intermediates must fit in
    16 MB (measured: (512, 4096) OOMs, (512, 2048) is the fastest known
    config at 1.77e11 pairs/s on v5e).

    Traced with x64 disabled: under x64, grid index maps become int64,
    which Mosaic cannot legalize (the package enables x64 globally for the
    fp64 graded path).
    """
    if tile_i * tile_j > 2 ** 20:
        raise ValueError(
            f"tile area {tile_i}x{tile_j} exceeds the VMEM budget "
            f"(~3 live f32 tiles must fit in 16MB; keep TI*TJ <= 2^20)")
    with jax.enable_x64(False):
        return _pallas_accel_cross(q, q, gm, eps=eps, tile_i=tile_i,
                                   tile_j=tile_j, interpret=interpret)


def pallas_accel_cross(qi, qj, gmj, *, eps: float, tile_i: int = 512,
                       tile_j: int = 2048, interpret: bool = False):
    """Accelerations on rows `qi` (ni, 3) from sources `qj` (nj, 3) with
    `gmj = G*m_eff` (nj,). The building block of the body-sharded ring path
    (parallel/sharded.py): each chip's local rows against a rotating source
    tile. pallas_accel(q, gm) == pallas_accel_cross(q, q, gm)."""
    with jax.enable_x64(False):
        return _pallas_accel_cross(qi, qj, gmj, eps=eps, tile_i=tile_i,
                                   tile_j=tile_j, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("eps", "tile_i", "tile_j",
                                             "interpret"))
def _pallas_accel_cross(qi, qj, gmj, *, eps: float, tile_i: int, tile_j: int,
                        interpret: bool):
    ni = qi.shape[0]
    nj = qj.shape[0]
    tile_i = min(tile_i, ni)
    tile_j = min(tile_j, nj)
    assert ni % tile_i == 0 and nj % tile_j == 0, (ni, nj, tile_i, tile_j)
    qrow = qj.T                                  # (3, nj), tiny transpose
    gmrow = gmj[None, :]                         # (1, nj)

    kernel = functools.partial(_accel_kernel, eps2=eps * eps)
    flops_per_pair = 16
    return pl.pallas_call(
        kernel,
        grid=(ni // tile_i, nj // tile_j),
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
        out_shape=jax.ShapeDtypeStruct((ni, 3), qi.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * ni * nj,
            bytes_accessed=qi.size * 4 + qj.size * 8 + gmj.size * 4,
            transcendentals=ni * nj,  # rsqrt
        ),
        interpret=interpret,
    )(qi, qrow, gmrow)


def pallas_step_isplit(q, v, gm, *, eps: float, dt: float, n_splits: int,
                       tile_i: int = 512, tile_j: int = 2048,
                       interpret: bool = False):
    """One fused step with the force evaluation SPLIT into n_splits
    device executions over i-row segments (each a pallas_accel_cross of
    the segment's rows against all sources).

    Why: the TPU worker kills single device executions beyond ~60 s
    (measured: a 52.6 s N=3.1M force step runs; ~72 s at N=3.7M and a
    105 s two-step N=3.1M scan both die with 'TPU device error'). One
    N=4M step is ~97 s of work, so no monolithic kernel can run it;
    splitting the i-range bounds each execution while computing the
    identical fixed-order result (row sums are independent across i).
    """
    n = q.shape[0]
    seg = -(-n // n_splits)
    seg = ((seg + tile_i - 1) // tile_i) * tile_i
    parts = []
    for i0 in range(0, n, seg):
        qi = lax.slice_in_dim(q, i0, min(i0 + seg, n))
        parts.append(pallas_accel_cross(qi, q, gm, eps=eps, tile_i=tile_i,
                                        tile_j=tile_j, interpret=interpret))
    a = jnp.concatenate(parts, axis=0)
    v = v + a * dt
    q = q + v * dt
    return q, v


def pallas_step(q, v, gm, *, eps: float, dt: float, tile_i: int = 512,
                tile_j: int = 2048, interpret: bool = False):
    """Fused force + symplectic-Euler update (the Pallas fast path's analog
    of hw5.cu's compute_accelerations_gpu + update_positions_gpu pair)."""
    a = pallas_accel(q, gm, eps=eps, tile_i=tile_i, tile_j=tile_j,
                     interpret=interpret)
    v = v + a * dt
    q = q + v * dt
    return q, v
