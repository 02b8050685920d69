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


def _accel_kernel_mxu(qi4_ref, qj4_ref, gmn_ref, out_ref, *, eps2: float,
                      gram_precision, accum_precision):
    """MXU-formulated grid point (i, j): the O(n^2) FLOPs ride the MXU.

    The VPU kernel above spends ~16 f32 ops/pair and is measured VPU-bound
    at ~73% of peak (results/ACCURACY.md) — a 3-round plateau at 1.76e11
    pairs/s. This formulation moves the heavy lifting to the (otherwise
    idle) 128x128 systolic array:

      d2_ij  = |qi|^2 + |qj|^2 + eps^2 - 2 (qi . qj)   [Gram: one
               (TI,4)x(4,TJ) matmul; norms are O(n) precompute]
      w_ij   = gm_j * rsqrt(d2)^3                      [VPU, ~6 ops/pair]
      out_i += W @ [qj | 1]                            [one (TI,TJ)x(TJ,4)
               matmul: cols 0-2 = sum_j w*qj, col 3 = sum_j w]

    and the caller finishes with a_i = out[:, :3] - out[:, 3] * qi — the
    algebraic identity sum_j w_ij (qj - qi) = (sum w qj) - (sum w) qi.

    Unlike the dq-form kernel, the diagonal MUST be masked here: the dq
    form's self-term is exactly 0 (0/eps^3), but in the matmul split the
    self-term w_ii = gm_i/eps^3 is ~1e9x the physical terms, and its
    algebraic cancellation between the two sums is destroyed by f32
    accumulation (measured: leaving it in makes the result pure noise).
    The mask runs only on the one j-tile per i block that contains the
    diagonal crossing (when TJ >= TI), so its ~3 VPU ops/pair cost is
    amortized to ~3*TI/n.

    Numerics: the Gram d2 cancels catastrophically for near pairs
    (rel. error ~ulp * (|q|/d)^2 vs the dq form's ~ulp), so this is a
    THROUGHPUT kernel — measured error vs the dq kernel is recorded in
    results/ACCURACY.md and the graded paths never route here. d2 is
    clamped below at eps2/2 so rounding can never feed rsqrt a negative.

    qi4_ref: (TI, 4) — i rows [x, y, z, 0]
    qj4_ref: (TJ, 4) — j tile [x, y, z, 1]
    gmn_ref: (2, TJ) — row 0 = G*m_eff(j), row 1 = |qj|^2
    out_ref: (TI, 4) — accumulated [sum w*qj | sum w]
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    qi4 = qi4_ref[:]
    qj4 = qj4_ref[:]
    # (TI,4) x (TJ,4)^T contraction over the coordinate axis; the padded
    # 4th components contribute 0*1 = 0.
    g = lax.dot_general(qi4, qj4, (((1,), (1,)), ((), ())),
                        precision=gram_precision,
                        preferred_element_type=jnp.float32)       # (TI, TJ)
    ni2 = jnp.sum(qi4 * qi4, axis=1, keepdims=True)               # (TI, 1)
    nj2 = gmn_ref[1:2, :]                                         # (1, TJ)
    d2 = (ni2 + (nj2 + eps2)) - 2.0 * g
    d2 = jnp.maximum(d2, 0.5 * eps2)
    inv = lax.rsqrt(d2)
    w = gmn_ref[0:1, :] * (inv * inv * inv)                       # (TI, TJ)
    ti, tj = w.shape
    i = pl.program_id(0)
    rows = i * ti + lax.broadcasted_iota(jnp.int32, w.shape, 0)
    cols = j * tj + lax.broadcasted_iota(jnp.int32, w.shape, 1)
    if tj >= ti and tj % ti == 0:
        # The diagonal crossing exists only in the j-tile that contains this
        # i block's global row range — exactly one such j, but ONLY when the
        # i block cannot straddle a j-tile boundary (TJ a multiple of TI;
        # e.g. ti=32, tj=48, i=1 spans rows 32-63 = j-tiles 0 AND 1, and a
        # single diag_j would leave unmasked self-terms ~1e9x the physical
        # ones). Masking only there keeps the mask's select off every other
        # grid cell. (program_id math stays at kernel top level: the
        # interpret-mode HLO lowering can't bind program_id inside a
        # pl.when branch body.)
        diag_j = (i * ti) // tj

        @pl.when(j == diag_j)
        def _():
            out_ref[:] += lax.dot_general(
                jnp.where(rows == cols, 0.0, w), qj4,
                (((1,), (0,)), ((), ())), precision=accum_precision,
                preferred_element_type=jnp.float32)

        @pl.when(j != diag_j)
        def _():
            out_ref[:] += lax.dot_general(
                w, qj4, (((1,), (0,)), ((), ())), precision=accum_precision,
                preferred_element_type=jnp.float32)
    else:
        # zero the self-interaction crossing unconditionally (ti > tj, or
        # misaligned tiles where an i block spans several j-tiles)
        out_ref[:] += lax.dot_general(
            jnp.where(rows == cols, 0.0, w), qj4, (((1,), (0,)), ((), ())),
            precision=accum_precision, preferred_element_type=jnp.float32)


def pallas_accel_mxu(q, gm, *, eps: float, tile_i: int = 512,
                     tile_j: int = 2048, interpret: bool = False,
                     gram_precision=None, accum_precision=None):
    """All-pairs accelerations, MXU formulation. q: (n, 3) f32; gm: (n,).

    Same contract as pallas_accel (n divisible by tiles; zero-mass padding
    is exact: pad rows get w = 0 from gm = 0). gram_precision defaults to
    HIGHEST (f32-faithful Gram products — DEFAULT's bf16 inputs would put
    ~2^-8 relative error on d2); accum_precision defaults to HIGHEST too
    (measured on v5e: the W@[qj|1] matmul is nowhere near the bottleneck,
    so the 6-pass f32 emulation is free accuracy).
    """
    with jax.enable_x64(False):
        return _pallas_accel_mxu(
            q, gm, eps=eps, tile_i=tile_i, tile_j=tile_j,
            interpret=interpret,
            gram_precision=(gram_precision or lax.Precision.HIGHEST),
            accum_precision=(accum_precision or lax.Precision.HIGHEST))


@functools.partial(jax.jit, static_argnames=(
    "eps", "tile_i", "tile_j", "interpret", "gram_precision",
    "accum_precision"))
def _pallas_accel_mxu(q, gm, *, eps: float, tile_i: int, tile_j: int,
                      interpret: bool, gram_precision, accum_precision):
    n = q.shape[0]
    tile_i = min(tile_i, n)
    tile_j = min(tile_j, n)
    assert n % tile_i == 0 and n % tile_j == 0, (n, tile_i, tile_j)
    qf = q.astype(jnp.float32)
    qi4 = jnp.concatenate([qf, jnp.zeros((n, 1), jnp.float32)], axis=1)
    qj4 = jnp.concatenate([qf, jnp.ones((n, 1), jnp.float32)], axis=1)
    gmn = jnp.stack([gm.astype(jnp.float32),
                     jnp.sum(qf * qf, axis=1)])                   # (2, n)

    kernel = functools.partial(_accel_kernel_mxu, eps2=eps * eps,
                               gram_precision=gram_precision,
                               accum_precision=accum_precision)
    out = pl.pallas_call(
        kernel,
        grid=(n // tile_i, n // tile_j),
        in_specs=[
            pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_j, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_j), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(8 + 8) * n * n,         # Gram + accumulation matmuls
            bytes_accessed=q.size * 8 + gm.size * 4,
            transcendentals=n * n,
        ),
        interpret=interpret,
    )(qi4, qj4, gmn)
    return out[:, :3] - out[:, 3:4] * qf


def pallas_step_mxu(q, v, gm, *, eps: float, dt: float, tile_i: int = 512,
                    tile_j: int = 2048, interpret: bool = False,
                    gram_precision=None, accum_precision=None):
    """Fused step on the MXU kernel (bench/throughput path)."""
    a = pallas_accel_mxu(q, gm, eps=eps, tile_i=tile_i, tile_j=tile_j,
                         interpret=interpret, gram_precision=gram_precision,
                         accum_precision=accum_precision)
    v = v + a * dt
    q = q + v * dt
    return q, v


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
