"""Pallas TPU tiled all-pairs force kernel (fp32 throughput path).

The TPU-native replacement for the reference's hot CUDA kernel
`compute_accelerations_gpu` (hw5.cu:159-215). Design differences, per the
hardware:

  * The CUDA kernel assigns one thread per (i, j) pair and reduces rows with
    fp64 atomicAdd (hw5.cu:211-213) — non-deterministic summation. Here the
    grid is over i-row tiles only; each program loops over j-tiles
    IN ORDER and accumulates (TI, TJ) partial forces on the VPU —
    deterministic by construction, no atomics (TPU has none; it doesn't
    need them).
  * Body tiles live in VMEM: the j-side coordinate rows ((3, n) f32) and
    masses are a few MB even at n = 65536, so each i-program streams the
    whole j-dimension from VMEM with zero HBM re-reads.
  * The oscillating device masses are folded into `gm_row = G * m_eff(t)`
    on the host side of the kernel (one (n,) elementwise op per step), the
    same hoisting as the reference's PREPROCESS_FST table (hw5.cu:143-148)
    but without a table: it is fused by XLA into the step.

Self-interactions need no masking: dq = 0 makes the numerator zero while
softening keeps the denominator finite (same identity the serial spec's
`continue` expresses, samples/nbody.cc:59-60).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _accel_kernel(qcol_ref, qrow_ref, gm_ref, out_ref, *, eps2: float,
                  tile_j: int):
    """One i-tile of rows against the full j-dimension.

    qcol_ref: (TI, 3)  — i-side positions (this program's row block)
    qrow_ref: (3, n)   — j-side positions, lanes along n
    gm_ref:   (1, n)   — G * m_eff per j body
    out_ref:  (TI, 3)  — accelerations for the row block
    """
    ti = qcol_ref.shape[0]
    n = qrow_ref.shape[1]
    num_jt = n // tile_j

    qxi = qcol_ref[:, 0:1]                      # (TI, 1)
    qyi = qcol_ref[:, 1:2]
    qzi = qcol_ref[:, 2:3]

    def jt_body(jt, acc):
        ax, ay, az = acc
        sl = pl.ds(jt * tile_j, tile_j)
        dx = qrow_ref[0:1, sl] - qxi            # (TI, TJ)
        dy = qrow_ref[1:2, sl] - qyi
        dz = qrow_ref[2:3, sl] - qzi
        d2 = dx * dx + dy * dy + dz * dz + eps2
        inv = lax.rsqrt(d2)
        w = gm_ref[0:1, sl] * (inv * inv * inv)
        ax = ax + jnp.sum(w * dx, axis=1, keepdims=True)
        ay = ay + jnp.sum(w * dy, axis=1, keepdims=True)
        az = az + jnp.sum(w * dz, axis=1, keepdims=True)
        return ax, ay, az

    zero = jnp.zeros((ti, 1), dtype=out_ref.dtype)
    ax, ay, az = lax.fori_loop(0, num_jt, jt_body, (zero, zero, zero))
    out_ref[:, 0:1] = ax
    out_ref[:, 1:2] = ay
    out_ref[:, 2:3] = az


@functools.partial(jax.jit, static_argnames=("eps", "tile_i", "tile_j"))
def pallas_accel(q, gm, *, eps: float, tile_i: int = 256,
                 tile_j: int = 2048):
    """All-pairs accelerations. q: (n, 3) f32; gm: (n,) f32 = G*m_eff.

    n must be a multiple of max(tile_i, tile_j) — pad with zero-mass bodies
    (exact: they contribute +0.0 to every sum).
    """
    n = q.shape[0]
    tile_j = min(tile_j, n)
    tile_i = min(tile_i, n)
    assert n % tile_i == 0 and n % tile_j == 0, (n, tile_i, tile_j)
    qrow = q.T                                   # (3, n), tiny transpose
    gmrow = gm[None, :]                          # (1, n)

    kernel = functools.partial(_accel_kernel, eps2=eps * eps, tile_j=tile_j)
    flops_per_pair = 16
    return pl.pallas_call(
        kernel,
        grid=(n // tile_i,),
        in_specs=[
            pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n * n,
            bytes_accessed=q.size * 4 * 2 + gm.size * 4,
            transcendentals=n * n,  # rsqrt
        ),
    )(q, qrow, gmrow)


def pallas_step(q, v, gm, *, eps: float, dt: float, tile_i: int = 256,
                tile_j: int = 2048):
    """Fused force + symplectic-Euler update (the Pallas fast path's analog
    of hw5.cu's compute_accelerations_gpu + update_positions_gpu pair)."""
    a = pallas_accel(q, gm, eps=eps, tile_i=tile_i, tile_j=tile_j)
    v = v + a * dt
    q = q + v * dt
    return q, v
