"""Pallas TPU kernel for the BIT-EXACT e64 softfloat force evaluation.

The answer-grade path's hot loop (ops/forces.pairwise_accel_e64 — the
TPU twin of the reference's graded force kernel, hw5.cu:159-215 run at
f64 semantics) rebuilt as a hand-scheduled Mosaic kernel. Two reasons
beyond raw speed:

  * Layout control. The softfloat chain is ~2.5k uint32 lane-ops per
    pair; under XLA its (..., n, tile) intermediates are subject to the
    compiler's layout/fusion choices, and the measured same-code kernel
    speed swings 4.4x with compile-service state (results/ACCURACY.md,
    "Measurement-environment caveat"). The f32 Pallas kernel is immune
    to that swing; this kernel buys the same determinism for the graded
    path.
  * Shape discipline. Row blocks live as (R, 128) native u32 tiles —
    every VPU op is fully lane- and sublane-utilized by construction,
    instead of relying on XLA to relayout (n, 3)-minor tensors well.

Semantics are IDENTICAL to pairwise_accel_e64(fold='serial'): per pair
  dx = q[j] - q[i];  d2 = ((dx2 + dy2) + dz2) + eps2;
  d3 = d2 * sqrt(d2);  term = (gm[j] * dx) / d3
with every op correctly rounded to binary64 (ops/f64emu), folded over j
in ascending order (native/core.cc:98-110; samples/nbody.cc:57-88). The
grid is (i-blocks, j-tiles) with j the minor, sequentially-executed
dimension — each i-block's accumulator rides its output block across
j-tiles (ascending), and inside a tile a fori_loop folds columns one at
a time (ascending): the global fold order is exactly the serial spec's.
The j == i term needs no mask: its numerator is +-0, so the term is
+-0, and accumulating +-0 is an IEEE identity (the accumulator starts
+0 and RNE sums of nonzeros never produce -0).

gm[j] = G * m_eff[j] is computed OUTSIDE the kernel (one packed e64 mul
per body per step) — the same bit-for-bit hoisting pairwise_accel_e64
documents (the spec just recomputes the product per pair).

In-kernel softfloat notes: Mosaic has no optimization_barrier lowering,
so the division's Dekker two_prod uses the barrier-free split
(f64emu._two_prod_nb — safe inside a kernel, where XLA's HLO algebraic
simplifier never runs). Everything else is u32/i32 lane arithmetic plus
exact-cast f32 estimates, all prepared for Mosaic (bool selects as
logic ops, casts hopped through i32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import f64emu as fe

_LANES = 128


def _broadcast_quad(quad, shape):
    return tuple(jnp.broadcast_to(x, shape) for x in quad)


def _e64_kernel(jh_ref, jl_ref,
                qxh_ref, qxl_ref, qyh_ref, qyl_ref, qzh_ref, qzl_ref,
                axh_ref, axl_ref, ayh_ref, ayl_ref, azh_ref, azl_ref,
                *, tile_j: int, sub_j: int, eps2_bits: tuple[int, int],
                j_axis: int = 1, ablate: str = ""):
    """Grid point (i, j) — or (b, i, j) with a leading scenario-batch grid
    dimension (j_axis=2): fold j-tile columns into the i-row block.

    jh/jl_ref: (4, TJ) u32 in SMEM — packed hi/lo of (qx, qy, qz, gm)
               for the j-tile, read one scalar per (component, fold step).
               Components-major: with TJ minor the scoped window stays
               (8, TJ)-padded (~8 KB at TJ=256) instead of the
               (TJ, 4)-major layout's 128-lane padding (256 KB per
               buffering level — measured blowing the scoped-memory
               budget at TJ=512).
    q*_ref:    (R, 128) u32 in VMEM — the i-side rows, packed hi/lo.
    a*_ref:    (R, 128) u32 — accumulated accelerations, packed; carried
               across the sequential j grid dimension.

    sub_j: columns evaluated per chain pass. The per-pair softfloat
    chain is one long dependency chain — evaluating a single column per
    pass leaves the VPU pipeline latency-bound. Stacking sub_j
    independent columns as (R, sub_j, 128) tensors gives every vector
    op sub_j*R/8 independent vregs of work; only the j-ascending FOLD at
    the end of each pass is serial (bits identical for any sub_j — the
    fold order never changes).

    Layout note (measured r5): the stack puts sub_j in the MINOR-two
    dims — (R, sub_j, 128), minor tile (sub_j, 128) = a full native
    (8, 128) vreg tile at the default sub_j=8 — NOT (sub_j, R, 128),
    whose minor (R, 128) tile is fractional whenever the i-block has
    fewer than 8 row-tiles (R = n/128 < 8): at n=256 (R=2) every chain
    op then runs on quarter-filled vregs, which measured as a 4.1x
    per-pair gap vs n=1024 (results/ACCURACY.md round 5).
    """
    jt = pl.program_id(j_axis)

    @pl.when(jt == 0)
    def _():
        # +0.0 is the all-zeros bit pattern
        for ref in (axh_ref, axl_ref, ayh_ref, ayl_ref, azh_ref, azl_ref):
            ref[:] = jnp.zeros_like(ref)

    shape = axh_ref.shape                        # (R, 128)
    wide = (shape[0], sub_j, shape[1])           # minor tile: (sub_j, 128)
    eps2_u = _broadcast_quad(
        fe.unpack(jnp.uint32(eps2_bits[0]), jnp.uint32(eps2_bits[1])),
        wide)

    qi_u = [fe.unpack(h_ref[:], l_ref[:])
            for h_ref, l_ref in ((qxh_ref, qxl_ref), (qyh_ref, qyl_ref),
                                 (qzh_ref, qzl_ref))]
    nqi_u = [tuple(jnp.broadcast_to(x[:, None, :], wide)
                   for x in fe.neg_u(*q)) for q in qi_u]

    acc = tuple(fe.unpack(h_ref[:], l_ref[:])
                for h_ref, l_ref in ((axh_ref, axl_ref), (ayh_ref, ayl_ref),
                                     (azh_ref, azl_ref)))

    def fold_pass(p, acc):
        j0 = p * sub_j
        # (R, sub_j, 128) column stacks: scalar SMEM reads broadcast one
        # (sub_j, 128) full tile (one sublane per column), shared across
        # the leading (untiled) R row-tiles
        cols = []
        for k in range(4):
            quads = [fe.unpack(jh_ref[k, j0 + s], jl_ref[k, j0 + s])
                     for s in range(sub_j)]
            cols.append(tuple(
                jnp.broadcast_to(
                    jnp.stack([jnp.broadcast_to(qd[c], (shape[1],))
                               for qd in quads])[None], wide)
                for c in range(4)))
        qj_u, gm_u = cols[:3], cols[3]
        dq = [fe.add_u(*qj_u[k], *nqi_u[k]) for k in range(3)]
        # `ablate` (timing instrumentation ONLY — scripts/
        # bench_e64_breakdown.py) truncates the chain after a stage and
        # folds whatever that stage produced, keeping every computed value
        # live so Mosaic cannot DCE the measured work. Production callers
        # never set it.
        if ablate == "dq":
            terms = dq
        else:
            # the d2 chain sums NONNEGATIVE values (sqr_u outputs + eps^2):
            # the sign-free add_pos_u is bit-identical there and skips the
            # subtract/cancellation machinery (fuzz-gated in test_f64emu)
            apos = lambda a, b: fe.add_pos_u(a[1], a[2], a[3],
                                             b[1], b[2], b[3])
            d2 = apos(apos(apos(fe.sqr_u(*dq[0]),
                                fe.sqr_u(*dq[1])),
                           fe.sqr_u(*dq[2])),
                      eps2_u)
            if ablate == "d2":
                terms = [d2, dq[1], dq[2]]
            else:
                d3 = fe.mul_u(*d2, *fe.sqrt_u(*d2))
                if ablate == "d3":
                    terms = [d3, dq[1], dq[2]]
                else:
                    num = [fe.mul_u(*gm_u, *dq[k]) for k in range(3)]
                    if ablate == "num":
                        # one extra add_u keeps d3 live (~1 op of noise)
                        terms = [num[0], num[1], fe.add_u(*num[2], *d3)]
                    else:
                        bm, rb, nbm = fe._div_prep(d3[2], d3[3],
                                                   in_kernel=True)
                        terms = [fe._div_core(*num[k], *d3,
                                              bm, rb, nbm, in_kernel=True)
                                 for k in range(3)]
        # j-ascending serial fold through the sub-tile (the spec's order)
        for s in range(sub_j):
            acc = tuple(fe.add_u(*acc[k], *(c[:, s] for c in terms[k]))
                        for k in range(3))
        return acc

    acc = lax.fori_loop(0, tile_j // sub_j, fold_pass, acc)

    for (h_ref, l_ref), quad in zip(((axh_ref, axl_ref), (ayh_ref, ayl_ref),
                                     (azh_ref, azl_ref)), acc):
        h, l = fe.pack_norm(*quad)
        h_ref[:] = h
        l_ref[:] = l


@functools.partial(jax.jit, static_argnames=("eps", "rows_i", "tile_j",
                                             "sub_j", "interpret", "ablate"))
def _pallas_accel_e64(qh, ql, gmh, gml, *, eps: float, rows_i: int,
                      tile_j: int, sub_j: int, interpret: bool,
                      ablate: str = ""):
    squeeze = qh.ndim == 2
    if squeeze:
        qh, ql, gmh, gml = qh[None], ql[None], gmh[None], gml[None]
    bat, n = qh.shape[0], qh.shape[1]
    assert n % (rows_i * _LANES) == 0 and n % tile_j == 0 \
        and tile_j % sub_j == 0, (n, rows_i, tile_j, sub_j)
    # j side: (B, 4, n) packed components (qx, qy, qz, gm) for SMEM scalar
    # reads — components-MAJOR so the j index is the minor (lane) dim of
    # the scoped window (see the kernel docstring's padding note)
    jh = jnp.concatenate([jnp.moveaxis(qh, -1, -2), gmh[..., None, :]],
                         axis=-2)
    jl = jnp.concatenate([jnp.moveaxis(ql, -1, -2), gml[..., None, :]],
                         axis=-2)
    # i side: each axis as (B, n/128, 128) native u32 tiles
    col = lambda a, k: a[..., k].reshape(bat, n // _LANES, _LANES)
    iside = [col(a, k) for k in range(3) for a in (qh, ql)]

    eps2 = float(eps) * float(eps)
    e2h, e2l = fe.from_f64(eps2)
    out = jax.ShapeDtypeStruct((bat, n // _LANES, _LANES), jnp.uint32)

    # Leading scenario-batch grid dimension, block-squeezed (None) so the
    # kernel body is byte-for-byte the unbatched one: cross-scenario pairs
    # never mix (each b grid step reads only its own j columns and i rows)
    # and the per-scenario fold order is unchanged — the batched call is
    # bit-identical to `bat` separate calls (tests/test_pallas_e64.py),
    # while the solver's scenario rows (the P1/P2 pair, P3's device rows —
    # the work hw5.cu:566/604 spreads over two GPUs) ride ONE kernel
    # launch per step.
    kernel = functools.partial(_e64_kernel, tile_j=tile_j, sub_j=sub_j,
                               eps2_bits=(int(e2h), int(e2l)), j_axis=2,
                               ablate=ablate)
    row_spec = pl.BlockSpec((None, rows_i, _LANES),
                            lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    lane_ops_per_pair = 2500
    axh, axl, ayh, ayl, azh, azl = pl.pallas_call(
        kernel,
        grid=(bat, n // (rows_i * _LANES), n // tile_j),
        in_specs=[
            pl.BlockSpec((None, 4, tile_j), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 4, tile_j), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.SMEM),
        ] + [row_spec] * 6,
        out_specs=[row_spec] * 6,
        out_shape=[out] * 6,
        cost_estimate=pl.CostEstimate(
            flops=lane_ops_per_pair * bat * n * n,
            bytes_accessed=qh.size * 16 + gmh.size * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jh, jl, *iside)
    stack = lambda h3: jnp.stack([h.reshape(bat, n) for h in h3], axis=-1)
    ah, al = stack((axh, ayh, azh)), stack((axl, ayl, azl))
    return (ah[0], al[0]) if squeeze else (ah, al)


def pallas_accel_e64(q, gm, *, eps: float, rows_i: int = 8,
                     tile_j: int = 256, sub_j: int = 8,
                     interpret: bool = False, ablate: str = ""):
    """Bit-exact binary64 all-pairs accelerations on the TPU via Pallas.

    q: E64 (n, 3) or (B, n, 3) with a leading scenario-batch dim; gm: E64
    (n,) / (B, n) = G * m_eff (packed e64 product, hoisted — same bits as
    the spec's per-pair recompute). n must be a multiple of rows_i * 128
    and of tile_j — pad with zero-MASS bodies (their terms are +-0, an
    IEEE accumulation identity; pad positions may duplicate an edge body
    so d3 > 0). Scenario rows never mix: the batch is a grid dimension,
    one independent all-pairs problem per row.

    Returns E64 matching q's leading shape, byte-identical to
    pairwise_accel_e64(fold='serial') and to the serial spec.

    Traced with x64 disabled: under x64 Pallas grid index maps become
    int64, which Mosaic cannot legalize (ops/pallas_forces.py:72-75).
    """
    with jax.enable_x64(False):
        ah, al = _pallas_accel_e64(q.hi, q.lo, gm.hi, gm.lo, eps=eps,
                                   rows_i=rows_i, tile_j=tile_j,
                                   sub_j=min(sub_j, tile_j),
                                   interpret=interpret, ablate=ablate)
    return fe.E64(ah, al)
