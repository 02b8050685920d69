"""Pairwise softened-gravity accelerations (XLA path).

The TPU answer to the reference's hot kernel `compute_accelerations_gpu`
(hw5.cu:159-215): instead of a 2D CUDA grid with fp64 atomicAdd row
reductions (whose non-deterministic summation order made the reference
disagree with its own goldens on 2/12 cases — SURVEY.md §4), we compute the
full interaction tensor with broadcasting and reduce with a fixed-order
`jnp.sum`. Deterministic by construction: same input → same bits, every run.

a_i = sum_j G * m_j * (q_j - q_i) / (|q_j - q_i|^2 + eps^2)^1.5

The j == i term is exactly zero (softening keeps the denominator finite and
the numerator is 0), and adding 0.0 is an fp identity, so no diagonal mask is
needed — same trick the serial spec's `continue` makes explicit
(samples/nbody.cc:59-60).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _dist3(d2, mode: str):
    if mode == "dsqrt":
        return d2 * jnp.sqrt(d2)
    if mode == "sqrt3":
        return jnp.sqrt(d2 * d2 * d2)
    if mode == "pow":
        return jnp.power(d2, 1.5)
    raise ValueError(f"unknown dist3_mode: {mode}")


def pairwise_accel(q, m_eff, *, G: float, eps: float,
                   dist3_mode: str = "dsqrt"):
    """Exact-order fp64 accelerations (graded path).

    q: (..., n, 3); m_eff: (..., n) effective masses at this step.
    Returns (..., n, 3).

    Per-pair fp64 op order follows samples/nbody.cc:65-72:
      dq = q_j - q_i; d2 = dx*dx + dy*dy + dz*dz + eps*eps;
      term = ((G*m_j) * dq) / dist3.
    """
    # dq[..., i, j, :] = q_j - q_i
    dq = q[..., None, :, :] - q[..., :, None, :]
    d2 = (dq * dq).sum(axis=-1) + (eps * eps)
    dist3 = _dist3(d2, dist3_mode)
    gm = G * m_eff                                      # (..., n) over j
    terms = (gm[..., None, :, None] * dq) / dist3[..., None]
    return terms.sum(axis=-2)                           # reduce over j


def pairwise_accel_tf3(q, m_eff, *, G: float, eps: float):
    """Extended-precision (triple-float32, ~2^-64/op) accelerations — the
    answer-grade TPU path (precision 'ddp'). Same physics as pairwise_accel
    (hw5.cu:199-210), rsqrt formulation.

    Flush-safety: XLA flushes f32 subnormals to zero (measured), so a tf3
    value keeps full relative precision only while its ~2^-70-level error
    terms stay normal, i.e. |value| >= ~2^-56. In the engine's rescale
    window d^2 spans ~2^100 across pairs and d^-3 spans ~2^150 — far beyond
    the ~2^90 healthy band, so NO static shift can protect the whole kernel
    (a single 2^32 shift was measured to leave far-pair weights at ~2^-50
    relative error, worse than f64). Every wide-range intermediate therefore
    gets a DYNAMIC exact power-of-two gauge:

      * per-pair: d2 is normalized by its own even exponent e2 to [1, 4);
        rsqrt/cube run entirely in (0.125, 1] — the healthiest band there
        is — and the folded-out factor 2^(-3*e2/2) is re-applied to the
        final per-pair term as one exact exponent-arithmetic scale.
      * per-row (i): each row's terms are anchored so the largest sits at
        ~2^30 before the reduction; terms more than ~105 bits below the
        row max flush to zero — absolute error ~2^-105 of the row's
        acceleration, far beyond f64. The anchor is removed exactly after
        the sum.
      * masses: G*m_j lifted so the largest is ~2^16 (lightest masses
        otherwise sit near the flush boundary), removed in the same final
        unscale.

    Coincident pairs (d2 == eps^2 exactly: the i==j diagonal and zero-mass
    pad bodies at the same point) contribute exactly zero (the numerator dq
    is exactly 0); d2 is replaced by 1 there so the cube stays finite —
    semantics-exact, mirroring the serial spec's `continue`
    (samples/nbody.cc:59-60).

    q: TF3 (..., n, 3); m_eff: TF3 (..., n). Returns TF3 (..., n, 3).
    """
    from . import tfloat as tf

    x = q[..., 0]
    y = q[..., 1]
    z = q[..., 2]
    dx = x[..., None, :] - x[..., :, None]          # (..., i, j)
    dy = y[..., None, :] - y[..., :, None]
    dz = z[..., None, :] - z[..., :, None]
    eps2 = tf.const(eps, like=dx.hi) * tf.const(eps, like=dx.hi)
    d2 = dx * dx + dy * dy + dz * dz + eps2
    coincident = tf.eq(d2, eps2)   # |dq|^2 rounds to 0 only for dq == 0
    d2s = tf.where(coincident, tf.const(1.0, like=d2.hi), d2)
    # per-pair even-exponent gauge: d2n = d2 * 2^-e2 in [1, 4)
    e2 = tf.exp_bits(d2s.hi) & jnp.int32(~1)        # round down to even
    d2n = tf.scale_dyn(d2s, tf.exp2_i32(-e2))
    rinvn = tf.rsqrt(d2n)                           # in (0.5, 1]
    rinv3n = (rinvn * rinvn) * rinvn                # in (0.125, 1]
    pe = jnp.int32(-3) * (e2 >> 1)                  # d^-3 = rinv3n * 2^pe
    # Mass gauge: anchor the largest |G*m| at ~2^16 (exact 2^k lift).
    mx = jnp.max(m_eff.hi)
    gm_mag = jnp.float32(abs(G)) * mx
    gscale_e = jnp.where(gm_mag > 0,
                         jnp.int32(16) - tf.exp_bits(gm_mag), jnp.int32(0))
    gscale = tf.exp2_i32(gscale_e)
    g0 = tf.const(G, like=m_eff.hi)
    g_s = tf.TF3(g0.hi * gscale, g0.mid * gscale, g0.lo * gscale)  # exact
    gm = g_s * m_eff
    gm_j = tf.TF3(gm.hi[..., None, :], gm.mid[..., None, :],
                  gm.lo[..., None, :])              # broadcast over i
    w = gm_j * rinv3n                               # (..., i, j), healthy
    comps = []
    for dc in (dx, dy, dz):
        tn = w * dc                                 # term * 2^-pe * gscale
        # row anchor: log2 of each pair's true term is exp_bits(tn.hi) + pe
        # (within 1 bit); anchor the row max at 2^30.
        lt = tf.exp_bits(tn.hi) + pe                # (..., i, j)
        row_l = jnp.max(lt, axis=-1)                # (..., i)
        g = tf.exp2_i32(jnp.int32(30) - row_l[..., None] + pe)
        s = tf.sum_binned(tf.scale_dyn(tn, g), axis=-1)
        # exact unscale: remove the row anchor and the mass gauge. Applied
        # as two half-exponent multiplies so the FACTOR never underflows
        # f32 even for rows whose acceleration sits near (or below) the
        # flush threshold — only the value itself may flush, which is an
        # absolute ~2^-126-class loss, far beyond f64.
        ue = row_l - jnp.int32(30) - gscale_e
        s = tf.scale_dyn(s, tf.exp2_i32(ue - (ue >> 1)))
        comps.append(tf.scale_dyn(s, tf.exp2_i32(ue >> 1)))
    return tf.stack(comps, axis=-1)


def pairwise_accel_e64(q, m_eff, *, G: float, eps: float,
                       fold: str = "serial"):
    """BIT-EXACT binary64 accelerations via the integer softfloat
    (ops/f64emu) — the answer-grade 'e64' TPU path.

    Reproduces native/core.cc:98-110 exactly: per-pair op order
      dx = q[j] - q[i];  d2 = ((dx*dx + dy*dy) + dz*dz) + eps*eps;
      d3 = d2 * sqrt(d2);  term = ((G*m[j]) * dx) / d3
    with every op correctly rounded to binary64, and (fold='serial') the
    j-ascending accumulation order of the serial spec. G*m[j] is hoisted
    out of the i loop — same value bit-for-bit, the spec just recomputes
    it. The j == i term is included instead of skipped: its numerator is
    +-0 so the term is +-0, and accumulating +-0 is an IEEE identity
    (the accumulator can never be -0: it starts +0 and RNE sums of
    nonzeros never produce -0). dist3 is the dsqrt form — measured
    byte-golden against the pow goldens on every testcase.

    fold='tree' replaces the serial j-order with a fixed pairwise-halving
    order: still deterministic and correctly rounded per op, but not the
    spec's accumulation order (use for throughput experiments; the graded
    path defaults to 'serial').

    q: E64 (..., n, 3); m_eff: E64 (..., n). Returns E64 (..., n, 3).
    """
    from . import f64emu as fe
    E64 = fe.E64

    n = q.shape[-2]
    # dq[..., i, j, :] = q_j - q_i
    qj = q[..., None, :, :]
    qi = q[..., :, None, :]
    dq = [qj[..., k] - qi[..., k] for k in range(3)]       # 3 x (..., i, j)
    d2 = ((dq[0] * dq[0] + dq[1] * dq[1]) + dq[2] * dq[2]) \
        + fe.const_e(float(eps) * float(eps))
    d3 = d2 * fe.sqrt_e(d2)
    gm = fe.const_e(float(G)) * m_eff                      # (..., j)
    gmj = gm[..., None, :]                                 # (..., i=1, j)
    terms = [(gmj * dq[k]) / d3 for k in range(3)]         # (..., i, j)

    def fold_serial(t):
        # accumulate over j ascending — the spec's order (core.cc:99)
        tj = E64(jnp.moveaxis(t.hi, -1, 0), jnp.moveaxis(t.lo, -1, 0))
        acc0 = fe.zeros_e(t.shape[:-1])
        acc, _ = lax.scan(lambda a, x: (a + E64(x[0], x[1]), None),
                          acc0, (tj.hi, tj.lo), unroll=8)
        return acc

    def fold_tree(t):
        # fixed pairwise halving over j (deterministic, not spec order)
        hi, lo = t.hi, t.lo
        m = hi.shape[-1]
        p = 1
        while p < m:
            p *= 2
        if p != m:
            pad = [(0, 0)] * (hi.ndim - 1) + [(0, p - m)]
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
        cur = E64(hi, lo)
        while cur.shape[-1] > 1:
            h = cur.shape[-1] // 2
            cur = cur[..., :h] + cur[..., h:2 * h]
        return cur[..., 0]

    folder = fold_serial if fold == "serial" else fold_tree
    comps = [folder(t) for t in terms]
    return E64(jnp.stack([c.hi for c in comps], axis=-1),
               jnp.stack([c.lo for c in comps], axis=-1))


def pairwise_accel_fast(q, m_eff, *, G: float, eps: float):
    """Throughput-oriented variant (fp32/bf16 paths): rsqrt instead of a
    divide, factored as w_ij = (G*m_j) * inv_d^3; a = sum_j w_ij * dq."""
    dq = q[..., None, :, :] - q[..., :, None, :]
    d2 = (dq * dq).sum(axis=-1) + (eps * eps)
    inv_d = lax.rsqrt(d2)
    w = (G * m_eff)[..., None, :] * (inv_d * inv_d * inv_d)
    return (w[..., None] * dq).sum(axis=-2)
