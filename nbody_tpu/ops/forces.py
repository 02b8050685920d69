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


def pairwise_accel_tf3(q, m_eff, *, G: float, eps: float, shift: int = 32):
    """Extended-precision (triple-float32, ~2^-68/op) accelerations — the
    answer-grade TPU path (precision 'ddp'). Same physics as pairwise_accel
    (hw5.cu:199-210), rsqrt formulation.

    Flush-safety (XLA flushes f32 subnormals — measured on both the XLA CPU
    backend and assumed on TPU): any materialized value below ~2e-31 loses
    its third (|x| < 3.3e-24) or second (|x| < 2e-31) component and with it
    the answer-grade precision. Two intermediates are at risk:

      * 1/d^3 for far pairs (~1e-33 in the rescale window): kept in a
        2^shift-scaled domain end-to-end — the per-pair weights, terms and
        the j-sum all carry the factor 2^shift and are only unshifted once,
        exactly, after the reduction.
      * d^(-3/2) at coincident pairs (d2 == eps^2, i.e. the i==j diagonal
        and zero-mass pad bodies at the same point): rsqrt(eps'^2)^3 * 2^s
        overflows f32. Those pairs contribute exactly zero (the numerator
        dq is exactly 0), so d2 is replaced by 1 there — semantics-exact,
        mirroring the serial spec's `continue` (samples/nbody.cc:59-60).

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
    rinv = tf.rsqrt(d2s)
    rinv3_s = (rinv * rinv) * tf.scale2(rinv, shift)   # = d^-3 * 2^shift
    # Mass gauge: G*m_j for the lightest bodies can sit near the f32 flush
    # boundary (~1e-35 in the rescale window), where its triple loses the
    # mid/lo components (2^-24-level per-term force error — measured as
    # 2e-11 per-body errors when a tiny mass is a body's dominant puller).
    # Lift all G*m products by a traced power of two anchored so the
    # LARGEST sits at ~2^16, and unshift the final sum exactly.
    mx = jnp.max(m_eff.hi)
    gm_mag = jnp.float32(abs(G)) * mx
    gscale = tf._pow2_floor(jnp.where(gm_mag > 0,
                                      jnp.float32(2.0 ** 16) / gm_mag,
                                      jnp.float32(1.0)))
    g0 = tf.const(G, like=m_eff.hi)
    g_s = tf.TF3(g0.hi * gscale, g0.mid * gscale, g0.lo * gscale)  # exact
    gm = g_s * m_eff
    gm_j = tf.TF3(gm.hi[..., None, :], gm.mid[..., None, :],
                  gm.lo[..., None, :])               # broadcast over i
    w_s = gm_j * rinv3_s                     # (..., i, j) * 2^shift * gscale
    a_s = tf.stack([tf.sum_binned(w_s * dc, axis=-1)
                    for dc in (dx, dy, dz)], axis=-1)
    inv = (jnp.float32(1.0) / gscale) * jnp.float32(2.0 ** -shift)  # exact
    return tf.TF3(a_s.hi * inv, a_s.mid * inv, a_s.lo * inv)


def pairwise_accel_fast(q, m_eff, *, G: float, eps: float):
    """Throughput-oriented variant (fp32/bf16 paths): rsqrt instead of a
    divide, factored as w_ij = (G*m_j) * inv_d^3; a = sum_j w_ij * dq."""
    dq = q[..., None, :, :] - q[..., :, None, :]
    d2 = (dq * dq).sum(axis=-1) + (eps * eps)
    inv_d = lax.rsqrt(d2)
    w = (G * m_eff)[..., None, :] * (inv_d * inv_d * inv_d)
    return (w[..., None] * dq).sum(axis=-2)
