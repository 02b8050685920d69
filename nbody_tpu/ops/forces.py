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


def pairwise_accel_fast(q, m_eff, *, G: float, eps: float):
    """Throughput-oriented variant (fp32/bf16 paths): rsqrt instead of a
    divide, factored as w_ij = (G*m_j) * inv_d^3; a = sum_j w_ij * dq."""
    dq = q[..., None, :, :] - q[..., :, None, :]
    d2 = (dq * dq).sum(axis=-1) + (eps * eps)
    inv_d = lax.rsqrt(d2)
    w = (G * m_eff)[..., None, :] * (inv_d * inv_d * inv_d)
    return (w[..., None] * dq).sum(axis=-2)
