"""Physics diagnostics: conserved-quantity monitors.

Observability the reference lacks entirely: total energy / momentum of the
system, useful for validating integrator health on long runs (symplectic
Euler conserves a shadow Hamiltonian, so energy should oscillate boundedly
rather than drift for stable systems).
"""

from __future__ import annotations

import jax.numpy as jnp


def kinetic_energy(v, m):
    """Sum_i 1/2 m_i |v_i|^2. v: (..., n, 3), m: (..., n)."""
    return 0.5 * (m * (v * v).sum(-1)).sum(-1)


def potential_energy(q, m, *, G: float, eps: float):
    """Softened pairwise potential: -G/2 * sum_{i != j} m_i m_j / sqrt(r^2+eps^2).

    (The 1/2 de-duplicates ordered pairs; the diagonal is masked because,
    unlike the force, the self-potential is NOT zero.)"""
    dq = q[..., None, :, :] - q[..., :, None, :]
    d2 = (dq * dq).sum(-1) + eps * eps
    inv = 1.0 / jnp.sqrt(d2)
    n = q.shape[-2]
    mask = 1.0 - jnp.eye(n, dtype=q.dtype)
    mm = m[..., :, None] * m[..., None, :]
    return -0.5 * G * (mm * inv * mask).sum((-2, -1))


def total_energy(q, v, m, *, G: float, eps: float):
    return kinetic_energy(v, m) + potential_energy(q, m, G=G, eps=eps)


def total_momentum(v, m):
    return (m[..., None] * v).sum(-2)


def total_angular_momentum(q, v, m):
    return (m[..., None] * jnp.cross(q, v)).sum(-2)
