"""Symplectic (semi-implicit) Euler integration.

v += a*dt; q += v*dt — exactly the reference's update
(hw5.cu:231-239 `update_positions_gpu`, samples/nbody.cc:76-88). The force
computation and the update are fused into one traced function; XLA fuses the
elementwise tail into the force reduction, replacing the reference's separate
`update_positions_gpu` kernel launch per step.
"""

from __future__ import annotations

from .forces import pairwise_accel, pairwise_accel_fast


def symplectic_euler_step(q, v, m_eff, *, G: float, eps: float, dt: float,
                          dist3_mode: str = "dsqrt", fast: bool = False):
    """One integration step. q, v: (..., n, 3); m_eff: (..., n)."""
    if fast:
        a = pairwise_accel_fast(q, m_eff, G=G, eps=eps)
    else:
        a = pairwise_accel(q, m_eff, G=G, eps=eps, dist3_mode=dist3_mode)
    v = v + a * dt
    q = q + v * dt
    return q, v
