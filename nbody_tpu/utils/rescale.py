"""Exact power-of-2 unit rescaling.

The graded scenes live at astronomical magnitudes (positions ~1e20 m, masses
~1e36 kg, squared distances ~1e41) that overflow float32 — and therefore
overflow both the fp32 fast path AND the TPU's double-double f64 emulation,
whose range is float32's. Rescaling by powers of two is EXACT in floating
point (it only shifts exponents), so a rescaled simulation computes, op for
op, the same significands as the original — every intermediate is the
original value times a known power of 2.

Transform (time is untouched):
    q' = q * 2^qe     v' = v * 2^qe      m' = m * 2^me
    eps' = eps * 2^qe   R' = R * 2^qe    missile_speed' = speed * 2^qe
    G' = G * 2^(3*qe - me)
so that a' = G' m' dq' / (|dq'|^2 + eps'^2)^1.5 = a * 2^qe, making the
integrator scale-covariant. Distances unscale by 2^-qe; step indices and
missile costs (functions of t only) are unchanged.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from ..config import SimConfig
from ..io import Scene


@dataclasses.dataclass(frozen=True)
class Rescale:
    qe: int   # position/velocity/length exponent shift
    me: int   # mass exponent shift

    @property
    def length_scale(self) -> float:
        return math.ldexp(1.0, self.qe)

    @property
    def mass_scale(self) -> float:
        return math.ldexp(1.0, self.me)

    def apply_scene(self, scene: Scene) -> Scene:
        ls, ms = self.length_scale, self.mass_scale
        return dataclasses.replace(
            scene, q=scene.q * ls, v=scene.v * ls, m=scene.m * ms)

    def apply_cfg(self, cfg: SimConfig) -> SimConfig:
        ls = self.length_scale
        g_scale = math.ldexp(1.0, 3 * self.qe - self.me)
        return dataclasses.replace(
            cfg,
            G=cfg.G * g_scale,
            eps=cfg.eps * ls,
            planet_radius=cfg.planet_radius * ls,
            missile_speed=cfg.missile_speed * ls,
        )

    def unscale_length(self, x):
        return x * math.ldexp(1.0, -self.qe)


def compute_rescale(scene: Scene, target_q_exp: int = 20,
                    target_m_exp: int = 0) -> Rescale:
    """Pick exponent shifts bringing max |position| to ~2^target_q_exp and
    max mass to ~2^target_m_exp.

    target_q_exp=20 keeps squared distances <~2^43 (f32-safe) while keeping
    eps'^2 above the f32 normal floor for scenes up to |q| ~ 1e21.
    """
    qmax = float(np.max(np.abs(scene.q)))
    # Velocities over the run can grow positions; headroom is ample at 2^20.
    mmax = float(np.max(scene.m))
    qe = target_q_exp - (math.frexp(qmax)[1] if qmax > 0 else 0)
    me = target_m_exp - (math.frexp(mmax)[1] if mmax > 0 else 0)
    return Rescale(qe=qe, me=me)


IDENTITY = Rescale(qe=0, me=0)
