"""Pure-numpy serial oracle used by unit tests.

Implements the serial executable spec's semantics (samples/nbody.cc:51-138)
with plain Python loops over steps and vectorized-but-ordered force sums, for
small n and few steps only. This is the *test* oracle; the production-grade
C++ oracle lives in native/oracle.cc.
"""

import math

import numpy as np


def device_mass(m0, t, period=6000.0):
    return m0 + 0.5 * m0 * abs(math.sin(t / period))


def run_steps(q, v, m0, is_device, n_steps, *, devices_on=True, dt=60.0,
              eps=1e-3, G=6.674e-11, start_step=0, dead_device=None,
              planet=None, asteroid=None, planet_radius=1e7):
    """March `n_steps` steps serially from global step `start_step`.

    Returns (q, v, hit_step) where hit_step is the first global step in
    (start_step, start_step+n_steps] with planet-asteroid distance below the
    planet radius (-2 if none, or if planet/asteroid is None).
    """
    q = q.astype(np.float64).copy()
    v = v.astype(np.float64).copy()
    n = q.shape[0]
    hit_step = -2
    for local in range(1, n_steps + 1):
        step = start_step + local
        t = step * dt
        m = m0.copy()
        for j in range(n):
            if is_device[j]:
                if not devices_on or j == dead_device:
                    m[j] = 0.0
                m[j] = device_mass(m[j], t)
        a = np.zeros((n, 3))
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                d = q[j] - q[i]
                dist3 = (d @ d + eps * eps) ** 1.5
                a[i] += G * m[j] * d / dist3
        v = v + a * dt
        q = q + v * dt
        if planet is not None and hit_step == -2:
            d = q[planet] - q[asteroid]
            if d @ d < planet_radius * planet_radius:
                hit_step = step
    return q, v, hit_step
