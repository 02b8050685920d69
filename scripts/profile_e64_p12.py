"""Decompose the e64 P1/P2 per-step cost at the small-n bucket.

Motivation (VERDICT r3, weak #2): b20's measured idle-worker wall is
188.6 s while the in-scan force probe prices its 200001 steps at ~26 s —
a ~7x gap attributed (unverified) to the per-step carry chain. This
script measures the actual _p12_chunk against stripped variants on the
same shapes so the dominant term is known, not guessed:

  full       — the real models.direct_sum._p12_chunk (force + integrate
               + min/hit/arrival carries), exactly as the solver runs it.
  force+int  — scan of symplectic_euler_step only (no decision carries).
  force      — scan of the force evaluation only (no state update).
  carries    — scan of the decision chain only (force replaced by zeros).
  empty      — scan with an identity-ish body (scan/dispatch floor).

Env knobs: PE_N (128) bucket size, PE_D (4) device slots, PE_STEPS (2000)
steps per chunk, PE_REPS (3). Each variant is one fresh jit signature
(~2-4 min remote compile on axon); ~5 signatures total.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.config import SimConfig
from nbody_tpu.io import Scene
from nbody_tpu.models.direct_sum import _p12_chunk, _sq_dist, _select
from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.f64emu import E64
from nbody_tpu.ops.integrate import symplectic_euler_step
from nbody_tpu.physics import oscillation_table

N = int(os.environ.get("PE_N", 128))
D = int(os.environ.get("PE_D", 4))
STEPS = int(os.environ.get("PE_STEPS", 2000))
REPS = int(os.environ.get("PE_REPS", 3))


def timeit(fn, *args, reps=REPS):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])           # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])           # transfer-forced timing
    return (time.perf_counter() - t0) / reps


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  n={N} D={D} steps={STEPS}", flush=True)
    cfg = SimConfig()
    rng = np.random.RandomState(0)
    # b20-like magnitudes
    q = rng.randn(N, 3) * 1e12
    v = rng.randn(N, 3) * 1e3
    m = np.abs(rng.randn(N)) * 1e20
    scene = Scene(n=N, planet=0, asteroid=1, q=q, v=v, m=m,
                  types=["planet", "asteroid"] + ["device"] * D
                  + ["body"] * (N - 2 - D),
                  device_idx=np.arange(2, 2 + D))
    fst = oscillation_table(cfg)[1:STEPS + 1]

    put = lambda a: jax.device_put(a, dev)
    conv = fe.e64_from_f64_tree
    mask = scene.device_mask().astype(np.float64)
    m0_s = put(conv(np.stack([m * (1.0 - mask), m])))
    m_half = put(conv(0.5 * np.stack([m * (1.0 - mask), m]) * mask[None]))
    dev_idx = put(np.asarray(scene.device_idx, np.int32))
    qe = put(conv(np.stack([q, q])))
    ve = put(conv(np.stack([v, v])))
    min_d2 = put(conv(np.asarray(1e30)))
    hit = put(np.int32(-2))
    arr = put(np.full((D,), -2, np.int32))
    q_snap = put(conv(np.zeros((D, N, 3))))
    v_snap = put(conv(np.zeros((D, N, 3))))
    fst_j = put(conv(fst))
    t0j = put(np.int32(0))

    kw = dict(n_steps=STEPS, dt=cfg.dt, eps=cfg.eps, G=cfg.G,
              planet_radius=cfg.planet_radius,
              missile_speed=cfg.missile_speed, dist3_mode="dsqrt",
              planet=0, asteroid=1)

    t_full = timeit(lambda: _p12_chunk(
        qe, ve, min_d2, hit, arr, q_snap, v_snap, m0_s, m_half, dev_idx,
        fst_j, t0j, **kw))
    print(f"full _p12_chunk   {t_full:7.3f} s  "
          f"{t_full / STEPS * 1e3:6.3f} ms/step", flush=True)

    if os.environ.get("PE_PALLAS", "1") not in ("0", "off"):
        # same chunk with the force routed through the Mosaic e64 kernel
        # (deterministic codegen — immune to the XLA compile-service
        # quality swings documented in CLAUDE.md / ACCURACY.md)
        t_pl = timeit(lambda: _p12_chunk(
            qe, ve, min_d2, hit, arr, q_snap, v_snap, m0_s, m_half, dev_idx,
            fst_j, t0j, pallas_e64=True, **kw))
        print(f"full chunk PALLAS {t_pl:7.3f} s  "
              f"{t_pl / STEPS * 1e3:6.3f} ms/step", flush=True)

    # ---- stripped scans (same shapes, same xs plumbing) --------------------
    offs = jnp.arange(1, STEPS + 1, dtype=jnp.int32)

    def scan_of(body):
        @jax.jit
        def run(q, v, min_d2, hit, arr, q_snap, v_snap, fstc, t0):
            xs = (t0.astype(jnp.int32) + offs, fstc)
            carry = (q, v, min_d2, hit, arr, q_snap, v_snap)
            carry, _ = lax.scan(body, carry, xs)
            return carry
        return run

    def body_force_int(carry, x):
        q, v, min_d2, hit, arr, q_snap, v_snap = carry
        t, fst_t = x
        m_eff = m0_s + m_half * fst_t
        q, v = symplectic_euler_step(q, v, m_eff, G=cfg.G, eps=cfg.eps,
                                     dt=cfg.dt)
        return (q, v, min_d2, hit, arr, q_snap, v_snap), None

    def body_force_int_const_m(carry, x):
        # force+Euler with CONSTANT masses (no per-step oscillation chain):
        # isolates the cost of the m_eff = m0 + m_half*fst softfloat ops —
        # this is exactly the shape bench_e64_scan.py measured (0.128
        # ms/eval on 2026-08-18), so it also re-anchors that number in the
        # same process/compile epoch as the full chunk.
        q, v, min_d2, hit, arr, q_snap, v_snap = carry
        t, fst_t = x
        q, v = symplectic_euler_step(q, v, m0_s, G=cfg.G, eps=cfg.eps,
                                     dt=cfg.dt)
        return (q, v, min_d2, hit, arr, q_snap, v_snap), None

    def body_force_only(carry, x):
        q, v, min_d2, hit, arr, q_snap, v_snap = carry
        t, fst_t = x
        m_eff = m0_s + m_half * fst_t
        from nbody_tpu.ops.forces import pairwise_accel_e64
        a = pairwise_accel_e64(q, m_eff, G=cfg.G, eps=cfg.eps)
        # keep the scan carry live through a (cheap, exact) dependence
        q = E64(q.hi ^ (a.hi & jnp.uint32(0)), q.lo)
        return (q, v, min_d2, hit, arr, q_snap, v_snap), None

    def body_carries_only(carry, x):
        q, v, min_d2, hit, arr, q_snap, v_snap = carry
        t, fst_t = x
        in_range = t <= jnp.int32(STEPS)
        r2 = fe.const_e(float(cfg.planet_radius) ** 2)
        sdt = fe.const_e(float(cfg.missile_speed) * float(cfg.dt))
        # the decision chain of _p12_chunk, force/integrate replaced by a
        # trivial state touch so the carry stays live
        q = E64(q.hi ^ jnp.uint32(0), q.lo)
        d2_pa0 = _sq_dist(q[0, 0], q[0, 1])
        min_d2 = _select(in_range, fe.minimum_e(min_d2, d2_pa0), min_d2)
        d2_pd = _sq_dist(q[1, 0], q[1, dev_idx])
        md = sdt * E64(*fe.from_i32(t))
        md2 = md * md
        arrived = (arr == -2) & (d2_pd < md2) & in_range
        arr = jnp.where(arrived, t, arr)
        sel = arrived[:, None, None]
        q_snap = _select(sel, q[1][None], q_snap)
        v_snap = _select(sel, v[1][None], v_snap)
        d2_pa = _sq_dist(q[1, 0], q[1, 1])
        hit = jnp.where((hit == -2) & (d2_pa < r2) & in_range, t, hit)
        return (q, v, min_d2, hit, arr, q_snap, v_snap), None

    def body_empty(carry, x):
        q, v, min_d2, hit, arr, q_snap, v_snap = carry
        t, fst_t = x
        q = E64(q.hi ^ jnp.uint32(0), q.lo)
        return (q, v, min_d2, hit, arr, q_snap, v_snap), None

    for name, body in (("force+integrate", body_force_int),
                       ("force+int constm", body_force_int_const_m),
                       ("force only", body_force_only),
                       ("carries only", body_carries_only),
                       ("empty scan", body_empty)):
        run = scan_of(body)
        t = timeit(lambda r=run: r(qe, ve, min_d2, hit, arr, q_snap, v_snap,
                                   fst_j, t0j))
        print(f"{name:<17s} {t:7.3f} s  {t / STEPS * 1e3:6.3f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
