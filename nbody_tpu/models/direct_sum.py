"""Direct-summation N-body model: the flagship simulator.

Replaces the reference's scenario runners with two on-device scans:

  * `run_problems_12` — the TPU analog of `t_problem_12` for BOTH GPUs at
    once (hw5.cu:322-436): Problem 1 (devices off) and Problem 2 (devices on)
    are a stacked batch of 2 scenarios marching in one `lax.scan`. The scan
    carry tracks the running min planet-asteroid distance (replaces the
    <<<1,1>>> kernel calc_sq_min_dist_gpu, hw5.cu:241-252), the first hit
    step (calc_hit_time_step_gpu, hw5.cu:254-263), and per-device missile
    arrival steps + full (q, v) state snapshots (problem3_preprocess_gpu,
    hw5.cu:265-287). Zero host round-trips for all 200001 steps — the
    reference needs a D2H sync every 2000 steps (hw5.cu:398-402).

  * `run_problem_3` — the TPU analog of the work-stealing `t_problem_3`
    (hw5.cu:438-530): all device-destruction scenarios run as ONE batched
    scan over the global step index, each scenario masked inactive until its
    missile-arrival step. Batching replaces the mutex+shared-counter
    scheduler and makes the PROBLEM3_BREAK dominance pruning moot.

All fp64 comparisons/updates follow the reference's exact semantics: strict
`<` for min/hit/arrival, step-0 inclusion for the min distance and hit check,
arrival impossible at step 0 (missile distance is 0).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import SimConfig
from ..ops.integrate import symplectic_euler_step


def _sq_dist(qa, qb):
    """Squared distance with the serial spec's fp64 op order
    (dx*dx + dy*dy + dz*dz, samples/nbody.cc:118-121)."""
    d = qa - qb
    return d[..., 0] * d[..., 0] + d[..., 1] * d[..., 1] + d[..., 2] * d[..., 2]


@dataclasses.dataclass
class P12Result:
    min_dist: float            # Problem 1 answer
    hit_time_step: int         # Problem 2 answer (-2 if never)
    arrivals: np.ndarray       # (D,) int64 missile-arrival step per device, -2 if never
    q_snaps: np.ndarray        # (D, n, 3) state snapshot at each arrival
    v_snaps: np.ndarray        # (D, n, 3)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "dt", "eps", "G", "planet_radius",
                     "missile_speed", "dist3_mode", "planet", "asteroid",
                     "fast"),
)
def _p12_scan(q0, v0, m0, device_mask, dev_idx, fst, *, n_steps, dt, eps, G,
              planet_radius, missile_speed, dist3_mode, planet, asteroid,
              fast=False):
    f64 = q0.dtype
    n = q0.shape[0]
    D = dev_idx.shape[0]

    # Scenario stack: row 0 = devices off (Problem 1, clear_device_m_gpu
    # hw5.cu:217-222), row 1 = devices on (Problem 2).
    q = jnp.stack([q0, q0])                       # (2, n, 3)
    v = jnp.stack([v0, v0])
    m0_s = jnp.stack([m0 * (1.0 - device_mask), m0])          # (2, n)
    m_half = 0.5 * m0_s * device_mask[None, :]                # (2, n) exact

    r2 = planet_radius * planet_radius
    sdt = missile_speed * dt                                  # 6e7, exact

    # Step-0 checks (loops include step 0: hw5.cu:368/387 run the check
    # kernels before any update).
    d2_0 = _sq_dist(q0[planet], q0[asteroid])
    min_d2 = d2_0
    hit = jnp.where(d2_0 < r2, jnp.int32(0), jnp.int32(-2))
    arr = jnp.full((D,), -2, dtype=jnp.int32)
    q_snap = jnp.zeros((D, n, 3), dtype=f64)
    v_snap = jnp.zeros((D, n, 3), dtype=f64)

    steps = jnp.arange(1, n_steps + 1, dtype=jnp.int32)
    xs = (steps, fst[1:n_steps + 1])

    def body(carry, x):
        q, v, min_d2, hit, arr, q_snap, v_snap = carry
        t, fst_t = x
        m_eff = m0_s + m_half * fst_t
        q, v = symplectic_euler_step(q, v, m_eff, G=G, eps=eps, dt=dt,
                                     dist3_mode=dist3_mode, fast=fast)
        # Problem 1: running min on the devices-off scenario.
        min_d2 = jnp.minimum(min_d2, _sq_dist(q[0, planet], q[0, asteroid]))
        # Problem 3 preprocessing runs before the hit check each step
        # (hw5.cu:396-397); they are independent. Arrival: the expanding
        # missile sphere around the planet's CURRENT position first contains
        # the device (hw5.cu:270-274).
        d2_pd = _sq_dist(q[1, planet], q[1, dev_idx])         # (D,)
        md = sdt * t.astype(f64)
        arrived = (arr == -2) & (d2_pd < md * md)
        arr = jnp.where(arrived, t, arr)
        sel = arrived[:, None, None]
        q_snap = jnp.where(sel, q[1][None], q_snap)
        v_snap = jnp.where(sel, v[1][None], v_snap)
        # Problem 2: first hit step, guarded like hw5.cu:255.
        d2_pa = _sq_dist(q[1, planet], q[1, asteroid])
        hit = jnp.where((hit == -2) & (d2_pa < r2), t, hit)
        return (q, v, min_d2, hit, arr, q_snap, v_snap), None

    init = (q, v, min_d2, hit, arr, q_snap, v_snap)
    (q, v, min_d2, hit, arr, q_snap, v_snap), _ = lax.scan(body, init, xs)
    return jnp.sqrt(min_d2), hit, arr, q_snap, v_snap


def run_problems_12(scene, fst: np.ndarray, cfg: SimConfig, *, device=None,
                    dtype=np.float64, fast: bool = False) -> P12Result:
    """Run Problems 1+2 (and Problem-3 preprocessing) for a Scene.

    `device` commits the computation to a specific backend (jit follows the
    placement of its committed inputs); `dtype`/`fast` select the numeric
    path (see backend.py).
    """
    put = functools.partial(jax.device_put, device=device)
    min_dist, hit, arr, q_snap, v_snap = _p12_scan(
        put(jnp.asarray(scene.q, dtype=dtype)),
        put(jnp.asarray(scene.v, dtype=dtype)),
        put(jnp.asarray(scene.m, dtype=dtype)),
        put(jnp.asarray(scene.device_mask(), dtype=dtype)),
        put(jnp.asarray(scene.device_idx, dtype=jnp.int32)),
        put(jnp.asarray(fst, dtype=dtype)),
        n_steps=cfg.n_steps, dt=cfg.dt, eps=cfg.eps, G=cfg.G,
        planet_radius=cfg.planet_radius, missile_speed=cfg.missile_speed,
        dist3_mode=cfg.dist3_mode, planet=scene.planet,
        asteroid=scene.asteroid, fast=fast,
    )
    return P12Result(
        min_dist=float(min_dist),
        hit_time_step=int(hit),
        arrivals=np.asarray(arr),
        q_snaps=np.asarray(q_snap),
        v_snaps=np.asarray(v_snap),
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "dt", "eps", "G", "planet_radius",
                     "dist3_mode", "planet", "asteroid", "fast",
                     "chunk_steps"),
)
def _p3_scan(q_snaps, v_snaps, arrivals, eligible, m0_scen, m_half_scen,
             fst, *,
             n_steps, dt, eps, G, planet_radius, dist3_mode, planet,
             asteroid, fast=False, chunk_steps=2000):
    """Batched resumed simulations: scenario k is frozen until its arrival
    step, then integrates with device k's mass zeroed (destruction takes
    effect from the arrival step onward, hw5.cu:299-308).

    Structured as a while_loop over fixed-size step chunks (the on-device
    analog of the reference's n_sync_steps host readback, hw5.cu:503-507):
      * skip-ahead — chunks entirely before the earliest eligible arrival
        are skipped exactly (every scenario is frozen there);
      * early exit — once every eligible scenario's planet is hit, nothing
        downstream can change the answer (the batched replacement for the
        reference's PROBLEM3_BREAK dominance pruning, hw5.cu:490-493).
    Both transformations are bit-exact: they only skip iterations that are
    provably identity on the carry.
    """
    r2 = planet_radius * planet_radius
    cs = int(chunk_steps)
    n_chunks = (n_steps + cs - 1) // cs

    # Check at t == arrival with the snapshot state (missile_cost_gpu's hit
    # test runs at the resume step before any update, hw5.cu:292-298).
    hit0 = _sq_dist(q_snaps[:, planet], q_snaps[:, asteroid]) < r2

    # earliest step at which anything can move:
    first_t = jnp.min(jnp.where(eligible, arrivals, jnp.int32(n_steps))) + 1
    start_chunk = jnp.maximum((first_t - 1) // cs, 0).astype(jnp.int32)

    def step_body(t, carry):
        q, v, hit_flag = carry
        t = t.astype(jnp.int32)
        in_range = t <= jnp.int32(n_steps)
        active = (t > arrivals) & in_range                    # (D,)
        fst_t = fst[jnp.minimum(t, jnp.int32(n_steps))]
        m_eff = m0_scen + m_half_scen * fst_t                 # (D, n)
        q2, v2 = symplectic_euler_step(q, v, m_eff, G=G, eps=eps, dt=dt,
                                       dist3_mode=dist3_mode, fast=fast)
        sel = active[:, None, None]
        q = jnp.where(sel, q2, q)
        v = jnp.where(sel, v2, v)
        d2_pa = _sq_dist(q[:, planet], q[:, asteroid])
        hit_flag = hit_flag | (active & (d2_pa < r2))
        return q, v, hit_flag

    def chunk_body(carry):
        c, q, v, hit_flag = carry
        t0 = c * cs + 1
        q, v, hit_flag = lax.fori_loop(t0, t0 + cs, step_body,
                                       (q, v, hit_flag))
        return c + 1, q, v, hit_flag

    def chunk_cond(carry):
        c, _, _, hit_flag = carry
        undecided = eligible & ~hit_flag
        return (c < n_chunks) & undecided.any()

    init = (start_chunk, q_snaps, v_snaps, hit0)
    _, _, _, hit_flag = lax.while_loop(chunk_cond, chunk_body, init)
    return hit_flag


def run_problem_3(scene, p12: P12Result, fst: np.ndarray, cfg: SimConfig, *,
                  device=None, dtype=np.float64,
                  fast: bool = False) -> np.ndarray:
    """Return (D,) bool: True if destroying device k saves the planet.

    Only scenarios with a valid arrival (!= -2) and arrival <= hit step can
    save the planet: destroying a device after the hit cannot undo it. (The
    reference evaluates such late scenarios from their post-hit snapshot and
    can miss the hit entirely — hw5.cu:489-508 only checks from the resume
    step; we fix that by masking them out.)
    """
    D = scene.device_cnt
    if D == 0:
        return np.zeros((0,), dtype=bool)
    eligible = (p12.arrivals != -2) & (p12.arrivals <= p12.hit_time_step)
    if not eligible.any():
        return np.zeros((D,), dtype=bool)

    # Per-scenario masses: device k destroyed (mass 0) for the whole resumed
    # suffix — every resumed force evaluation happens at t > arrival.
    m0_scen = np.tile(scene.m[None, :], (D, 1))
    m0_scen[np.arange(D), scene.device_idx] = 0.0
    device_mask = scene.device_mask()
    m_half_scen = 0.5 * m0_scen * device_mask[None, :]

    put = functools.partial(jax.device_put, device=device)
    # Freeze ineligible scenarios entirely (arrival pinned past the end) so
    # they are never integrated and never block the early exit; selection
    # masks them out regardless.
    arr_masked = np.where(eligible, p12.arrivals, cfg.n_steps).astype(np.int32)
    hit_flag = _p3_scan(
        put(jnp.asarray(p12.q_snaps, dtype=dtype)),
        put(jnp.asarray(p12.v_snaps, dtype=dtype)),
        put(jnp.asarray(arr_masked)),
        put(jnp.asarray(eligible)),
        put(jnp.asarray(m0_scen, dtype=dtype)),
        put(jnp.asarray(m_half_scen, dtype=dtype)),
        put(jnp.asarray(fst, dtype=dtype)),
        n_steps=cfg.n_steps, dt=cfg.dt, eps=cfg.eps, G=cfg.G,
        planet_radius=cfg.planet_radius, dist3_mode=cfg.dist3_mode,
        planet=scene.planet, asteroid=scene.asteroid, fast=fast,
        chunk_steps=cfg.chunk_steps,
    )
    saved = eligible & ~np.asarray(hit_flag)
    return saved
