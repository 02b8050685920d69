"""The graded P1/P2/P3 solver, sharded over a device mesh.

This routes the PRODUCT (the three graded problems, models/direct_sum.py)
through a ('scen', 'body') mesh — the TPU answer to the reference
distributing the graded scenario over its two GPUs (hw5.cu:564-588):

  * 'scen' — scenario parallelism: the stacked P1/P2 pair (devices off/on,
    hw5.cu:352-357 vs 359-364) and the batched P3 device-destruction
    scenarios (hw5.cu:438-530) spread across mesh rows;
  * 'body' — body sharding (the sequence-parallel axis): each chip owns a
    row-block of the N x N interaction matrix and j-body tiles rotate
    around a `lax.ppermute` ring over ICI (parallel/sharded.py pattern).

Determinism contract: force accumulation uses a STATIC j-tile size and
combines per-tile partial sums in ascending global tile order, so answers
are BIT-IDENTICAL across mesh shapes (1x1, 2x4, 1x8, ...) for the same
tile size — the multi-chip correctness claim tests assert. (The reference
fails its own analog of this: its atomicAdd reduction order changes run to
run and flips 2/12 testcases, SURVEY.md §4.)

Cross-shard data flow: j-tiles ride the ring; the planet / asteroid /
device-slot positions each scenario needs for its min-distance, hit,
missile-arrival and snapshot carries (hw5.cu:241-287) are extracted with
one-hot masked psums over 'body' — exact (a single nonzero term per
reduction), so they are bitwise identical to an unsharded gather.

Every scenario row redundantly maintains ALL carries (its own running
min distance, first hit, arrivals, snapshots); the host reads Problem 1's
answer from the devices-off row and Problem 2/3 inputs from the devices-on
row. This keeps the scenario rows fully independent — zero cross-'scen'
communication in P1/P2.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SimConfig
from ..ops.forces import _dist3


def _tile_partial(qi, qj, gmj, *, eps, dist3_mode, fast):
    """Forces on local rows qi from one j-tile, with the SAME per-pair op
    order as the single-device kernels (ops/forces.py): division form for
    the graded f64 path, rsqrt form for the fast path. qi: (ni, 3),
    qj: (T, 3), gmj: (T,)."""
    dq = qj[None, :, :] - qi[:, None, :]              # (ni, T, 3)
    d2 = (dq * dq).sum(-1) + eps * eps
    if fast:
        inv = lax.rsqrt(d2)
        w = gmj[None, :] * (inv * inv * inv)
        return (w[..., None] * dq).sum(1)
    dist3 = _dist3(d2, dist3_mode)
    return ((gmj[None, :, None] * dq) / dist3[..., None]).sum(1)


def ring_accel_ordered(q_local, gm_local, *, axis_name: str, eps: float,
                       tile: int, dist3_mode: str = "dsqrt",
                       fast: bool = False):
    """All-pairs accelerations for this shard's rows with a mesh-shape-
    independent summation order: per-tile partials are buffered and
    combined in ascending GLOBAL tile order, so the result is bit-identical
    on a 1-device and an 8-device mesh (same `tile`). Call inside
    shard_map."""
    k = lax.axis_size(axis_name)
    me = lax.axis_index(axis_name)
    ni = q_local.shape[0]
    if ni % tile != 0:
        raise ValueError(f"local rows {ni} not a multiple of tile {tile}")
    tps = ni // tile                      # tiles per shard
    n_tiles = k * tps
    perm = [(i, (i + 1) % k) for i in range(k)]
    # derive from q_local so the buffer carries its varying-mesh-axes
    # metadata (a plain jnp.zeros would mismatch the scan carry type)
    zrow = jnp.zeros_like(q_local)
    buf = jnp.broadcast_to(zrow[None], (n_tiles,) + zrow.shape)

    def rot(r, carry):
        buf, qj, gmj = carry
        r = jnp.asarray(r, jnp.int32)
        origin = jax.lax.rem(jnp.int32(me) - r + jnp.int32(k),
                             jnp.int32(k))    # block's home shard
        for s in range(tps):
            part = _tile_partial(q_local, qj[s * tile:(s + 1) * tile],
                                 gmj[s * tile:(s + 1) * tile], eps=eps,
                                 dist3_mode=dist3_mode, fast=fast)
            gidx = origin * jnp.int32(tps) + jnp.int32(s)
            buf = lax.dynamic_update_slice(
                buf, part[None],
                (gidx,) + (jnp.int32(0),) * part.ndim)
        qj = lax.ppermute(qj, axis_name, perm)
        gmj = lax.ppermute(gmj, axis_name, perm)
        return buf, qj, gmj

    buf, _, _ = lax.fori_loop(0, k, rot, (buf, q_local, gm_local),
                              unroll=True)
    acc = jnp.zeros_like(q_local)
    for t in range(n_tiles):              # static ascending order
        acc = acc + buf[t]
    return acc


def _extract_rows(q_local, sel_local, axis_name):
    """Gather rows of the body-sharded q (ni, 3) selected by the one-hot
    matrix sel_local (R, ni): exact (one nonzero term per output) psum over
    the body axis. Returns (R, 3) replicated."""
    return lax.psum(sel_local @ q_local, axis_name)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_steps", "dt", "eps", "G", "planet_radius",
                     "missile_speed", "dist3_mode", "fast", "tile"))
def _p12_chunk_sharded(q, v, min_d2, hit, arr, q_snap, v_snap, m0_s, m_half,
                       planet_oh, asteroid_oh, dev_oh, fst_chunk, t0, *,
                       mesh: Mesh, n_steps, dt, eps, G, planet_radius,
                       missile_speed, dist3_mode, fast, tile):
    """Sharded twin of models/direct_sum._p12_chunk: advance the stacked
    (S, n, ...) P1/P2 state over steps (t0, t0 + len(fst_chunk)], every
    carry update bit-matching the single-device semantics (strict `<`,
    step-0 inclusion, guarded first-hit — hw5.cu:241-287)."""
    state_spec = P("scen", "body", None)
    mass_spec = P("scen", "body")
    scen_spec = P("scen")
    snap_spec = P("scen", None, "body", None)
    oh_spec = P("body")
    dev_oh_spec = P(None, "body")

    def local_chunk(q, v, min_d2, hit, arr, q_snap, v_snap, m0_s, m_half,
                    p_oh, a_oh, d_oh, fst_chunk, t0):
        r2 = planet_radius * planet_radius
        sdt = missile_speed * dt
        offs = jnp.arange(1, fst_chunk.shape[0] + 1, dtype=jnp.int32)
        xs = (t0.astype(jnp.int32) + offs, fst_chunk)

        def scen_step(q1, v1, min1, hit1, arr1, qs1, vs1, m0_1, mh_1, t,
                      fst_t):
            # one scenario: q1 (ni, 3), m0_1 (ni,), carries replicated
            in_range = t <= jnp.int32(n_steps)
            m_eff = m0_1 + mh_1 * fst_t
            a = ring_accel_ordered(q1, G * m_eff, axis_name="body", eps=eps,
                                   tile=tile, dist3_mode=dist3_mode,
                                   fast=fast)
            v2 = v1 + a * dt
            q2 = q1 + v2 * dt
            q1 = jnp.where(in_range, q2, q1)
            v1 = jnp.where(in_range, v2, v1)
            rows = _extract_rows(q1, jnp.concatenate(
                [p_oh[None], a_oh[None], d_oh], axis=0), "body")
            qp, qa, qd = rows[0], rows[1], rows[2:]
            dpa = qp - qa
            d2_pa = (dpa[0] * dpa[0] + dpa[1] * dpa[1] + dpa[2] * dpa[2])
            min1 = jnp.where(in_range, jnp.minimum(min1, d2_pa), min1)
            dpd = qp[None, :] - qd                        # (D, 3)
            d2_pd = (dpd[:, 0] * dpd[:, 0] + dpd[:, 1] * dpd[:, 1]
                     + dpd[:, 2] * dpd[:, 2])
            md = sdt * t.astype(q1.dtype)
            arrived = (arr1 == -2) & (d2_pd < md * md) & in_range
            arr1 = jnp.where(arrived, t, arr1)
            sel = arrived[:, None, None]
            qs1 = jnp.where(sel, q1[None], qs1)
            vs1 = jnp.where(sel, v1[None], vs1)
            hit1 = jnp.where((hit1 == -2) & (d2_pa < r2) & in_range, t, hit1)
            return q1, v1, min1, hit1, arr1, qs1, vs1

        def body(carry, x):
            q, v, min_d2, hit, arr, q_snap, v_snap = carry
            t, fst_t = x
            out = jax.vmap(
                scen_step, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None)
            )(q, v, min_d2, hit, arr, q_snap, v_snap, m0_s, m_half, t, fst_t)
            return out, None

        carry = (q, v, min_d2, hit, arr, q_snap, v_snap)
        carry, _ = lax.scan(body, carry, xs)
        return carry

    fn = jax.shard_map(
        local_chunk, mesh=mesh,
        in_specs=(state_spec, state_spec, scen_spec, scen_spec,
                  P("scen", None), snap_spec, snap_spec, mass_spec,
                  mass_spec, oh_spec, oh_spec, dev_oh_spec, P(), P()),
        out_specs=(state_spec, state_spec, scen_spec, scen_spec,
                   P("scen", None), snap_spec, snap_spec))
    return fn(q, v, min_d2, hit, arr, q_snap, v_snap, m0_s, m_half,
              planet_oh, asteroid_oh, dev_oh, fst_chunk, t0)


def run_problems_12_sharded(scene, fst, cfg: SimConfig, mesh: Mesh, *,
                            dtype=np.float64, fast: bool = False,
                            tile: int | None = None,
                            host_chunk: int | None = None):
    """Mesh-sharded Problems 1+2 (+ P3 preprocessing). Same contract as
    models/direct_sum.run_problems_12; scene.n must be a multiple of the
    body axis (pad via utils/padding first). Returns a P12Result."""
    from ..models.direct_sum import P12Result

    n = scene.n
    scen_size = mesh.shape["scen"]
    body_size = mesh.shape["body"]
    if 2 % scen_size != 0:
        raise ValueError("P1/P2 scenario axis (2) must be divisible by "
                         f"mesh 'scen' size {scen_size}")
    if n % body_size != 0:
        raise ValueError(f"n={n} not a multiple of body axis {body_size}")
    tile = tile or (n // body_size)
    D = scene.device_cnt

    q0 = np.asarray(scene.q, dtype)
    v0 = np.asarray(scene.v, dtype)
    m0 = np.asarray(scene.m, dtype)
    mask = np.asarray(scene.device_mask(), dtype)
    m0_s = np.stack([m0 * (1.0 - mask), m0])
    m_half = 0.5 * np.stack([m0 * (1.0 - mask), m0]) * mask[None, :]

    planet_oh = np.zeros(n, dtype)
    planet_oh[scene.planet] = 1.0
    asteroid_oh = np.zeros(n, dtype)
    asteroid_oh[scene.asteroid] = 1.0
    dev_oh = np.zeros((max(D, 1), n), dtype)
    for k in range(D):
        dev_oh[k, scene.device_idx[k]] = 1.0

    d0 = q0[scene.planet] - q0[scene.asteroid]
    d2_0 = d0[0] * d0[0] + d0[1] * d0[1] + d0[2] * d0[2]
    r2 = np.asarray(cfg.planet_radius, dtype) ** 2
    Dp = max(D, 1)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    state_spec = P("scen", "body", None)
    carry = (
        put(np.stack([q0, q0]), state_spec),
        put(np.stack([v0, v0]), state_spec),
        put(np.full((2,), d2_0, dtype), P("scen")),
        put(np.full((2,), 0 if d2_0 < r2 else -2, np.int32), P("scen")),
        put(np.full((2, Dp), -2, np.int32), P("scen", None)),
        put(np.zeros((2, Dp, n, 3), dtype), P("scen", None, "body", None)),
        put(np.zeros((2, Dp, n, 3), dtype), P("scen", None, "body", None)),
    )
    m0_j = put(m0_s, P("scen", "body"))
    mh_j = put(m_half, P("scen", "body"))
    poh = put(planet_oh, P("body"))
    aoh = put(asteroid_oh, P("body"))
    doh = put(dev_oh, P(None, "body"))
    fstd = np.asarray(fst, dtype)

    if host_chunk is None:
        on_accel = mesh.devices.flat[0].platform != "cpu"
        host_chunk = 2000 if on_accel else cfg.n_steps
    t0 = 0
    while t0 < cfg.n_steps:
        cs = min(host_chunk, cfg.n_steps - t0)
        fst_chunk = np.zeros(host_chunk, dtype)
        fst_chunk[:cs] = fstd[t0 + 1: t0 + 1 + cs]
        carry = _p12_chunk_sharded(
            *carry, m0_j, mh_j, poh, aoh, doh,
            jax.device_put(fst_chunk, NamedSharding(mesh, P())),
            jax.device_put(np.int32(t0), NamedSharding(mesh, P())),
            mesh=mesh, n_steps=cfg.n_steps, dt=cfg.dt, eps=cfg.eps, G=cfg.G,
            planet_radius=cfg.planet_radius,
            missile_speed=cfg.missile_speed,
            dist3_mode=cfg.dist3_mode or "dsqrt", fast=fast, tile=tile)
        t0 += cs

    _, _, min_d2, hit, arr, q_snap, v_snap = jax.tree.map(np.asarray, carry)
    # Problem 1 answer from the devices-off row; Problem 2/3 state from the
    # devices-on row (hw5.cu: tid 0 vs tid 1 in t_problem_12).
    return P12Result(
        min_dist=float(np.sqrt(min_d2[0])),
        hit_time_step=int(hit[1]),
        arrivals=arr[1][:D],
        q_snaps=q_snap[1][:D],
        v_snaps=v_snap[1][:D],
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_steps", "dt", "eps", "G", "planet_radius",
                     "dist3_mode", "fast", "tile", "chunk_steps"))
def _p3_chunks_sharded(q, v, hit_flag, undecided_any, c_start, c_limit,
                       arrivals, eligible, m0_scen, m_half_scen, planet_oh,
                       asteroid_oh, fst, *, mesh: Mesh, n_steps, dt, eps, G,
                       planet_radius, dist3_mode, fast, tile, chunk_steps):
    """Sharded twin of models/direct_sum._p3_chunks: the batched resumed
    P3 scenarios (hw5.cu:438-530), scenarios over 'scen', bodies over
    'body', with the same frozen-until-arrival masking and all-decided
    early exit."""
    state_spec = P("scen", "body", None)

    def local_chunks(q, v, hit_flag, undecided_any, c_start, c_limit,
                     arrivals, eligible, m0_scen, m_half_scen, p_oh, a_oh,
                     fst):
        r2 = planet_radius * planet_radius
        cs = int(chunk_steps)

        def scen_step(q1, v1, hit1, arr1, m0_1, mh_1, t):
            active = (t > arr1) & (t <= jnp.int32(n_steps))
            fst_t = fst[jnp.minimum(t, jnp.int32(n_steps))]
            m_eff = m0_1 + mh_1 * fst_t
            a = ring_accel_ordered(q1, G * m_eff, axis_name="body", eps=eps,
                                   tile=tile, dist3_mode=dist3_mode,
                                   fast=fast)
            v2 = v1 + a * dt
            q2 = q1 + v2 * dt
            q1 = jnp.where(active, q2, q1)
            v1 = jnp.where(active, v2, v1)
            rows = _extract_rows(q1, jnp.stack([p_oh, a_oh]), "body")
            dpa = rows[0] - rows[1]
            d2_pa = (dpa[0] * dpa[0] + dpa[1] * dpa[1] + dpa[2] * dpa[2])
            hit1 = hit1 | (active & (d2_pa < r2))
            return q1, v1, hit1

        def step_body(t, carry):
            q, v, hit_flag = carry
            t = t.astype(jnp.int32)
            return jax.vmap(scen_step, in_axes=(0, 0, 0, 0, 0, 0, None))(
                q, v, hit_flag, arrivals, m0_scen, m_half_scen, t)

        def chunk_body(carry):
            c, q, v, hit_flag, _ = carry
            t0 = c * cs + 1
            q, v, hit_flag = lax.fori_loop(t0, t0 + cs, step_body,
                                           (q, v, hit_flag))
            undec = eligible & ~hit_flag
            any_undec = lax.psum(jnp.sum(undec.astype(jnp.int32)),
                                 "scen") > 0
            return c + 1, q, v, hit_flag, any_undec

        def chunk_cond(carry):
            c, _, _, _, any_undec = carry
            return (c < c_limit) & any_undec

        init = (c_start.astype(jnp.int32), q, v, hit_flag, undecided_any)
        c, q, v, hit_flag, _ = lax.while_loop(chunk_cond, chunk_body, init)
        return c, q, v, hit_flag

    fn = jax.shard_map(
        local_chunks, mesh=mesh,
        in_specs=(state_spec, state_spec, P("scen"), P(), P(), P(),
                  P("scen"), P("scen"), P("scen", "body"),
                  P("scen", "body"), P("body"), P("body"), P()),
        out_specs=(P(), state_spec, state_spec, P("scen")))
    return fn(q, v, hit_flag, undecided_any, c_start, c_limit, arrivals,
              eligible, m0_scen, m_half_scen, planet_oh, asteroid_oh, fst)


def run_problem_3_sharded(scene, p12, fst, cfg: SimConfig, mesh: Mesh, *,
                          dtype=np.float64, fast: bool = False,
                          tile: int | None = None) -> np.ndarray:
    """Mesh-sharded Problem 3: same contract as
    models/direct_sum.run_problem_3 (batched strategy), scenarios padded to
    a multiple of the 'scen' axis with frozen ineligible rows."""
    D = scene.device_cnt
    if D == 0:
        return np.zeros((0,), dtype=bool)
    eligible = (p12.arrivals != -2) & (p12.arrivals <= p12.hit_time_step)
    if not eligible.any():
        return np.zeros((D,), dtype=bool)

    n = scene.n
    scen_size = mesh.shape["scen"]
    body_size = mesh.shape["body"]
    tile = tile or (n // body_size)
    Dp = -(-D // scen_size) * scen_size          # pad to scen multiple

    m0_scen = np.tile(np.asarray(scene.m, dtype)[None, :], (Dp, 1))
    for k in range(D):
        m0_scen[k, scene.device_idx[k]] = 0.0
    device_mask = np.asarray(scene.device_mask(), dtype)
    m_half_scen = 0.5 * m0_scen * device_mask[None, :]

    elig_p = np.zeros(Dp, bool)
    elig_p[:D] = eligible
    cs = cfg.chunk_steps
    n_chunks = (cfg.n_steps + cs - 1) // cs
    arr_masked = np.full(Dp, cfg.n_steps, np.int32)
    arr_masked[:D] = np.where(eligible, p12.arrivals, cfg.n_steps)
    c_start = int(max(int(arr_masked.min()), 0) // cs)

    qs = np.zeros((Dp, n, 3), dtype)
    vs = np.zeros((Dp, n, 3), dtype)
    qs[:D] = p12.q_snaps
    vs[:D] = p12.v_snaps
    dsnap = (p12.q_snaps[:, scene.planet] - p12.q_snaps[:, scene.asteroid])
    hit0 = np.zeros(Dp, bool)
    hit0[:D] = ((dsnap * dsnap).sum(-1)
                < np.asarray(cfg.planet_radius, np.float64) ** 2)

    planet_oh = np.zeros(n, dtype)
    planet_oh[scene.planet] = 1.0
    asteroid_oh = np.zeros(n, dtype)
    asteroid_oh[scene.asteroid] = 1.0

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    rep = NamedSharding(mesh, P())
    c, q, v, hit_flag = _p3_chunks_sharded(
        put(qs, P("scen", "body", None)), put(vs, P("scen", "body", None)),
        put(hit0, P("scen")),
        jax.device_put(np.bool_((elig_p & ~hit0).any()), rep),
        jax.device_put(np.int32(c_start), rep),
        jax.device_put(np.int32(n_chunks), rep),
        put(arr_masked, P("scen")), put(elig_p, P("scen")),
        put(m0_scen, P("scen", "body")), put(m_half_scen, P("scen", "body")),
        put(planet_oh, P("body")), put(asteroid_oh, P("body")),
        jax.device_put(np.asarray(fst, dtype), rep),
        mesh=mesh, n_steps=cfg.n_steps, dt=cfg.dt, eps=cfg.eps, G=cfg.G,
        planet_radius=cfg.planet_radius,
        dist3_mode=cfg.dist3_mode or "dsqrt", fast=fast, tile=tile,
        chunk_steps=cs)
    hits = np.asarray(hit_flag)[:D]
    return eligible & ~hits


def solve_scene_sharded(scene, cfg: SimConfig, mesh: Mesh, *,
                        dtype=np.float64, fast: bool = False,
                        tile: int | None = None):
    """End-to-end P1+P2+P3 on a mesh (the sharded twin of
    engine.solve_scene's core, hw5.cu:532-615). The caller is responsible
    for any rescaling (accelerator meshes) and padding to the body axis."""
    from ..engine import Answers, select_winner
    from ..physics import oscillation_table

    fst = oscillation_table(cfg)
    p12 = run_problems_12_sharded(scene, fst, cfg, mesh, dtype=dtype,
                                  fast=fast, tile=tile)
    gravity_device_id, missile_cost = -1, 0.0
    if p12.hit_time_step != -2 and scene.device_cnt > 0:
        saved = run_problem_3_sharded(scene, p12, fst, cfg, mesh,
                                      dtype=dtype, fast=fast, tile=tile)
        gravity_device_id, missile_cost = select_winner(
            scene, p12.arrivals, saved, cfg)
    return Answers(min_dist=float(np.sqrt(np.float64(p12.min_dist) ** 2)),
                   hit_time_step=p12.hit_time_step,
                   gravity_device_id=gravity_device_id,
                   missile_cost=missile_cost), p12
