"""Scanned e64 force bench: XLA fold vs Pallas variants, in-scan.

Single-eval timing at small n is dispatch-bound (~12 ms either way at
n<=1024, results/ACCURACY.md r3 table), which says nothing about the
solver, whose steps run inside lax.scan chunks where dispatch amortizes
away. This bench times a BE_STEPS-step scan of force+Euler (the
solver's hot shape: BE_BATCH scenarios at n=BE_N) per path,
transfer-forced.

Env knobs: BE_N (128), BE_BATCH (2), BE_STEPS (200), BE_VARIANTS
("r,t,s r,t,s ..." pallas (rows_i, tile_j, sub_j) triples; Mosaic block
rule: rows_i divisible by 8 or equal to n//128). Each variant is a
fresh remote Mosaic compile (~minutes); keep the grid tight.

Measured (2026-08-18 idle worker, results/ACCURACY.md r3): at n=128 the
XLA fold wins in-scan (0.128 ms/eval vs 0.186 best pallas r1 t128 s8) —
the n>=256 auto routing threshold stands.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.forces import pairwise_accel_e64
from nbody_tpu.ops.pallas_forces_e64 import pallas_accel_e64

N = int(os.environ.get("BE_N", 128))
BATCH = int(os.environ.get("BE_BATCH", 2))
STEPS = int(os.environ.get("BE_STEPS", 200))
# "r,t,s r,t,s ..." pallas variants; empty string skips pallas. Default
# rows_i = N//128 (always Mosaic-legal: the block rule is rows_i % 8 == 0
# or rows_i == N//128), so defaults degrade gracefully at any BE_N.
_R = max(1, N // 128)
VARIANTS = [tuple(int(x) for x in v.split(","))
            for v in os.environ.get(
                "BE_VARIANTS", f"{_R},{min(N,128)},8 {_R},{min(N,128)},16 "
                f"{_R},{min(N,128)},32").split()]
G, EPS, DT = 6.674e-11, 1e-3, 60.0


def make_scan(force_fn):
    dth, dtl = fe.from_f64(DT)
    dte = fe.E64(jnp.uint32(int(dth)), jnp.uint32(int(dtl)))

    def step(carry, _):
        q, v = carry
        parts = [force_fn(q[b]) for b in range(BATCH)]
        a = fe.E64(jnp.stack([p.hi for p in parts]),
                   jnp.stack([p.lo for p in parts]))
        v = v + a * dte
        q = q + v * dte
        return (q, v), None

    @jax.jit
    def run(q, v):
        (q, v), _ = lax.scan(step, (q, v), None, length=STEPS)
        return q, v

    return run


def timeit(run, q, v, reps=3):
    out = run(q, v)
    np.asarray(out[0].hi)                       # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(q, v)
    np.asarray(out[0].hi)                       # transfer-forced
    return (time.perf_counter() - t0) / reps, out


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.RandomState(0)
    q = rng.randn(BATCH, N, 3) * 1e10
    v = rng.randn(BATCH, N, 3) * 1e3
    m = np.abs(rng.randn(N)) * 1e12
    qe = jax.device_put(fe.e64_from_f64_tree(q), dev)
    ve = jax.device_put(fe.e64_from_f64_tree(v), dev)
    me = jax.device_put(fe.e64_from_f64_tree(m), dev)
    Gh, Gl = fe.from_f64(G)
    gm = fe.E64(*fe.mul(np.uint32(Gh), np.uint32(Gl), me.hi, me.lo))

    t_x, out_x = timeit(make_scan(
        lambda qb: pairwise_accel_e64(qb, me, G=G, eps=EPS)), qe, ve)
    per = t_x / STEPS / BATCH
    print(f"xla fold        {t_x:7.3f} s/chunk  {per*1e3:6.3f} ms/eval  "
          f"{N*N/per:.3e} pairs/s", flush=True)

    for rows_i, tile_j, sub_j in VARIANTS:
        if N % (rows_i * 128) or N % tile_j or tile_j % sub_j:
            print(f"skip r{rows_i} t{tile_j} s{sub_j}: shape", flush=True)
            continue
        if rows_i % 8 and rows_i != N // 128:
            # Mosaic block rule (same filter as bench_e64_pallas.py):
            # a (rows_i, 128) block lowers only if rows_i is a sublane
            # multiple or the grid covers the full i range in one block.
            print(f"skip r{rows_i} t{tile_j} s{sub_j}: block rule",
                  flush=True)
            continue
        run = make_scan(lambda qb, r=rows_i, t=tile_j, s=sub_j:
                        pallas_accel_e64(qb, gm, eps=EPS, rows_i=r,
                                         tile_j=t, sub_j=s))
        t_p, out_p = timeit(run, qe, ve)
        eq = (np.array_equal(np.asarray(out_x[0].hi), np.asarray(out_p[0].hi))
              and np.array_equal(np.asarray(out_x[0].lo),
                                 np.asarray(out_p[0].lo)))
        per = t_p / STEPS / BATCH
        print(f"pallas r{rows_i} t{tile_j} s{sub_j:<2d} {t_p:6.3f} s/chunk  "
              f"{per*1e3:6.3f} ms/eval  {N*N/per:.3e} pairs/s  "
              f"byte_equal={eq}", flush=True)


if __name__ == "__main__":
    main()
