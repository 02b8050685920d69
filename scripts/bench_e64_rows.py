"""Scenario-row scaling of the e64 force at the LARGE graded buckets.

Round-4 measured rows free to ~8 at n=128 (fixed per-primitive-op
overhead — results/ACCURACY.md "Small-n e64 per-step decomposition");
this script answers VERDICT r4 #3's first question: do rows still ride
cheaply at n=256/512/1024 (the b200/b512/b1024 buckets), where the
Pallas e64 kernel is compute-bound at ~60% VPU issue saturation? If a
batch-6 step costs much less than 3x a batch-2 step, routing the fused
P1+P2+P3 scan (one pass) above n=128 beats the phased two-pass pipeline.

Measures a STEPS-step scanned force+Euler chunk (the solver's hot shape)
through the BATCHED Mosaic kernel (ops/pallas_forces_e64, one pallas_call
per step for all rows) and optionally the XLA fold.

Env: BR_N (256,512,1024), BR_BATCH (2,6), BR_STEPS (auto: bounded by the
~60 s execution watchdog), BR_REPS (3), BR_SUBJ (8 — kernel sub_j ILP
width), BR_XLA (0: also run the XLA fold for comparison).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.backend import enable_persistent_compile_cache
from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.forces import pairwise_accel_e64
from nbody_tpu.ops.pallas_forces_e64 import pallas_accel_e64

G, EPS, DT = 6.674e-11, 1e-3, 60.0
REPS = int(os.environ.get("BR_REPS", 3))
SUBJ = int(os.environ.get("BR_SUBJ", 8))


def make_scan(n: int, steps: int, pallas: bool, sub_j: int):
    dth, dtl = fe.from_f64(DT)
    dte = fe.E64(jnp.uint32(int(dth)), jnp.uint32(int(dtl)))
    Gh, Gl = fe.from_f64(G)

    def step(carry, _):
        q, v = carry
        if pallas:
            gm = fe.E64(*fe.mul(jnp.uint32(int(Gh)), jnp.uint32(int(Gl)),
                                me_g.hi, me_g.lo))
            rows_i = max(1, min(8, n // 128))
            tile_j = int(os.environ.get(
                "BR_TILEJ", 256 if n % 256 == 0 else 128))
            a = pallas_accel_e64(q, gm, eps=EPS, rows_i=rows_i,
                                 tile_j=min(tile_j, n), sub_j=sub_j)
        else:
            a = pairwise_accel_e64(q, me_g, G=G, eps=EPS)
        v = v + a * dte
        q = q + v * dte
        return (q, v), None

    @jax.jit
    def run(q, v):
        (q, v), _ = lax.scan(step, (q, v), None, length=steps)
        return q, v

    return run


def timeit(run, q, v, reps=REPS):
    out = run(q, v)
    np.asarray(out[0].hi)          # transfer-forced sync (CLAUDE.md)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(q, v)
        np.asarray(out[0].hi)
        times.append(time.perf_counter() - t0)
    return min(times), times


def main():
    global me_g
    enable_persistent_compile_cache()
    dev = jax.devices()[0]
    ns = [int(x) for x in os.environ.get("BR_N", "256,512,1024").split(",")]
    batches = [int(x) for x in os.environ.get("BR_BATCH", "2,6").split(",")]
    also_xla = os.environ.get("BR_XLA", "0") in ("1", "on")
    print(f"device: {dev}  reps={REPS} sub_j={SUBJ}", flush=True)
    rows = []
    rng = np.random.RandomState(0)
    for n in ns:
        # bound each jit call well under the ~60 s execution watchdog,
        # assuming a pessimistic 3e8 pairs/s kernel floor
        steps = int(os.environ.get(
            "BR_STEPS", max(200, min(2000, int(25.0 * 3e8 / (6 * n * n))))))
        for batch in batches:
            q = rng.randn(batch, n, 3) * 1e10
            v = rng.randn(batch, n, 3) * 1e3
            m = np.abs(rng.randn(batch, n)) * 1e22
            qe = jax.device_put(fe.e64_from_f64_tree(q), dev)
            ve = jax.device_put(fe.e64_from_f64_tree(v), dev)
            me_g = jax.device_put(fe.e64_from_f64_tree(m), dev)
            for pallas in ([True, False] if also_xla else [True]):
                t, times = timeit(make_scan(n, steps, pallas, SUBJ), qe, ve)
                rec = {
                    "n": n, "batch": batch, "steps": steps,
                    "kernel": "pallas" if pallas else "xla",
                    "sub_j": SUBJ if pallas else None,
                    "ms_per_step": round(1e3 * t / steps, 4),
                    "pairs_per_s": round(batch * n * n * steps / t, 1),
                    "repeat_s": [round(x, 3) for x in times],
                }
                rows.append(rec)
                print(json.dumps(rec), flush=True)
    # per-n summary: batch-6 cost as a multiple of batch-2 (fused routing
    # wins when the multiple is well under (2 + D_pass_ratio))
    for n in ns:
        p = {r["batch"]: r["ms_per_step"] for r in rows
             if r["n"] == n and r["kernel"] == "pallas"}
        if 2 in p and 6 in p:
            print(f"n={n}: batch6/batch2 = {p[6] / p[2]:.2f}x "
                  f"(free-rows would be 1.0, linear 3.0)", flush=True)


if __name__ == "__main__":
    main()
