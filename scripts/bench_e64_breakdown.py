"""Per-stage timing breakdown of the e64 Mosaic force kernel.

Ablates the softfloat chain after successive stages (pallas_forces_e64's
`ablate` knob, timing instrumentation only) to attribute the per-pair
cost before attacking it (VERDICT r4 #3: constant-operand
specialization vs wider stacking vs accepting the wall):

  dq    3 add_u (position deltas)              + 3 fold add_u
  d2    + 3 sqr_u + 3 add_u (squared distance incl. eps2)
  d3    + sqrt_u + mul_u
  num   + 3 mul_u (gm * dq)                    [+1 add_u of noise]
  full  + _div_prep + 3 _div_core  (production kernel)

Stage deltas are the cost of the ops that stage adds. Same in-scan
force+Euler harness as bench_e64_rows.py.

Env: BB_N (1024), BB_BATCH (2), BB_STEPS (auto), BB_REPS (3), BB_SUBJ (8).
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
from nbody_tpu.ops.pallas_forces_e64 import pallas_accel_e64

G, EPS, DT = 6.674e-11, 1e-3, 60.0


def make_scan(n, steps, sub_j, ablate, me_g):
    dth, dtl = fe.from_f64(DT)
    dte = fe.E64(jnp.uint32(int(dth)), jnp.uint32(int(dtl)))
    Gh, Gl = fe.from_f64(G)

    def step(carry, _):
        q, v = carry
        gm = fe.E64(*fe.mul(jnp.uint32(int(Gh)), jnp.uint32(int(Gl)),
                            me_g.hi, me_g.lo))
        a = pallas_accel_e64(q, gm, eps=EPS, rows_i=max(1, min(8, n // 128)),
                             tile_j=min(256, n), sub_j=sub_j, ablate=ablate)
        v = v + a * dte
        q = q + v * dte
        return (q, v), None

    @jax.jit
    def run(q, v):
        (q, v), _ = lax.scan(step, (q, v), None, length=steps)
        return q, v

    return run


def main():
    enable_persistent_compile_cache()
    dev = jax.devices()[0]
    n = int(os.environ.get("BB_N", 1024))
    batch = int(os.environ.get("BB_BATCH", 2))
    reps = int(os.environ.get("BB_REPS", 3))
    sub_j = int(os.environ.get("BB_SUBJ", 8))
    steps = int(os.environ.get(
        "BB_STEPS", max(200, min(2000, int(25.0 * 3e8 / (batch * n * n))))))
    print(f"device: {dev}  n={n} batch={batch} steps={steps} sub_j={sub_j}",
          flush=True)

    rng = np.random.RandomState(0)
    q = rng.randn(batch, n, 3) * 1e10
    v = rng.randn(batch, n, 3) * 1e3
    m = np.abs(rng.randn(batch, n)) * 1e22
    qe = jax.device_put(fe.e64_from_f64_tree(q), dev)
    ve = jax.device_put(fe.e64_from_f64_tree(v), dev)
    me_g = jax.device_put(fe.e64_from_f64_tree(m), dev)

    res = {}
    for stage in ("dq", "d2", "d3", "num", ""):
        run = make_scan(n, steps, sub_j, stage, me_g)
        out = run(qe, ve)
        np.asarray(out[0].hi)          # transfer-forced sync (CLAUDE.md)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(qe, ve)
            np.asarray(out[0].hi)
            times.append(time.perf_counter() - t0)
        t = min(times)
        name = stage or "full"
        res[name] = 1e3 * t / steps
        print(json.dumps({"stage": name, "ms_per_step": round(res[name], 4),
                          "repeat_s": [round(x, 3) for x in times]}),
              flush=True)

    order = ["dq", "d2", "d3", "num", "full"]
    full = res["full"]
    prev = 0.0
    print("\nstage deltas (cost of the ops each stage adds):", flush=True)
    for name in order:
        d = res[name] - prev
        print(f"  {name:5s} {res[name]:8.3f} ms  (+{d:7.3f} ms, "
              f"{100 * d / full:5.1f}% of full)", flush=True)
        prev = res[name]


if __name__ == "__main__":
    main()
