"""Axis-first (.., 3, n) e64 layout: bit-equality + in-scan speed vs the
axis-last kernel, on the real TPU.

Measures (at the graded small-n bucket shape, batch-2 n=128):
  1. pairwise_accel_e64 vs pairwise_accel_e64_T: byte equality.
  2. a STEPS-step scanned force+Euler chunk in each layout (the solver's
     hot shape) — the layout hypothesis says the axis-first chunk should
     be several times faster (results/ACCURACY.md round 4: the axis-last
     fold/integrate ops run 3-of-128-lanes).

Env: BT_N (128), BT_BATCH (2), BT_STEPS (2000), BT_REPS (3).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.forces import pairwise_accel_e64, pairwise_accel_e64_T

N = int(os.environ.get("BT_N", 128))
BATCH = int(os.environ.get("BT_BATCH", 2))
STEPS = int(os.environ.get("BT_STEPS", 2000))
REPS = int(os.environ.get("BT_REPS", 3))
G, EPS, DT = 6.674e-11, 1e-3, 60.0


def swap(x):
    return fe.E64(jnp.swapaxes(x.hi, -1, -2), jnp.swapaxes(x.lo, -1, -2))


def make_scan(axis_first: bool):
    dth, dtl = fe.from_f64(DT)
    dte = fe.E64(jnp.uint32(int(dth)), jnp.uint32(int(dtl)))

    def step(carry, _):
        q, v = carry
        if axis_first:
            a = pairwise_accel_e64_T(q, me_g, G=G, eps=EPS)
        else:
            a = pairwise_accel_e64(q, me_g, G=G, eps=EPS)
        v = v + a * dte
        q = q + v * dte
        return (q, v), None

    @jax.jit
    def run(q, v):
        (q, v), _ = lax.scan(step, (q, v), None, length=STEPS)
        return q, v

    return run


def timeit(run, q, v, reps=REPS):
    out = run(q, v)
    np.asarray(out[0].hi)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(q, v)
    np.asarray(out[0].hi)
    return (time.perf_counter() - t0) / reps, out


def main():
    global me_g
    dev = jax.devices()[0]
    print(f"device: {dev}  n={N} batch={BATCH} steps={STEPS}", flush=True)
    rng = np.random.RandomState(0)
    q = rng.randn(BATCH, N, 3) * 1e10
    v = rng.randn(BATCH, N, 3) * 1e3
    m = np.abs(rng.randn(BATCH, N)) * 1e22
    qe = jax.device_put(fe.e64_from_f64_tree(q), dev)
    ve = jax.device_put(fe.e64_from_f64_tree(v), dev)
    me_g = jax.device_put(fe.e64_from_f64_tree(m), dev)

    only = os.environ.get("BT_ONLY")
    if only != "last":
        # 1. single-eval byte equality
        a1 = jax.jit(lambda q_: pairwise_accel_e64(q_, me_g, G=G,
                                                   eps=EPS))(qe)
        a2 = jax.jit(lambda q_: swap(
            pairwise_accel_e64_T(swap(q_), me_g, G=G, eps=EPS)))(qe)
        eq = (np.array_equal(np.asarray(a1.hi), np.asarray(a2.hi))
              and np.array_equal(np.asarray(a1.lo), np.asarray(a2.lo)))
        print(f"single-eval byte_equal={eq}", flush=True)

    # 2. scanned chunks
    t_last, out_last = timeit(make_scan(False), qe, ve)
    print(f"axis-last  chunk {t_last:7.3f} s  "
          f"{t_last / STEPS * 1e3:6.3f} ms/step  "
          f"{BATCH * N * N * STEPS / t_last:.3e} pairs/s", flush=True)
    if only == "last":
        return
    t_first, out_first = timeit(make_scan(True), swap(qe), swap(ve))
    print(f"axis-first chunk {t_first:7.3f} s  "
          f"{t_first / STEPS * 1e3:6.3f} ms/step  "
          f"({t_last / t_first:.2f}x)", flush=True)
    qf = swap(out_first[0])
    eqs = (np.array_equal(np.asarray(out_last[0].hi), np.asarray(qf.hi))
           and np.array_equal(np.asarray(out_last[0].lo), np.asarray(qf.lo)))
    print(f"scanned-chunk byte_equal={eqs}", flush=True)


if __name__ == "__main__":
    main()
