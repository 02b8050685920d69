"""Pallas vs XLA e64 force kernel on the TPU: byte-equality + per-eval
wall time at a ladder of n (VERDICT r2 next-1: "evaluate and measure,
even if rejected").

Timing follows the axon rules (CLAUDE.md): transfer-forced, and e64
numbers are only meaningful on a fresh/idle worker (compile-service
state swings XLA-compiled e64 4.4x; the Pallas path is the hedge).
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.forces import pairwise_accel_e64
from nbody_tpu.ops.pallas_forces_e64 import pallas_accel_e64


def timeit(fn, reps=3):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0])            # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0])            # transfer-forced
    return (time.perf_counter() - t0) / reps, out


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    G, eps = 6.674e-11, 1e-3
    Gh, Gl = fe.from_f64(G)
    for n in (512, 1024, 4096):
        rng = np.random.RandomState(0)
        q = rng.randn(n, 3) * 1e10
        m = np.abs(rng.randn(n)) * 1e12
        qe = jax.device_put(fe.e64_from_f64_tree(q), dev)
        me = jax.device_put(fe.e64_from_f64_tree(m), dev)
        gm = fe.E64(*fe.mul(np.uint32(Gh), np.uint32(Gl), me.hi, me.lo))

        t_x, out_x = timeit(jax.jit(
            lambda qe=qe, me=me: pairwise_accel_e64(qe, me, G=G, eps=eps)))
        print(f"n={n:5d}  xla    {t_x*1e3:9.2f} ms/eval  "
              f"{n*n/t_x:.3e} pairs/s", flush=True)
        # each variant is a fresh remote Mosaic compile (~minutes): keep
        # the grid tight — rows/sub_j probe pipeline fill, tile_j is the
        # SMEM block (grid-minor trip count)
        for rows_i, tile_j, sub_j in ((8, 256, 8), (8, 256, 16),
                                      (4, 256, 8), (8, 128, 4)):
            if n % (rows_i * 128) or n % tile_j:
                continue
            # Mosaic block rule: second-to-last dim divisible by 8 or
            # equal to the full dim (n//128 rows)
            if rows_i % 8 and rows_i != n // 128:
                continue
            t_p, out_p = timeit(jax.jit(_make_fn(
                rows_i, tile_j, sub_j, qe, gm, eps)))
            eq = (np.array_equal(np.asarray(out_x.hi), np.asarray(out_p.hi))
                  and np.array_equal(np.asarray(out_x.lo),
                                     np.asarray(out_p.lo)))
            print(f"n={n:5d}  pallas r{rows_i} t{tile_j} s{sub_j} "
                  f"{t_p*1e3:9.2f} ms/eval  {n*n/t_p:.3e} pairs/s  "
                  f"byte_equal={eq}", flush=True)


def _make_fn(rows_i, tile_j, sub_j, qe, gm, eps):
    # binds the loop variables (late-binding lambda pitfall)
    return lambda: pallas_accel_e64(qe, gm, eps=eps, rows_i=rows_i,
                                    tile_j=tile_j, sub_j=sub_j)


if __name__ == "__main__":
    main()
