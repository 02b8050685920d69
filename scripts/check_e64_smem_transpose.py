"""One-off TPU validation of the (4, tile_j) components-major SMEM
layout (ops/pallas_forces_e64.py r5): byte-compare the Mosaic kernel
against host binary64 running the serial spec's op order
(native/core.cc:98-110), at the production config and at the
tile_j=512 shape the old (tile_j, 4) layout could not fit (256 KB
lane-padded SMEM window blew the scoped-memory budget)."""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.backend import enable_persistent_compile_cache
from nbody_tpu.ops import f64emu as fe
from nbody_tpu.ops.pallas_forces_e64 import pallas_accel_e64

enable_persistent_compile_cache()


def host_f64_accel(q, gm, eps):
    n = q.shape[0]
    acc = np.zeros((n, 3))
    for j in range(n):
        dq = q[j] - q
        d2 = ((dq[:, 0] * dq[:, 0] + dq[:, 1] * dq[:, 1])
              + dq[:, 2] * dq[:, 2]) + eps * eps
        d3 = d2 * np.sqrt(d2)
        acc = acc + (gm[j] * dq) / d3[:, None]
    return acc


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    G, eps = 6.674e-11, 1e-3
    for n, rows_i, tile_j, sub_j in ((1024, 8, 256, 8), (1024, 8, 512, 8),
                                     (512, 4, 512, 8)):
        rng = np.random.RandomState(0)
        q = rng.randn(n, 3) * 1e10
        m = np.abs(rng.randn(n)) * 1e12
        gm_h = G * m
        qe = jax.device_put(fe.e64_from_f64_tree(q), dev)
        gme = jax.device_put(fe.e64_from_f64_tree(gm_h), dev)
        t0 = time.perf_counter()
        got = pallas_accel_e64(qe, gme, eps=eps, rows_i=rows_i,
                               tile_j=tile_j, sub_j=sub_j)
        gh, gl = np.asarray(got.hi), np.asarray(got.lo)
        wall = time.perf_counter() - t0
        wh, wl = fe.from_f64(host_f64_accel(q, gm_h, eps))
        eq = np.array_equal(wh, gh) and np.array_equal(wl, gl)
        print(f"n={n} r{rows_i} t{tile_j} s{sub_j}: byte_equal={eq} "
              f"(compile+eval {wall:.1f} s)", flush=True)
        assert eq, (n, rows_i, tile_j, sub_j)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
