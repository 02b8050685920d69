"""Micro-bench of the e64 softfloat ops and the e64 force eval on the TPU.

Prints per-element ns for add/mul/div/sqrt on large vectors and ms per
pairwise_accel_e64 force eval — the profile that directs the fold/div
optimization work (VERDICT r2 next-1). Timing follows the axon rules
(CLAUDE.md): force a device->host transfer to time honestly.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.ops import f64emu as fe


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])            # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])            # transfer-forced
    return (time.perf_counter() - t0) / reps


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.RandomState(0)
    n = 1 << 20
    a = rng.uniform(0.5, 2.0, n) * 10.0 ** rng.randint(-30, 30, n)
    b = rng.uniform(0.5, 2.0, n) * 10.0 ** rng.randint(-30, 30, n)
    ah, al = (jax.device_put(x, dev) for x in fe.from_f64(a))
    bh, bl = (jax.device_put(x, dev) for x in fe.from_f64(b))

    ops = {
        "add": jax.jit(lambda: fe.add(ah, al, bh, bl)),
        "mul": jax.jit(lambda: fe.mul(ah, al, bh, bl)),
        "div": jax.jit(lambda: fe.div(ah, al, bh, bl)),
        "sqrt": jax.jit(lambda: fe.sqrt(ah, al)),
    }
    for name, fn in ops.items():
        t = timeit(fn)
        print(f"{name:5s}: {t / n * 1e9:8.2f} ns/elem   ({t*1e3:.1f} ms)")

    # force eval baseline (n=1024): healthy-epoch record is ~7.6 ms
    from nbody_tpu.ops.forces import pairwise_accel_e64

    m = np.abs(rng.randn(1024)) * 1e12
    q = rng.randn(1024, 3) * 1e10
    qe = fe.e64_from_f64_tree(q)
    me = fe.e64_from_f64_tree(m)
    qe = fe.E64(jax.device_put(qe.hi, dev), jax.device_put(qe.lo, dev))
    me = fe.E64(jax.device_put(me.hi, dev), jax.device_put(me.lo, dev))
    f = jax.jit(lambda: pairwise_accel_e64(qe, me, G=6.674e-11, eps=1e-3))
    t = timeit(f, reps=3)
    print(f"force n=1024: {t*1e3:.2f} ms/eval "
          f"({1024*1024/t/1e6:.1f} Mpairs/s)")


if __name__ == "__main__":
    main()
