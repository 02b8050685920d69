"""Headline benchmark: all-pairs force+integrate throughput on TPU.

Workload: the BASELINE.md north-star config — synthetic Plummer sphere,
N = 65536, fp32, single chip, Pallas tiled force kernel fused with the
symplectic-Euler update, marched under lax.scan entirely on-device.

Prints ONE JSON line:
  {"metric": ..., "value": pairs/s, "unit": "pair-interactions/s",
   "vs_baseline": value / 1e10}
vs_baseline is against the 1e10 pairs/s single-chip target (BASELINE.json);
the reference publishes no numbers (BASELINE.md) — its hardware-contract
workload (N=1024 x 200001 steps on 2x GTX 1080) is ~2.1e11 pairs per full
simulation.
"""

import json
import os
import sys
import time

os.environ.setdefault("NBODY_TPU_NO_X64", "1")  # pure fp32 benchmark

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    n = int(os.environ.get("BENCH_N", 65536))
    steps = int(os.environ.get("BENCH_STEPS", 20))
    tile_i = int(os.environ.get("BENCH_TILE_I", 512))
    tile_j = int(os.environ.get("BENCH_TILE_J", 2048))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nbody_tpu.backend import enable_persistent_compile_cache
    from nbody_tpu.models.plummer import plummer_scene
    from nbody_tpu.ops.pallas_forces import pallas_step

    enable_persistent_compile_cache()   # one compile ever per signature

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    if not on_tpu:
        # CPU fallback (no Pallas TPU backend): shrink so the line still
        # prints in reasonable time.
        n = min(n, 4096)

    q, v, m = plummer_scene(n, seed=0)
    G, eps, dt = 6.674e-11, 1e-3, 60.0
    qf = jax.device_put(jnp.asarray(q, jnp.float32), dev)
    vf = jax.device_put(jnp.asarray(v, jnp.float32), dev)
    gm = jax.device_put(jnp.asarray(G * m, jnp.float32), dev)

    # the TPU worker kills single executions beyond ~60 s (measured);
    # split each step's i-range so every execution stays ~<=30 s
    pairs_per_step = float(n) * n
    est_step_s = pairs_per_step / 1.8e11
    n_splits = max(1, int(est_step_s / 30.0) + (est_step_s % 30.0 > 0))
    if on_tpu and n_splits > 1:
        from nbody_tpu.ops.pallas_forces import pallas_step_isplit

        def host_steps(q, v):
            for _ in range(steps):
                q, v = pallas_step_isplit(q, v, gm, eps=eps, dt=dt,
                                          n_splits=n_splits, tile_i=tile_i,
                                          tile_j=tile_j)
            return q, v
    elif on_tpu:
        def one_step(carry, _):
            q, v = carry
            q, v = pallas_step(q, v, gm, eps=eps, dt=dt, tile_i=tile_i,
                               tile_j=tile_j)
            return (q, v), None
    else:
        from nbody_tpu.ops.integrate import symplectic_euler_step

        def one_step(carry, _):
            q, v = carry
            q, v = symplectic_euler_step(q, v, gm / G, G=G, eps=eps, dt=dt,
                                         fast=True)
            return (q, v), None

    if on_tpu and n_splits > 1:
        run = host_steps          # host loop: bounded per-execution time
    else:
        @jax.jit
        def run(q, v):
            (q, v), _ = lax.scan(one_step, (q, v), None, length=steps)
            return q, v

    # On this remote-TPU platform block_until_ready is only reliable for
    # single monolithic executions (measured: a chain of split dispatches
    # "completes" in microseconds); the host-split path must force a
    # device->host transfer to time honestly. The transfer (~50 MB at
    # N=4M) is <2% of a split run's duration.
    sync = (lambda out: np.asarray(out[0])) if (on_tpu and n_splits > 1) \
        else jax.block_until_ready
    # BEST-of-N repeats: device-side throughput of a CACHED executable was
    # measured swinging ~5x with host/worker state (CLAUDE.md; the round-4
    # driver capture dipped 9% on a single-shot timing). The best repeat is
    # the honest hardware number; the spread goes in extra.
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    times = []
    with jax.enable_x64(False):
        # warmup/compile
        out = run(qf, vf)
        sync(out)
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(qf, vf)
            sync(out)
            times.append(time.perf_counter() - t0)
    elapsed = min(times)

    assert bool(jnp.isfinite(out[0]).all()), "non-finite positions"
    pairs = float(n) * n * steps
    pairs_per_sec = pairs / elapsed

    print(json.dumps({
        "metric": f"pallas_allpairs_fp32_n{n}_pairs_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pair-interactions/s",
        "vs_baseline": round(pairs_per_sec / 1e10, 4),
        "extra": {
            "n": n, "steps": steps, "elapsed_s": round(elapsed, 4),
            "ms_per_step": round(1e3 * elapsed / steps, 3),
            "repeats": repeats,
            "repeat_s": [round(t, 4) for t in times],
            "device": str(dev), "tile_i": tile_i, "tile_j": tile_j,
        },
    }))


if __name__ == "__main__":
    main()
