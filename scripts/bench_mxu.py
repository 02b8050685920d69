"""MXU vs VPU force-kernel bench (VERDICT r3 #1).

The fp32 fast path has been VPU-bound at ~1.76e11 pairs/s for three
rounds (results/ACCURACY.md: ~73% of VPU peak at 16 ops/pair). The MXU
kernel (ops/pallas_forces._accel_kernel_mxu) moves the O(n^2) work onto
the systolic array; this script measures, on the real TPU and on the
bench.py Plummer scene:

  * throughput of a 20-step fused scan per precision variant
    (gram x accum in {DEFAULT (bf16 1-pass), HIGH (3-pass), HIGHEST
    (6-pass)}), vs the VPU dq-form kernel;
  * accuracy of one force eval per variant against the VPU kernel's
    (max / rms relative-to-rms difference) — the Gram form's near-pair
    cancellation and bf16 input rounding priced on real data.

Slot model for context (v5e, 98.5e12 MAC/s bf16): both matmuls burn 128
MAC-slots/pair (K=4 and N=4 use 4/128 of the array), so the MXU bound is
~3.85e11 pairs/s at DEFAULT, /2 per extra pass-triple: HIGH gram pushes
it to ~1.9e11, HIGH+HIGH ~1.3e11. The VPU side of the MXU kernel (~10
ops/pair) bounds at ~3.9e11. DEFAULT is the only variant with headroom;
the question is whether Mosaic overlaps MXU and VPU well enough to beat
the dq kernel, and what the bf16/Gram error costs.

Env: BM_N (65536), BM_STEPS (20), BM_TILE_I (512), BM_TILE_J (2048),
BM_VARIANTS (comma list of gram:accum, default all).
Each variant is one remote-compile signature (~2-4 min on axon).
"""

import json
import os
import sys
import time

os.environ.setdefault("NBODY_TPU_NO_X64", "1")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nbody_tpu.models.plummer import plummer_scene
from nbody_tpu.ops.pallas_forces import (pallas_accel, pallas_accel_mxu,
                                         pallas_step, pallas_step_mxu)

N = int(os.environ.get("BM_N", 65536))
STEPS = int(os.environ.get("BM_STEPS", 20))
TILE_I = int(os.environ.get("BM_TILE_I", 512))
TILE_J = int(os.environ.get("BM_TILE_J", 2048))
# Mosaic's dot lowering supports only DEFAULT (1-pass bf16) and HIGHEST
# (6-pass bf16x3 f32-faithful); HIGH raises NotImplementedError (measured).
PREC = {"default": lax.Precision.DEFAULT, "highest": lax.Precision.HIGHEST}
VARIANTS = os.environ.get(
    "BM_VARIANTS",
    "default:default,highest:default,default:highest,highest:highest"
).split(",")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  n={N} steps={STEPS} tiles=({TILE_I},{TILE_J})",
          flush=True)
    q, v, m = plummer_scene(N, seed=0)
    G, eps, dt = 6.674e-11, 1e-3, 60.0
    qf = jax.device_put(jnp.asarray(q, jnp.float32), dev)
    vf = jax.device_put(jnp.asarray(v, jnp.float32), dev)
    gm = jax.device_put(jnp.asarray(G * m, jnp.float32), dev)

    def bench(step_fn):
        @jax.jit
        def run(q, v):
            def one(carry, _):
                return step_fn(*carry), None
            (q, v), _ = lax.scan(one, (q, v), None, length=STEPS)
            return q, v
        with jax.enable_x64(False):
            out = jax.block_until_ready(run(qf, vf))   # compile + warm
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(qf, vf))
            el = time.perf_counter() - t0
        finite = bool(jnp.isfinite(out[0]).all())
        return float(N) * N * STEPS / el, el, finite

    results = {}
    # VPU baseline: force eval (accuracy anchor) + step throughput
    a_vpu = pallas_accel(qf, gm, eps=eps, tile_i=TILE_I, tile_j=TILE_J)
    a_vpu = np.asarray(a_vpu, np.float64)
    rms = float(np.sqrt((a_vpu ** 2).mean()))
    pps, el, _ = bench(lambda q, v: pallas_step(
        q, v, gm, eps=eps, dt=dt, tile_i=TILE_I, tile_j=TILE_J))
    results["vpu_dq"] = {"pairs_per_sec": pps, "elapsed_s": el}
    print(f"vpu_dq            {pps:.4g} pairs/s", flush=True)

    for var in VARIANTS:
        gname, aname = var.split(":")
        gp, ap = PREC[gname], PREC[aname]
        a = pallas_accel_mxu(qf, gm, eps=eps, tile_i=TILE_I, tile_j=TILE_J,
                             gram_precision=gp, accum_precision=ap)
        d = np.asarray(a, np.float64) - a_vpu
        err_max = float(np.abs(d).max() / rms)
        err_rms = float(np.sqrt((d ** 2).mean()) / rms)
        print(f"mxu {var:<17s} err max/rms = {err_max:.3g} / {err_rms:.3g}",
              flush=True)
        pps, el, finite = bench(lambda q, v: pallas_step_mxu(
            q, v, gm, eps=eps, dt=dt, tile_i=TILE_I, tile_j=TILE_J,
            gram_precision=gp, accum_precision=ap))
        results[f"mxu_{var}"] = {
            "pairs_per_sec": pps, "elapsed_s": el, "finite_after_steps": finite,
            "err_max_over_rms": err_max, "err_rms_over_rms": err_rms,
        }
        print(f"mxu {var:<17s} {pps:.4g} pairs/s   finite={finite}",
              flush=True)

    print(json.dumps({"n": N, "steps": STEPS, "tile_i": TILE_I,
                      "tile_j": TILE_J, "results": results}))


if __name__ == "__main__":
    main()
