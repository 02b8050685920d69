"""Backend/platform selection.

The graded fp64 contract (16 significant digits over 200001 chaotic steps,
hw5.cu:136-137) requires true IEEE-754 binary64. TPU has no f64 ALU; XLA
emulates f64 as a float32 pair (double-double), which we measured on this
v5e to have (a) float32 RANGE — 1e40**2 overflows to inf, while the graded
scenes have squared distances ~1e41 — and (b) non-IEEE rounding for divide
and sqrt. So:

  * precision 'f64'  -> CPU backend (true f64, bit-exact vs the C++ oracle)
  * precision 'dd'   -> TPU double-double + exact power-of-2 rescaling
                        (utils/rescale.py) to fit f32 range; ~1 ulp-of-f64
                        per-op error, deterministic
  * precision 'f32'  -> TPU fp32 (Pallas fast path) + rescaling; throughput

Call `ensure_cpu_platform()` before the first JAX backend initialization to
make the CPU backend available alongside the accelerator even when
JAX_PLATFORMS pins a single platform (as the axon TPU harness does).
"""

from __future__ import annotations

import os

import jax

_ensured = False


def ensure_cpu_platform() -> None:
    """Expose the CPU backend alongside the default accelerator platform."""
    global _ensured
    if _ensured:
        return
    _ensured = True
    # config first, env second: a runtime jax.config.update("jax_platforms",
    # "cpu") (the test harness, scripts pinning CPU) must WIN over the
    # harness env's JAX_PLATFORMS=axon — consulting the env first silently
    # re-exposed the axon backend as the default mid-test, making
    # jax.devices() (e.g. in make_mesh) reach for the tunneled TPU from
    # CPU-only tests.
    plats = (jax.config.jax_platforms
             or os.environ.get("JAX_PLATFORMS", "") or "")
    names = [p for p in plats.split(",") if p]
    if names and "cpu" not in names:
        try:
            jax.config.update("jax_platforms", ",".join(names + ["cpu"]))
        except RuntimeError:
            # Backends already initialized; jax.devices('cpu') may still work.
            pass


def enable_persistent_compile_cache() -> str:
    """Point JAX at an on-disk compilation cache and return its path.

    The XLA:CPU e64 softfloat mega-graphs compile in minutes-to-tens-of-
    minutes cold; a persistent cache makes repeat runs (tests, the
    multichip dryrun) warm. Default location is NBODY_JAX_CACHE or
    ~/.cache/jax_comp; shared by tests/conftest.py and __graft_entry__.py
    so they converge on the same warm cache. NOTE: this mutates global
    jax config for the rest of the process (intended for entry points,
    not library code)."""
    path = os.environ.get(
        "NBODY_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "jax_comp"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    return path


def device_for(platform: str | None):
    """Return the first device of `platform` ('cpu', 'tpu', ...), or the
    default device when platform is None/'auto'."""
    if platform in (None, "auto"):
        return jax.devices()[0]
    ensure_cpu_platform()
    if platform == "tpu":
        # The axon harness registers the TPU under platform name 'axon'.
        for cand in ("tpu", "axon"):
            try:
                return jax.devices(cand)[0]
            except RuntimeError:
                continue
        raise RuntimeError("no TPU-like backend available")
    return jax.devices(platform)[0]


def default_platform_for_precision(precision: str) -> str:
    return "cpu" if precision == "f64" else "tpu"
