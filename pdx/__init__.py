"""pdx — TPU-native PDE discovery framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
``pde-discovery-laser-matter`` pipeline: preprocess (registration, denoising,
blockwise averaging) -> derivatives (finite-difference / spectral /
local-polynomial / weak-form) -> candidate term library Theta(u) -> sparse
regression (STRidge and robust variants) -> multi-metric validation
(holdouts, one-step prediction, k-step rollout stability).

Design principles (TPU-first, not a port):
  * every numerical primitive is a pure, jittable function over ``(..., H, W)``
    arrays, vmappable over leading time/patch/bootstrap axes;
  * sparse regression runs on sufficient statistics (Gram matrices), so
    thousands of STRidge fits (hyperparameter grids, bootstrap ensembles,
    patch grids) are one batched masked-Cholesky solve on the MXU;
  * static shapes everywhere: masked weighting instead of row filtering,
    fixed support-mask STRidge, padded patch grids;
  * multi-device scaling via jax.sharding.Mesh + NamedSharding (psum Gram
    reduction over the sample axis, sharded patch/hyperparameter axes).
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# CPU forcing must happen via jax.config BEFORE the first backend init: the
# axon TPU plugin initializes (and blocks on a wedged tunnel — observed
# 2026-08-18: a crashed TPU worker hangs even `jax.devices()` for minutes)
# regardless of the JAX_PLATFORMS / JAX_PLATFORM_NAME env vars. Translating
# the env request into the honored config knob here makes every entry point
# that imports pdx (CLI, bench fallback, test harnesses) genuinely
# CPU-forceable — the only reliable way to run while the tunnel is wedged.
# Only an EXACT sole-"cpu" request (in either variable) triggers the rewrite:
# a priority list like JAX_PLATFORMS="tpu,cpu" means "prefer TPU, allow CPU
# fallback" and must not be hijacked into CPU-only. The vars are checked
# INDEPENDENTLY because this session exports an ambient JAX_PLATFORMS=axon:
# `JAX_PLATFORM_NAME=cpu pdx ...` layered over it must still force CPU.
if "cpu" in (
    (_os.environ.get("JAX_PLATFORMS") or "").strip().lower(),
    (_os.environ.get("JAX_PLATFORM_NAME") or "").strip().lower(),
):
    _jax.config.update("jax_platforms", "cpu")

# Sparse-regression recovery is precision-critical: on TPU the default matmul
# precision lowers f32 GEMMs to one bf16 MXU pass, which corrupts Gram-matrix
# accumulation enough to move discovered coefficients by percent-level amounts
# (measured: 5.3% on the |grad u|^2 KS coefficient). HIGHEST keeps true-f32
# accumulation (6-pass bf16 emulation on the MXU) at negligible cost for this
# workload's GEMM sizes. Kernels that genuinely want bf16 request it
# explicitly via preferred_element_type/precision arguments.
_jax.config.update("jax_default_matmul_precision", "highest")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Opt-in persistent compilation cache (pipeline stages compile once per
    machine, not once per process — TPU first-compiles are tens of seconds).

    Opt-in rather than automatic: XLA:CPU AOT cache entries embed machine
    features that can mismatch across processes on the same host (observed
    'prefer-no-scatter' reload errors with SIGILL warnings), so only the TPU
    benchmark/production paths should enable this.
    """
    import os

    cache_dir = cache_dir or os.environ.get(
        "PDX_COMPILATION_CACHE", os.path.expanduser("~/.cache/pdx_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", cache_dir)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
