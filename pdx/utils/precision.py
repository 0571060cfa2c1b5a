"""Precision resolution: make 'float64' requests behave sensibly per backend.

TPU has no native f64; CPU supports it behind jax_enable_x64. When a pipeline
config asks for float64: on CPU, enable x64 (parity mode); on TPU, fall back
to float32 loudly once (the TPU path compensates with HIGHEST matmul
precision, see pdx/__init__.py).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

_warned = False


def resolve_dtype(dtype_str: str) -> jnp.dtype:
    global _warned
    dtype = jnp.dtype(dtype_str)
    if dtype == jnp.float64:
        if jax.default_backend() == "cpu":
            if not jax.config.jax_enable_x64:
                jax.config.update("jax_enable_x64", True)
        elif not jax.config.jax_enable_x64:
            if not _warned:
                warnings.warn(
                    "float64 requested but backend is TPU: using float32 "
                    "(Gram accumulation runs at HIGHEST matmul precision)."
                )
                _warned = True
            return jnp.dtype(jnp.float32)
    return dtype
