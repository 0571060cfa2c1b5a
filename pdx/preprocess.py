"""Denoising/preprocessor bank (L2).

Parity: preprocess_* (comprehensive_benchmark.py:168-239) — Gaussian, median,
hand-rolled TV, bilateral approximation, temporal window mean, per-frame
z-score detrend, global exponential detrend. All batched device ops.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from pdx.ops.filters import gaussian_filter_reflect, median_filter_3x3, tv_denoise


def preprocess_none(U: Array) -> Array:
    return U


def preprocess_gaussian(U: Array, sigma: float = 1.0) -> Array:
    return gaussian_filter_reflect(U, sigma)


def preprocess_median(U: Array, size: int = 3) -> Array:
    if size != 3:
        raise NotImplementedError("median filter currently supports size=3")
    return median_filter_3x3(U)


def preprocess_tv(U: Array, weight: float = 0.1, n_iter: int = 50) -> Array:
    return tv_denoise(U, weight=weight, n_iter=n_iter)


def preprocess_bilateral(U: Array, sigma_s: float = 2.0, sigma_r: float = 0.1) -> Array:
    """Bilateral-like filtering (comprehensive_benchmark.py:204-212)."""
    smoothed = gaussian_filter_reflect(U, sigma_s)
    diff = U - smoothed
    w = jnp.exp(-(diff**2) / (2.0 * sigma_r**2))
    return w * U + (1.0 - w) * smoothed


def preprocess_temporal(U: Array, window: int = 3) -> Array:
    """Clamped temporal window mean (comprehensive_benchmark.py:214-221):
    frame i averages frames [max(0, i-h), min(T, i+h+1)) — edge windows
    shrink rather than reflect."""
    T = U.shape[0]
    half = window // 2
    zero = jnp.zeros_like(U[:1])
    cs = jnp.concatenate([zero, jnp.cumsum(U, axis=0)], axis=0)  # (T+1, ...)
    i = jnp.arange(T)
    lo = jnp.maximum(0, i - half)
    hi = jnp.minimum(T, i + half + 1)
    sums = cs[hi] - cs[lo]
    counts = (hi - lo).astype(U.dtype).reshape((-1,) + (1,) * (U.ndim - 1))
    return sums / counts


def preprocess_detrend(U: Array) -> Array:
    """Per-frame z-score (comprehensive_benchmark.py:223-229)."""
    mean = U.mean(axis=(-2, -1), keepdims=True)
    std = U.std(axis=(-2, -1), keepdims=True)
    return (U - mean) / (std + 1e-10)


def preprocess_detrend_global(U: Array) -> Array:
    """Divide out a fitted global exponential intensity trend, then z-score
    the whole stack (comprehensive_benchmark.py:231-239)."""
    T = U.shape[0]
    means = U.mean(axis=(-2, -1))
    t = jnp.arange(T, dtype=U.dtype)
    log_means = jnp.log(jnp.abs(means) + 1e-10)
    # linear fit in log space (closed form)
    tbar = t.mean()
    lbar = log_means.mean()
    slope = jnp.sum((t - tbar) * (log_means - lbar)) / jnp.sum((t - tbar) ** 2)
    intercept = lbar - slope * tbar
    trend = jnp.exp(slope * t + intercept)
    out = U / (trend[:, None, None] + 1e-10)
    return (out - out.mean()) / (out.std() + 1e-10)


PREPROCESSORS = {
    "none": preprocess_none,
    "gaussian": preprocess_gaussian,
    "median": preprocess_median,
    "tv": preprocess_tv,
    "bilateral": preprocess_bilateral,
    "temporal": preprocess_temporal,
    "detrend": preprocess_detrend,
    "detrend_global": preprocess_detrend_global,
}
