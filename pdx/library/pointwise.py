"""Pointwise dataset builder: forward-difference u_t target + flat-index sampling.

Parity: the pointwise branch of ks2d_stridge_benchmark.py main()
(:1551-1636): Ut = (U[1:] - U[:-1]) / DT paired with terms evaluated on
U[:-1]; random no-replacement subsample of flat indices; finite-mask filter.

Index generation happens on the host with numpy (np.random.default_rng, the
reference's exact draw order) so golden tests are sample-for-sample; the
gather and everything downstream run on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array


def forward_difference_ut(U: Array, DT: float) -> Array:
    """(U[1:] - U[:-1]) / DT — Euler-consistent temporal derivative."""
    return (U[1:] - U[:-1]) / DT


def sample_flat_indices(n_total: int, n_sample: int, rng: np.random.Generator) -> np.ndarray:
    """Host-side no-replacement flat-index sample (reference: rng.choice)."""
    n_sample = int(min(n_sample, n_total))
    return rng.choice(n_total, size=n_sample, replace=False)


def build_pointwise_dataset(
    Ut: Array,
    terms: Array,
    flat_idx: np.ndarray | Array,
) -> tuple[Array, Array]:
    """Gather sampled rows: X[(n, p)], y[(n,)].

    ``terms`` is (p, T, H, W) aligned with Ut (T, H, W). Non-finite rows are
    zero-weighted downstream (static shapes) rather than filtered; for the
    clean/noise pipelines every sample is finite so this matches the
    reference's boolean filter exactly.
    """
    idx = jnp.asarray(flat_idx)
    y = Ut.reshape(-1)[idx]
    p = terms.shape[0]
    X = terms.reshape(p, -1)[:, idx].T
    return X, y


def finite_row_weights(X: Array, y: Array) -> Array:
    """1.0 where the row is fully finite else 0.0 (static-shape replacement
    for the reference's boolean row filter, ks2d_stridge_benchmark.py:1633)."""
    ok = jnp.isfinite(X).all(axis=1) & jnp.isfinite(y)
    return ok.astype(X.dtype)
