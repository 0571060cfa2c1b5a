"""Holdout splits: temporal and spatial.

Parity: analyze_results.py:37,189-194 (time split, TRAIN_FRAC=0.7 bounded to
[0.4, 0.9]) and :41,282-299 (left/right, top/bottom masks with
SPACE_TRAIN_FRAC=0.7).

Splits are returned as index bounds / boolean masks so downstream stays
static-shaped.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array


def split_time(T: int, train_frac: float = 0.7) -> tuple[int, int]:
    """Returns (n_train, n_test) frame counts; train = first block."""
    train_frac = float(np.clip(train_frac, 0.4, 0.9))
    n_train = int(T * train_frac)
    return n_train, T - n_train


def split_space_left_right(W: int, train_frac: float = 0.7) -> tuple[Array, Array]:
    """Boolean (W,) column masks (train = left block)."""
    n_train = int(W * float(train_frac))
    cols = jnp.arange(W)
    return cols < n_train, cols >= n_train


def split_space_top_bottom(H: int, train_frac: float = 0.7) -> tuple[Array, Array]:
    """Boolean (H,) row masks (train = top block)."""
    n_train = int(H * float(train_frac))
    rows = jnp.arange(H)
    return rows < n_train, rows >= n_train


def random_row_split(n: int, train_frac: float, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """Random 70/30 row split (ks2d_stridge_benchmark.py:1639-1643) — host-side
    permutation for draw-order parity."""
    perm = rng.permutation(n)
    split = int(train_frac * n)
    return perm[:split], perm[split:]
