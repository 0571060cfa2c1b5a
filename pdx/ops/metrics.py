"""Regression/fit metrics.

Parity targets: ``ks2d_stridge_benchmark.py:29-40`` (rmse, r2 with +1e-18
denominator guard) and ``analyze_results.py:136-154`` (regression_metrics with
nRMSE, MAE, Pearson correlation).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def rmse(y_true: Array, y_pred: Array) -> Array:
    return jnp.sqrt(jnp.mean((y_true - y_pred) ** 2))


def r2_score(y_true: Array, y_pred: Array) -> Array:
    """R^2 with the reference's +1e-18 total-sum-of-squares guard."""
    ss_res = jnp.sum((y_true - y_pred) ** 2)
    ss_tot = jnp.sum((y_true - jnp.mean(y_true)) ** 2)
    return 1.0 - ss_res / (ss_tot + 1e-18)


def nrmse(y_true: Array, y_pred: Array) -> Array:
    """RMSE normalized by std of y_true (+1e-12 guard; analyze_results.py:147)."""
    return rmse(y_true, y_pred) / (jnp.std(y_true) + 1e-12)


def mae(y_true: Array, y_pred: Array) -> Array:
    return jnp.mean(jnp.abs(y_true - y_pred))


def pearson_corr(y_true: Array, y_pred: Array) -> Array:
    """Pearson correlation with epsilon-guarded denominators."""
    yt = y_true - jnp.mean(y_true)
    yp = y_pred - jnp.mean(y_pred)
    denom = jnp.sqrt(jnp.sum(yt**2)) * jnp.sqrt(jnp.sum(yp**2)) + 1e-18
    return jnp.sum(yt * yp) / denom


def regression_metrics(y_true: Array, y_pred: Array) -> dict[str, Array]:
    """Bundle of scalar metrics (analyze_results.py:136-154)."""
    return {
        "rmse": rmse(y_true, y_pred),
        "r2": r2_score(y_true, y_pred),
        "nrmse": nrmse(y_true, y_pred),
        "mae": mae(y_true, y_pred),
        "corr": pearson_corr(y_true, y_pred),
    }


def masked_regression_metrics(y_true: Array, y_pred: Array, mask: Array) -> dict[str, Array]:
    """:func:`regression_metrics` + median-abs-residual restricted to a
    boolean mask, entirely on device (static shapes — no host extraction).

    Exactly the metrics of the EXTRACTED subset ``y[mask]`` (all reductions
    run over the subset), so it replaces the host-side
    ``np.asarray(y)[mask]`` round-trips of the spatial-holdout path
    (analyze_results.py:820-902) without changing values.
    """
    w = mask.astype(y_true.dtype)
    n = jnp.sum(w)
    d = y_true - y_pred
    my = jnp.sum(w * y_true) / n
    mp = jnp.sum(w * y_pred) / n
    ss_res = jnp.sum(w * d * d)
    ss_tot = jnp.sum(w * (y_true - my) ** 2)
    rmse_m = jnp.sqrt(ss_res / n)
    yt = y_true - my
    yp = y_pred - mp
    denom = jnp.sqrt(jnp.sum(w * yt * yt)) * jnp.sqrt(jnp.sum(w * yp * yp)) + 1e-18
    return {
        "rmse": rmse_m,
        "r2": 1.0 - ss_res / (ss_tot + 1e-18),
        "nrmse": rmse_m / (jnp.sqrt(ss_tot / n) + 1e-12),
        "mae": jnp.sum(w * jnp.abs(d)) / n,
        "corr": jnp.sum(w * yt * yp) / denom,
        "resid_med_abs": jnp.nanmedian(jnp.where(mask, jnp.abs(d), jnp.nan)),
    }


def f1_support_score(est: Array, true: Array, tol: float = 1e-8) -> Array:
    """F1 score on coefficient support (notebook 10 c26 compute_f1_score)."""
    est_active = jnp.abs(est) > tol
    true_active = jnp.abs(true) > tol
    tp = jnp.sum(est_active & true_active)
    fp = jnp.sum(est_active & ~true_active)
    fn = jnp.sum(~est_active & true_active)
    precision = tp / jnp.maximum(tp + fp, 1)
    recall = tp / jnp.maximum(tp + fn, 1)
    return 2.0 * precision * recall / jnp.maximum(precision + recall, 1e-12)


def coefficient_relative_errors(est: Array, true: Array) -> Array:
    """Per-term relative error in percent (ks2d_stridge_benchmark.py:1786-1791)."""
    return jnp.abs(est - true) / (jnp.abs(true) + 1e-12) * 100.0
