"""Device-side Lasso (FISTA) — replaces sklearn coordinate descent.

Parity target: sklearn.linear_model.Lasso as used by the transport pipeline
(transport_pde_discovery.py:189-235: alpha sweep {0.001, 0.01, 0.1},
max_iter=10000) and notebook 07's alpha study. sklearn minimizes

    (1 / (2 n)) ||y - X w - b||^2 + alpha ||w||_1

The problem is convex, so FISTA converges to the same minimizer as coordinate
descent; golden tests compare against sklearn to tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


def _soft_threshold(x: Array, t: Array | float) -> Array:
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


@partial(jax.jit, static_argnames=("max_iter", "fit_intercept"))
def lasso_ista(
    X: Array,
    y: Array,
    alpha: float | Array,
    *,
    max_iter: int = 2000,
    tol: float = 1e-8,
    fit_intercept: bool = True,
    row_mask: Array | None = None,
) -> tuple[Array, Array]:
    """FISTA for the sklearn Lasso objective. Returns (coef, intercept).

    With fit_intercept, X and y are centered first (the sklearn strategy);
    the intercept is recovered as y_mean - x_mean @ coef.

    row_mask (float 0/1 per row) fits on the masked subset with static
    shapes — equivalent to dropping the zero-weight rows, so callers can
    filter non-finite samples on device instead of round-tripping the design
    matrix through the host. Masked-out rows must already hold finite
    values (zero them where the mask is zero).
    """
    n = X.shape[0] if row_mask is None else jnp.sum(row_mask)
    if fit_intercept:
        if row_mask is None:
            x_mean = jnp.mean(X, axis=0)
            y_mean = jnp.mean(y)
        else:
            x_mean = (row_mask @ X) / n
            y_mean = jnp.sum(row_mask * y) / n
        Xc = X - x_mean
        yc = y - y_mean
    else:
        x_mean = jnp.zeros(X.shape[1], dtype=X.dtype)
        y_mean = jnp.asarray(0.0, dtype=X.dtype)
        Xc = X
        yc = y
    if row_mask is not None:
        Xc = Xc * row_mask[:, None]
        yc = yc * row_mask

    G = Xc.T @ Xc / n
    b = Xc.T @ yc / n
    # Lipschitz constant of the gradient: largest eigenvalue of G
    L = jnp.linalg.eigvalsh(G)[-1] + 1e-12
    step = 1.0 / L
    thresh = alpha * step

    def cond(state):
        w, w_prev, _z, _t, i = state
        return (i < max_iter) & (jnp.max(jnp.abs(w - w_prev)) >= tol) | (i == 0)

    def body(state):
        w, _w_prev, z, t, i = state
        grad = G @ z - b
        w_new = _soft_threshold(z - step * grad, thresh)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = w_new + ((t - 1.0) / t_new) * (w_new - w)
        return w_new, w, z_new, t_new, i + 1

    p = X.shape[1]
    w0 = jnp.zeros((p,), dtype=X.dtype)
    w, _, _, _, _ = jax.lax.while_loop(
        cond, body, (w0, jnp.full((p,), jnp.inf, dtype=X.dtype), w0, jnp.asarray(1.0, X.dtype), 0)
    )
    intercept = y_mean - x_mean @ w
    return w, intercept


def lstsq_solve(X: Array, y: Array) -> Array:
    """Plain least squares via normal equations with tiny ridge for stability
    (transport_quick_test.py:113-114 uses np.linalg.lstsq)."""
    G = X.T @ X
    b = X.T @ y
    p = G.shape[0]
    return jnp.linalg.solve(G + 1e-12 * jnp.trace(G) / p * jnp.eye(p, dtype=G.dtype), b)
