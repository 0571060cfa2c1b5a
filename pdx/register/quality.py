"""Registration quality metrics.

Parity: compute_registration_metrics
(pde_discovery_improved_registration.py:148-171) — mean residual optical-flow
magnitude between consecutive frames before vs after registration, and the
percent improvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from pdx.register.farneback import farneback_flow


def mean_flow_magnitude(U: Array, **flow_kwargs) -> Array:
    """Mean |flow| over all consecutive frame pairs (batched).

    The reference's metric uses light Farnebäck parameters
    (pyr 0.5 / levels 3 / win 15 / iters 3 / poly 5 / sigma 1.2).
    """
    kwargs = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3, poly_n=5, poly_sigma=1.2, gaussian_win=False)
    kwargs.update(flow_kwargs)

    @jax.jit
    def pair_mag(a, b):
        fx, fy = farneback_flow(a, b, **kwargs)
        return jnp.mean(jnp.sqrt(fx**2 + fy**2))

    # sequential jitted dispatch (vmapped pyramid gathers are pathologically
    # slow on TPU — see farneback_register_sequence)
    mags = jnp.stack([pair_mag(U[i], U[i + 1]) for i in range(U.shape[0] - 1)])
    return jnp.mean(mags)


def registration_improvement(U_before: Array, U_after: Array, **flow_kwargs) -> dict[str, Array]:
    """(avg_before, avg_after, improvement%) — reference metric."""
    before = mean_flow_magnitude(U_before, **flow_kwargs)
    after = mean_flow_magnitude(U_after, **flow_kwargs)
    return {
        "avg_flow_before": before,
        "avg_flow_after": after,
        "improvement_pct": (before - after) / (before + 1e-12) * 100.0,
    }
