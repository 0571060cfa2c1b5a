"""1-D Kuramoto-Sivashinsky ETD simulator + corrupted-data generators.

Parity: notebooks 10/06 cell 0 (class KuramotoSivashinsky): exponential time
differencing in rfft space with exact linear factor exp(dt*(a(-k^2)+b(k^4))),
ETD1 nonlinear coefficient (e^{dtL}-1)/L, 2/3-rule dealiasing, coefficients
(a, b, c) = (-1, -1, -0.5) for u_t = -u_xx - u_xxxx + c*(u^2)_x.

The reference notebook is already JAX — this module is the packaged,
scan-based version (whole trajectory in one compiled program) with the
notebook's data-corruption generators (integer-roll spatial shifts from
default_rng(42); varying-IC trajectories).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class Ks1dConfig:
    L: float = 100.0
    N: int = 200
    dt: float = 0.05
    a: float = -1.0
    b: float = -1.0
    c: float = -0.5
    n_steps: int = 2000


def _operators(cfg: Ks1dConfig, dtype):
    dx = cfg.L / cfg.N
    freqs = jnp.fft.rfftfreq(cfg.N, d=dx)
    k = 2 * jnp.pi * freqs
    deriv_op = 1j * k
    linear = cfg.a * (-(k**2)) + cfg.b * (k**4)
    exp_term = jnp.exp(cfg.dt * linear)
    coef = jnp.where(linear == 0.0, cfg.dt, (exp_term - 1.0) / linear)
    alias_mask = (freqs < 2.0 / 3.0 * jnp.max(freqs)).astype(dtype)
    return deriv_op, exp_term, coef, alias_mask


def default_ic(cfg: Ks1dConfig, dtype=None) -> Array:
    """u0 = sin(16 pi x / L) (notebook 10 cell 0)."""
    mesh = jnp.linspace(0.0, cfg.L, cfg.N, endpoint=False)
    return jnp.sin(16 * jnp.pi * mesh / cfg.L).astype(dtype or jnp.result_type(float))


def ks1d_step(cfg: Ks1dConfig, u: Array) -> Array:
    dtype = u.dtype
    deriv_op, exp_term, coef, alias_mask = _operators(cfg, dtype)
    u_nonlin_hat = alias_mask * jnp.fft.rfft(cfg.c * u**2)
    u_next_hat = exp_term * jnp.fft.rfft(u) + coef * (deriv_op * u_nonlin_hat)
    return jnp.fft.irfft(u_next_hat, n=cfg.N)


def simulate_ks1d(cfg: Ks1dConfig, u0: Array | None = None) -> Array:
    """(n_steps + 1, N) trajectory including u0 — one lax.scan."""
    if u0 is None:
        u0 = default_ic(cfg)

    def step(u, _):
        un = ks1d_step(cfg, u)
        return un, un

    _, traj = jax.lax.scan(step, u0, None, length=cfg.n_steps)
    return jnp.concatenate([u0[None], traj], axis=0)


def spatially_shifted_data(cfg: Ks1dConfig, seed: int = 42) -> tuple[Array, np.ndarray]:
    """Clean trajectory + per-frame integer rolls in [-3, 3]
    (generate_spatially_shifted_data, notebook 10 cell 0). Returns
    (shifted trajectory, true shifts)."""
    traj = simulate_ks1d(cfg)
    rng = np.random.default_rng(seed)
    shifts = rng.integers(-3, 4, size=traj.shape[0])
    rolled = jax.vmap(lambda u, s: jnp.roll(u, s))(traj, jnp.asarray(shifts))
    return rolled, shifts


def varying_ic_data(cfg: Ks1dConfig, seed: int = 42, noise_level: float = 0.02) -> Array:
    """Frame i = i steps of evolution from an independently perturbed IC
    (generate_varying_ic_data). The reference's O(n^2) re-simulation loop
    becomes one batched scan: all (n+1) perturbed ICs advance together; frame
    i is captured when the scan counter reaches i."""
    base = default_ic(cfg)
    rng = np.random.default_rng(seed)
    n = cfg.n_steps
    ics = jnp.asarray(
        np.asarray(base)[None, :] + noise_level * rng.normal(0, 1, size=(n + 1, cfg.N)),
        dtype=base.dtype,
    )

    step_v = jax.vmap(lambda u: ks1d_step(cfg, u))

    def body(carry, i):
        states = carry
        # capture row i BEFORE stepping (frame i = i steps from its IC)
        captured = states[i]
        states = step_v(states)
        return states, captured

    _, frames = jax.lax.scan(body, ics, jnp.arange(n + 1))
    return frames
