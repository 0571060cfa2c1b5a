"""Minimal end-to-end example: discover a PDE from synthetic data with pdx.

Parity target: the reference's examples/basic_usage.py — a self-contained
pipeline on closed-form advection-diffusion data, needing no image data.
Per the reference's own known-quirk list (its inline STRidge thresholds in a
nonstandard order), this example uses the library solver instead.

Run:  python examples/basic_usage.py
"""

import numpy as np
import jax

jax.config.update("jax_enable_x64", jax.default_backend() == "cpu")

import jax.numpy as jnp

from pdx.ops.fd import derivs_2d_reflect
from pdx.ops.linalg import gram_stats
from pdx.solve.stridge import stridge_from_stats
from pdx.ops.metrics import r2_score


def generate_synthetic_data(T=30, N=64, D=0.5, vx=0.6, vy=-0.4, decay=0.02):
    """Decaying advected sinusoid: u = exp(-decay t) sin(kx(x - vx t)) cos(ky(y - vy t)).

    Satisfies u_t = -decay*u - vx*u_x - vy*u_y + 0 (pure transport + decay);
    adding D would require matching the spatial frequencies — we keep the
    closed form simple so ground truth is exact.
    """
    L = 10.0
    x = np.linspace(0, L, N, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    kx = 2 * np.pi / L
    ky = 4 * np.pi / L
    dt = 0.05
    frames = []
    for i in range(T):
        t = i * dt
        u = np.exp(-decay * t) * np.sin(kx * (X - vx * t)) * np.cos(ky * (Y - vy * t))
        frames.append(u)
    return np.stack(frames), L / N, L / N, dt


def main():
    U, dx, dy, dt = generate_synthetic_data()
    U = jnp.asarray(U)

    # target: centered temporal derivative; features on the same frames
    u_t = (U[2:] - U[:-2]) / (2 * dt)
    u = U[1:-1]
    ux, uy, uxx, uyy = derivs_2d_reflect(u, dx, dy)
    lap = uxx + uyy

    names = ["1", "u", "u_x", "u_y", "lap(u)", "u^2"]
    terms = [jnp.ones_like(u), u, ux, uy, lap, u**2]
    X = jnp.stack([t.reshape(-1) for t in terms], axis=1)
    y = u_t.reshape(-1)

    coeffs = stridge_from_stats(gram_stats(X, y), alpha=1e-8, threshold=1e-3).coeffs
    r2 = float(r2_score(y, X @ coeffs))

    print("Discovered PDE:")
    parts = [f"{float(c):+.4f}*{n}" for c, n in zip(coeffs, names) if abs(float(c)) > 1e-6]
    print("  u_t = " + " ".join(parts))
    print(f"  R^2 = {r2:.6f}")
    # convention: u_x differentiates along cols (the vy direction of the
    # 'ij'-indexed generator), u_y along rows (the vx direction); the
    # transport form u_t = -decay*u - vx*u_row - vy*u_col therefore maps to
    # coefficients u_x -> -vy = +0.4 and u_y -> -vx = -0.6.
    print("\nGround truth: u_t = -0.0200*u +0.4000*u_x -0.6000*u_y")
    est = {n: float(c) for n, c in zip(names, coeffs)}
    ok = (
        abs(est["u"] + 0.02) < 0.01
        and abs(est["u_x"] - 0.4) < 0.05
        and abs(est["u_y"] + 0.6) < 0.05
    )
    print("\nPASS" if ok else "\nFAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
