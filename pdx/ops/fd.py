"""Finite-difference stencils on the trailing two axes.

Periodic stencils reproduce the reference semantics of
``scripts/ks2d_stridge_benchmark.py:63-73`` (central gradient, 5-point
Laplacian, biharmonic as laplacian of laplacian via circular shifts).
Non-periodic variants reproduce ``scripts/analyze_results.py:302-315``
(reflect-padded same-grid derivatives) and the 4th-order interior stencils of
notebook 02.

All functions operate on ``(..., H, W)`` arrays: axis=-2 is "x" (rows) and
axis=-1 is "y" (cols), matching the reference convention. Batching over time
or patches is free — no vmap needed.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _roll(f: Array, shift: int, axis: int) -> Array:
    return jnp.roll(f, shift, axis=axis)


def gradients_periodic(f: Array, dx: float, dy: float) -> tuple[Array, Array]:
    """Central-difference gradient with periodic wrap.

    Parity: ``ks2d_stridge_benchmark.py:70-73``.
    """
    gx = (_roll(f, -1, -2) - _roll(f, 1, -2)) / (2.0 * dx)
    gy = (_roll(f, -1, -1) - _roll(f, 1, -1)) / (2.0 * dy)
    return gx, gy


def laplacian_periodic(f: Array, dx: float, dy: float) -> Array:
    """5-point Laplacian with periodic wrap.

    Parity: ``ks2d_stridge_benchmark.py:63-67``.
    """
    return (
        (_roll(f, -1, -2) - 2.0 * f + _roll(f, 1, -2)) / (dx * dx)
        + (_roll(f, -1, -1) - 2.0 * f + _roll(f, 1, -1)) / (dy * dy)
    )


def biharmonic_periodic(f: Array, dx: float, dy: float) -> Array:
    """Biharmonic = laplacian(laplacian(f)) with periodic wrap.

    Parity: ``ks2d_stridge_benchmark.py:119-120`` (lap of lap).
    """
    return laplacian_periodic(laplacian_periodic(f, dx, dy), dx, dy)


def gradients_central_interior(f: Array, dx: float, dy: float) -> tuple[Array, Array]:
    """2nd-order central differences on the interior, one-sided at edges.

    Equivalent to ``np.gradient`` with edge_order=1 on the trailing axes
    (parity target: ``transport_pde_discovery.py:109-111`` which uses
    np.gradient edge_order=2 — see :func:`gradient_edge2` for that variant).
    """
    gx = jnp.gradient(f, dx, axis=-2)
    gy = jnp.gradient(f, dy, axis=-1)
    return gx, gy


def gradient_edge2(f: Array, d: float, axis: int) -> Array:
    """np.gradient with edge_order=2 semantics along ``axis``.

    Central difference in the interior; 3-point one-sided 2nd-order stencils at
    the two boundary slices. Parity: ``transport_pde_discovery.py:109`` uses
    ``np.gradient(..., edge_order=2)``.
    """
    f = jnp.moveaxis(f, axis, -1)
    interior = (f[..., 2:] - f[..., :-2]) / (2.0 * d)
    first = (-3.0 * f[..., 0] + 4.0 * f[..., 1] - f[..., 2]) / (2.0 * d)
    last = (3.0 * f[..., -1] - 4.0 * f[..., -2] + f[..., -3]) / (2.0 * d)
    out = jnp.concatenate([first[..., None], interior, last[..., None]], axis=-1)
    return jnp.moveaxis(out, -1, axis)


def _reflect_pad_2d(f: Array, pad: int) -> Array:
    """Reflect (mirror, edge not repeated) padding on trailing two axes.

    Matches ``np.pad(mode="reflect")`` — a.k.a. OpenCV BORDER_REFLECT_101.
    """
    pads = [(0, 0)] * (f.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(f, pads, mode="reflect")


def derivs_2d_reflect(f: Array, dx: float, dy: float) -> tuple[Array, Array, Array, Array]:
    """Same-grid (u_x, u_y, u_xx, u_yy) via reflect-padded central differences.

    Parity: ``analyze_results.py:302-315`` (derivs_2d) — pads one pixel with
    numpy 'reflect' then applies 2nd-order central stencils, returning arrays
    of the input shape. NOTE the real-image reference convention: "x" is the
    COLUMN axis (image horizontal, axis -1) and "y" is the row axis (axis -2)
    — opposite to the KS-benchmark convention; preserved here because every
    consumer of these fields (Models 1-6, rollout term maps) uses it.
    """
    p = _reflect_pad_2d(f, 1)
    c = p[..., 1:-1, 1:-1]
    frow_p = p[..., 2:, 1:-1]
    frow_m = p[..., :-2, 1:-1]
    fcol_p = p[..., 1:-1, 2:]
    fcol_m = p[..., 1:-1, :-2]
    ux = (fcol_p - fcol_m) / (2.0 * dx)
    uy = (frow_p - frow_m) / (2.0 * dy)
    uxx = (fcol_p - 2.0 * c + fcol_m) / (dx * dx)
    uyy = (frow_p - 2.0 * c + frow_m) / (dy * dy)
    return ux, uy, uxx, uyy


def gradients_4th_order(f: Array, dx: float, dy: float) -> tuple[Array, Array]:
    """4th-order central first derivatives with periodic wrap.

    Parity: notebook 02 cell 18 (compute_spatial_derivatives_4th_order):
    (-f[i+2] + 8 f[i+1] - 8 f[i-1] + f[i-2]) / (12 h).
    """
    gx = (
        -_roll(f, -2, -2) + 8.0 * _roll(f, -1, -2) - 8.0 * _roll(f, 1, -2) + _roll(f, 2, -2)
    ) / (12.0 * dx)
    gy = (
        -_roll(f, -2, -1) + 8.0 * _roll(f, -1, -1) - 8.0 * _roll(f, 1, -1) + _roll(f, 2, -1)
    ) / (12.0 * dy)
    return gx, gy


def second_derivs_4th_order(f: Array, dx: float, dy: float) -> tuple[Array, Array]:
    """4th-order central second derivatives with periodic wrap.

    (-f[i+2] + 16 f[i+1] - 30 f[i] + 16 f[i-1] - f[i-2]) / (12 h^2).
    """
    gxx = (
        -_roll(f, -2, -2)
        + 16.0 * _roll(f, -1, -2)
        - 30.0 * f
        + 16.0 * _roll(f, 1, -2)
        - _roll(f, 2, -2)
    ) / (12.0 * dx * dx)
    gyy = (
        -_roll(f, -2, -1)
        + 16.0 * _roll(f, -1, -1)
        - 30.0 * f
        + 16.0 * _roll(f, 1, -1)
        - _roll(f, 2, -1)
    ) / (12.0 * dy * dy)
    return gxx, gyy


def d4_1d_periodic(f: Array, dx: float) -> Array:
    """4th derivative, 2nd-order accurate, periodic (1-D, trailing axis).

    Parity: notebook 10 cell 57 ``d4``:
    (f[i+2] - 4 f[i+1] + 6 f[i] - 4 f[i-1] + f[i-2]) / dx^4.
    """
    return (
        _roll(f, -2, -1) - 4.0 * _roll(f, -1, -1) + 6.0 * f - 4.0 * _roll(f, 1, -1) + _roll(f, 2, -1)
    ) / (dx**4)
