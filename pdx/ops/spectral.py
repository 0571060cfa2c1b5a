"""Spectral (FFT) derivatives and periodic filters on the trailing two axes.

Reproduces the reference semantics of ``ks2d_stridge_benchmark.py:76-142``
(wavenumber grids, radial low-pass masks, spectral gradients / Laplacian,
periodic Gaussian smoothing), batched over arbitrary leading axes via a single
``jnp.fft.fft2`` call (XLA FFT) instead of per-frame Python loops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array


def spectral_wavenumbers(nx: int, ny: int, dx: float, dy: float, dtype=None) -> tuple[Array, Array]:
    """(KX, KY) wavenumber grids in rad/physical-unit, 'ij' indexing.

    Parity: ``ks2d_stridge_benchmark.py:76-81``.
    """
    dtype = dtype or jnp.result_type(float)
    kx = 2.0 * jnp.pi * jnp.fft.fftfreq(nx, d=dx).astype(dtype)
    ky = 2.0 * jnp.pi * jnp.fft.fftfreq(ny, d=dy).astype(dtype)
    return jnp.meshgrid(kx, ky, indexing="ij")


def spectral_mask(KX: Array, KY: Array, cutoff_frac: float) -> Array:
    """Radial low-pass mask; cutoff_frac in (0, 1] (1.0 = no masking).

    Parity: ``ks2d_stridge_benchmark.py:84-93``.
    """
    cutoff_frac = float(cutoff_frac)
    if cutoff_frac >= 1.0:
        return jnp.ones_like(KX)
    if cutoff_frac <= 0.0:
        raise ValueError("cutoff_frac must be positive")
    k_mag = jnp.sqrt(KX**2 + KY**2)
    k_max = jnp.max(k_mag)
    return (k_mag <= cutoff_frac * k_max).astype(KX.dtype)


def _masked_fft2(f: Array, dx: float, dy: float, cutoff_frac: float) -> tuple[Array, Array, Array]:
    nx, ny = f.shape[-2], f.shape[-1]
    KX, KY = spectral_wavenumbers(nx, ny, dx, dy, dtype=f.dtype)
    F = jnp.fft.fft2(f)
    if cutoff_frac < 1.0:
        F = F * spectral_mask(KX, KY, cutoff_frac)
    return F, KX, KY


@partial(jax.jit, static_argnames=("cutoff_frac",))
def gradients_spectral(
    f: Array, dx: float, dy: float, *, cutoff_frac: float = 1.0
) -> tuple[Array, Array]:
    """Spectral gradient with optional radial low-pass.

    Parity: ``ks2d_stridge_benchmark.py:96-104``.
    """
    F, KX, KY = _masked_fft2(f, dx, dy, cutoff_frac)
    gx = jnp.fft.ifft2(1j * KX * F).real
    gy = jnp.fft.ifft2(1j * KY * F).real
    return gx, gy


@partial(jax.jit, static_argnames=("cutoff_frac",))
def laplacian_spectral(f: Array, dx: float, dy: float, *, cutoff_frac: float = 1.0) -> Array:
    """Spectral Laplacian with optional radial low-pass.

    Parity: ``ks2d_stridge_benchmark.py:107-115``.
    """
    F, KX, KY = _masked_fft2(f, dx, dy, cutoff_frac)
    return jnp.fft.ifft2(-(KX**2 + KY**2) * F).real


@partial(jax.jit, static_argnames=("cutoff_frac",))
def biharmonic_spectral(f: Array, dx: float, dy: float, *, cutoff_frac: float = 1.0) -> Array:
    """Spectral biharmonic computed as laplacian(laplacian(f)).

    Matches the reference's composition (``build_dictionary``:
    ``ks2d_stridge_benchmark.py:1036``) which applies the low-pass mask twice.
    """
    return laplacian_spectral(
        laplacian_spectral(f, dx, dy, cutoff_frac=cutoff_frac), dx, dy, cutoff_frac=cutoff_frac
    )


@partial(jax.jit, static_argnames=("sigma_px",))
def gaussian_smooth_periodic(f: Array, sigma_px: float) -> Array:
    """Periodic Gaussian low-pass via FFT; sigma in pixel units.

    Parity: ``ks2d_stridge_benchmark.py:125-142`` — transfer function
    exp(-0.5 sigma^2 (KX^2 + KY^2)) with KX,KY in rad/pixel.
    """
    sigma_px = float(sigma_px)
    if sigma_px <= 0:
        return f
    nx, ny = f.shape[-2], f.shape[-1]
    KX, KY = spectral_wavenumbers(nx, ny, 1.0, 1.0, dtype=jnp.result_type(f.dtype, jnp.float32))
    H = jnp.exp(-0.5 * (sigma_px**2) * (KX**2 + KY**2))
    return jnp.fft.ifft2(jnp.fft.fft2(f) * H).real


# ---------------------------------------------------------------------------
# 1-D spectral derivatives (notebooks 06/07/10 cell 1)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("order",))
def spectral_derivative_1d(f: Array, L: float, order: int = 1) -> Array:
    """n-th spectral derivative on a periodic 1-D grid of physical length L.

    Acts on the trailing axis. Parity: notebooks 06/07/10 `spectral_*derivative`.
    """
    n = f.shape[-1]
    k = 2.0 * jnp.pi * jnp.fft.fftfreq(n, d=L / n).astype(jnp.result_type(float))
    F = jnp.fft.fft(f)
    return jnp.fft.ifft(((1j * k) ** order) * F).real


@jax.jit
def lowpass_1d(f: Array, keep_frac: float) -> Array:
    """Zero out the top (1-keep_frac) fraction of 1-D frequencies (denoise_spectral,
    notebook 10 cell 31)."""
    n = f.shape[-1]
    k = jnp.abs(jnp.fft.fftfreq(n))
    mask = (k <= keep_frac * jnp.max(k)).astype(f.dtype)
    return jnp.fft.ifft(jnp.fft.fft(f) * mask).real
