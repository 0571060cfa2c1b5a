"""Dynamic Mode Decomposition denoisers/preconditioners.

Parity: standard_dmd / multiscale_dmd / sparse_dmd
(comprehensive_benchmark.py:245-321) — DMD reconstruction used as a denoiser
before SINDy (methods M12-M17, M20-M21).

Host/device split: the (pixels x frames) SVD and the mode reconstruction
GEMMs run on device (MXU); the tiny r x r complex eigendecomposition runs on
the host (rank <= 50; XLA TPU has no complex eig and the matrix is
microscopic).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array


def standard_dmd(data: Array, rank: int | None = None) -> Array:
    """Exact-DMD reconstruction of a (T, H, W) stack.

    Parity: comprehensive_benchmark.py:245-270 — SVD of X1, projected
    operator Atilde, eigen-modes Phi, initial amplitudes b from lstsq, and a
    Vandermonde rollup over frames.
    """
    T, H, W = data.shape
    X = data.reshape(T, -1).T  # (N, T)
    X1, X2 = X[:, :-1], X[:, 1:]

    U, s, Vh = jnp.linalg.svd(X1, full_matrices=False)
    r = min(rank or s.shape[0], s.shape[0], T - 2)
    U, s, Vh = U[:, :r], s[:r], Vh[:r, :]
    s_reg = jnp.where(s > 1e-10, s, 1e-10)

    Atilde = U.T @ X2 @ Vh.T @ jnp.diag(1.0 / s_reg)  # (r, r)
    eigvals, Wm = np.linalg.eig(np.asarray(Atilde))  # host: tiny complex eig
    eigvals = jnp.asarray(eigvals)
    Wm = jnp.asarray(Wm)

    Phi = (X2 @ Vh.T @ jnp.diag(1.0 / s_reg)).astype(Wm.dtype) @ Wm  # (N, r) complex
    b, *_ = jnp.linalg.lstsq(Phi, X[:, 0].astype(Phi.dtype))

    # Vandermonde rollup: X_recon[:, t] = Phi @ (b * eigvals**t)
    t_pow = eigvals[None, :] ** jnp.arange(T)[:, None]  # (T, r)
    recon = (Phi @ (b[:, None] * t_pow.T)).real  # (N, T)
    return recon.T.reshape(data.shape).astype(data.dtype)


def multiscale_dmd(data: Array, low_rank: int = 5, high_rank: int = 15, cutoff: float = 0.1) -> Array:
    """Frequency-split DMD (comprehensive_benchmark.py:272-295): FFT low/high
    separation at |k| < cutoff, separate DMD ranks, recombine."""
    T, H, W = data.shape
    kx = jnp.fft.fftfreq(H)
    ky = jnp.fft.fftfreq(W)
    KX, KY = jnp.meshgrid(kx, ky, indexing="ij")
    K = jnp.sqrt(KX**2 + KY**2)
    low_mask = (K < cutoff).astype(data.dtype)

    F = jnp.fft.fft2(data)
    u_low = jnp.fft.ifft2(F * low_mask).real
    u_high = jnp.fft.ifft2(F * (1.0 - low_mask)).real
    return standard_dmd(u_low, rank=low_rank) + standard_dmd(u_high, rank=high_rank)


def sparse_dmd(data: Array, rank: int = 20, sparsity: float = 0.1) -> Array:
    """Mode-energy percentile selection DMD (comprehensive_benchmark.py:297-321)."""
    T, H, W = data.shape
    X = data.reshape(T, -1).T
    X1, X2 = X[:, :-1], X[:, 1:]
    U, s, Vh = jnp.linalg.svd(X1, full_matrices=False)
    r = min(rank, s.shape[0])
    U, s, Vh = U[:, :r], s[:r], Vh[:r, :]

    Atilde = U.T @ X2 @ Vh.T @ jnp.diag(1.0 / s)
    eigvals, Wm = np.linalg.eig(np.asarray(Atilde))
    Phi = np.asarray((X2 @ Vh.T @ jnp.diag(1.0 / s)).astype(jnp.complex128 if X.dtype == jnp.float64 else jnp.complex64)) @ Wm

    mode_energies = np.abs(Phi).sum(axis=0)
    thr = np.percentile(mode_energies, 100 * (1 - sparsity))
    keep = mode_energies >= thr
    Phi_s = jnp.asarray(Phi[:, keep])
    eig_s = jnp.asarray(eigvals[keep])

    b, *_ = jnp.linalg.lstsq(Phi_s, X[:, 0].astype(Phi_s.dtype))
    t_pow = eig_s[None, :] ** jnp.arange(T)[:, None]
    recon = (Phi_s @ (b[:, None] * t_pow.T)).real
    return recon.T.reshape(data.shape).astype(data.dtype)
