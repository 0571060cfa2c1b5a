"""Independent NumPy oracle implementations of the documented algorithms.

These are written from the algorithm specifications (standardize -> ridge ->
threshold loop -> unscale, etc.) and serve as the golden reference for the
JAX implementations. Kept deliberately simple and loop-based.
"""

from __future__ import annotations

import numpy as np


def ridge_fit(X, y, alpha):
    XtX = X.T @ X
    p = XtX.shape[0]
    return np.linalg.solve(XtX + alpha * np.eye(p), X.T @ y)


def stridge(X, y, *, alpha=1e-3, threshold=1e-6, max_iter=25):
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    scale = np.where(std > 0, std, 1.0)
    Xs = (X - mean) / scale
    coeffs = ridge_fit(Xs, y, alpha).copy()
    for _ in range(max_iter):
        small = np.abs(coeffs) < threshold
        if small.all():
            coeffs[:] = 0.0
            break
        coeffs[small] = 0.0
        big = ~small
        cb = ridge_fit(Xs[:, big], y, alpha)
        coeffs = np.zeros_like(coeffs)
        coeffs[big] = cb
    return coeffs / (scale + 1e-12)


def huber_weight(r, delta=1.35):
    a = np.abs(r)
    return np.where(a <= delta, 1.0, delta / (a + 1e-12))


def irls_huber(X, y, *, alpha=1e-3, delta=1.35, max_iter=50, tol=1e-6):
    p = X.shape[1]
    beta = ridge_fit(X, y, alpha)
    for _ in range(max_iter):
        r = y - X @ beta
        sigma = float(np.median(np.abs(r)) * 1.4826 + 1e-12)
        w = huber_weight(r / sigma, delta)
        XtWX = X.T @ (X * w[:, None])
        XtWy = X.T @ (w * y)
        beta_new = np.linalg.solve(XtWX + alpha * np.eye(p), XtWy)
        if np.max(np.abs(beta_new - beta)) < tol:
            break
        beta = beta_new
    return beta


def stridge_huber(X, y, *, alpha=1e-3, threshold=1e-6, max_iter=25, delta=1.35, huber_iter=50):
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    scale = np.where(std > 0, std, 1.0)
    Xs = (X - mean) / scale
    coeffs = irls_huber(Xs, y, alpha=alpha, delta=delta, max_iter=huber_iter).copy()
    for _ in range(max_iter):
        small = np.abs(coeffs) < threshold
        if small.all():
            coeffs[:] = 0.0
            break
        coeffs[small] = 0.0
        big = ~small
        cb = irls_huber(Xs[:, big], y, alpha=alpha, delta=delta, max_iter=huber_iter)
        coeffs = np.zeros_like(coeffs)
        coeffs[big] = cb
    return coeffs / (scale + 1e-12)


def trimmed_stridge(X, y, *, alpha=1e-3, threshold=1e-6, max_iter=25, trim_frac=0.1):
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    scale = np.where(std > 0, std, 1.0)
    Xs = (X - mean) / scale
    coeffs = ridge_fit(Xs, y, alpha)
    n = len(y)
    n_trim = int(n * trim_frac)
    if n_trim > 0:
        resid = np.abs(y - Xs @ coeffs)
        keep = np.argsort(resid)[: n - n_trim]
        Xs_t, y_t = Xs[keep], y[keep]
    else:
        Xs_t, y_t = Xs, y
    coeffs = ridge_fit(Xs_t, y_t, alpha).copy()
    for _ in range(max_iter):
        small = np.abs(coeffs) < threshold
        if small.all():
            coeffs[:] = 0.0
            break
        coeffs[small] = 0.0
        big = ~small
        cb = ridge_fit(Xs_t[:, big], y_t, alpha)
        coeffs = np.zeros_like(coeffs)
        coeffs[big] = cb
    return coeffs / (scale + 1e-12)


def stridge_sign_constrained(X, y, *, alpha=1e-3, threshold=1e-6, max_iter=25, signs=None):
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    scale = np.where(std > 0, std, 1.0)
    Xs = (X - mean) / scale
    p = X.shape[1]
    if signs is None:
        signs = [0] * p
    coeffs = ridge_fit(Xs, y, alpha).copy()
    for _ in range(max_iter):
        for j in range(p):
            if signs[j] == -1 and coeffs[j] > 0:
                coeffs[j] = 0.0
            elif signs[j] == 1 and coeffs[j] < 0:
                coeffs[j] = 0.0
        small = np.abs(coeffs) < threshold
        if small.all():
            coeffs[:] = 0.0
            break
        coeffs[small] = 0.0
        big = ~small
        cb = ridge_fit(Xs[:, big], y, alpha)
        coeffs = np.zeros_like(coeffs)
        coeffs[big] = cb
        for j in range(p):
            if signs[j] == -1 and coeffs[j] > 0:
                coeffs[j] = 0.0
            elif signs[j] == 1 and coeffs[j] < 0:
                coeffs[j] = 0.0
    return coeffs / (scale + 1e-12)


def blockwise_dataset(Ut, terms, names, *, block_t, block_x, block_y):
    T, nx, ny = Ut.shape
    rows, ys = [], []
    for t0 in range(0, T, block_t):
        t1 = min(T, t0 + block_t)
        for x0 in range(0, nx, block_x):
            x1 = min(nx, x0 + block_x)
            for y0 in range(0, ny, block_y):
                y1 = min(ny, y0 + block_y)
                yb = float(np.mean(Ut[t0:t1, x0:x1, y0:y1]))
                xb = np.array([float(np.mean(terms[n][t0:t1, x0:x1, y0:y1])) for n in names])
                ys.append(yb)
                rows.append(xb)
    return np.stack(rows), np.asarray(ys)


def simulate_ks2d(Nx=100, Ny=100, Lx=50.0, Ly=50.0, dt=1e-3, n_seconds=2.0, save_every=1, seed=42):
    dx, dy = Lx / Nx, Ly / Ny
    total_steps = int(n_seconds / dt)
    n_frames = total_steps // save_every
    rng = np.random.default_rng(seed)
    u = rng.uniform(-0.1, 0.1, size=(Nx, Ny)).astype(np.float64)

    def lap(f):
        return (
            (np.roll(f, -1, 0) - 2 * f + np.roll(f, 1, 0)) / dx**2
            + (np.roll(f, -1, 1) - 2 * f + np.roll(f, 1, 1)) / dy**2
        )

    def rhs(f):
        l = lap(f)
        b = lap(l)
        gx = (np.roll(f, -1, 0) - np.roll(f, 1, 0)) / (2 * dx)
        gy = (np.roll(f, -1, 1) - np.roll(f, 1, 1)) / (2 * dy)
        return -l - b - 0.5 * (gx**2 + gy**2)

    U = np.zeros((n_frames, Nx, Ny))
    frame = 0
    for step in range(total_steps):
        u = u + dt * rhs(u)
        u = np.nan_to_num(u)
        if step % save_every == 0 and frame < n_frames:
            U[frame] = u
            frame += 1
    return U, dx, dy, dt * save_every
