"""Golden tests: JAX solver family vs the independent NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pdx.ops.linalg import gram_stats, standardized_stats, masked_ridge_solve
from pdx.solve.stridge import stridge, stridge_from_stats, stridge_grid
from pdx.solve.robust import (
    irls_huber,
    stridge_huber,
    trimmed_stridge,
    stridge_sign_constrained,
    ensemble_stridge,
    robust_stridge,
    bootstrap_indices,
)
from pdx.solve.lasso import lasso_ista

import oracle


def make_problem(n=2000, p=8, noise=0.01, sparsity=3, seed=0, outliers=0.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, p)) * rng.uniform(0.5, 3.0, size=p)
    true = np.zeros(p)
    idx = rng.choice(p, size=sparsity, replace=False)
    true[idx] = rng.normal(size=sparsity) * 2.0
    y = X @ true + noise * rng.normal(size=n)
    if outliers > 0:
        n_out = int(n * outliers)
        out_idx = rng.choice(n, size=n_out, replace=False)
        y[out_idx] += rng.normal(size=n_out) * 20.0
    return X, y, true


class TestStridge:
    @pytest.mark.parametrize("alpha,threshold", [(1e-3, 1e-6), (1e-6, 0.05), (1e-2, 0.5), (1.0, 10.0)])
    def test_matches_oracle(self, alpha, threshold):
        X, y, _ = make_problem()
        want = oracle.stridge(X, y, alpha=alpha, threshold=threshold)
        got = np.asarray(stridge(jnp.asarray(X), jnp.asarray(y), alpha=alpha, threshold=threshold))
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)

    def test_all_small_returns_zero(self):
        X, y, _ = make_problem()
        got = np.asarray(stridge(jnp.asarray(X), jnp.asarray(y), alpha=1e-3, threshold=1e9))
        np.testing.assert_array_equal(got, np.zeros_like(got))

    def test_recovers_sparse_truth(self):
        X, y, true = make_problem(noise=1e-6)
        got = np.asarray(stridge(jnp.asarray(X), jnp.asarray(y), alpha=1e-8, threshold=1e-3))
        np.testing.assert_allclose(got, true, atol=1e-4)

    def test_grid_matches_loop(self):
        X, y, _ = make_problem()
        stats = gram_stats(jnp.asarray(X), jnp.asarray(y))
        alphas = [1e-6, 1e-4, 1e-2]
        thresholds = [1e-8, 1e-3, 0.1]
        coeffs, _ = stridge_grid(stats, jnp.asarray(alphas), jnp.asarray(thresholds))
        for ai, a in enumerate(alphas):
            for ti, t in enumerate(thresholds):
                want = oracle.stridge(X, y, alpha=a, threshold=t)
                np.testing.assert_allclose(np.asarray(coeffs[ai, ti]), want, rtol=1e-8, atol=1e-10)

    def test_masked_ridge_equals_submatrix_solve(self):
        rng = np.random.default_rng(3)
        p = 6
        A = rng.normal(size=(p, p))
        G = A @ A.T + p * np.eye(p)
        b = rng.normal(size=p)
        mask = np.array([1, 0, 1, 1, 0, 1], dtype=float)
        got = np.asarray(masked_ridge_solve(jnp.asarray(G), jnp.asarray(b), jnp.asarray(mask), 0.1))
        act = mask.astype(bool)
        sub = np.linalg.solve(G[np.ix_(act, act)] + 0.1 * np.eye(act.sum()), b[act])
        want = np.zeros(p)
        want[act] = sub
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_standardized_stats_match_direct(self):
        X, y, _ = make_problem(n=500, p=5)
        stats = gram_stats(jnp.asarray(X), jnp.asarray(y))
        Gs, bs, mean, scale = standardized_stats(stats)
        Xs = (X - X.mean(0)) / np.where(X.std(0) > 0, X.std(0), 1.0)
        np.testing.assert_allclose(np.asarray(Gs), Xs.T @ Xs, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(bs), Xs.T @ y, rtol=1e-8)


class TestRobust:
    def test_irls_huber_matches_oracle(self):
        X, y, _ = make_problem(outliers=0.05)
        want = oracle.irls_huber(X, y, alpha=1e-3)
        got = np.asarray(irls_huber(jnp.asarray(X), jnp.asarray(y), alpha=1e-3))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_stridge_huber_matches_oracle(self):
        X, y, _ = make_problem(outliers=0.05)
        want = oracle.stridge_huber(X, y, alpha=1e-3, threshold=0.05)
        got = np.asarray(stridge_huber(jnp.asarray(X), jnp.asarray(y), alpha=1e-3, threshold=0.05))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_trimmed_matches_oracle(self):
        X, y, _ = make_problem(outliers=0.05)
        want = oracle.trimmed_stridge(X, y, alpha=1e-3, threshold=0.05, trim_frac=0.1)
        got = np.asarray(
            trimmed_stridge(jnp.asarray(X), jnp.asarray(y), alpha=1e-3, threshold=0.05, trim_frac=0.1)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_sign_constrained_matches_oracle(self):
        X, y, _ = make_problem(seed=5)
        signs = [-1, 0, 1, -1, 0, 1, -1, 0]
        want = oracle.stridge_sign_constrained(X, y, alpha=1e-3, threshold=0.01, signs=signs)
        got = np.asarray(
            stridge_sign_constrained(jnp.asarray(X), jnp.asarray(y), alpha=1e-3, threshold=0.01, signs=signs)
        )
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)

    def test_ensemble_median_reasonable(self):
        X, y, true = make_problem(noise=0.01, outliers=0.02)
        mean_c, std_c = ensemble_stridge(
            jnp.asarray(X), jnp.asarray(y), alpha=1e-4, threshold=0.05, n_bootstrap=10
        )
        np.testing.assert_allclose(np.asarray(mean_c), true, atol=0.1)
        assert np.all(np.asarray(std_c) >= 0)

    def test_ensemble_matches_oracle_per_member(self):
        X, y, _ = make_problem(n=400, p=5)
        n_sub = max(int(400 * 0.7), 1)
        idx = bootstrap_indices(400, n_sub, 4, seed=0)
        mean_c, _ = ensemble_stridge(
            jnp.asarray(X), jnp.asarray(y), alpha=1e-3, threshold=0.02,
            n_bootstrap=4, subsample_frac=0.7, seed=0, use_huber=False,
        )
        member_coeffs = np.stack([oracle.stridge(X[i], y[i], alpha=1e-3, threshold=0.02) for i in idx])
        np.testing.assert_allclose(np.asarray(mean_c), np.median(member_coeffs, axis=0), rtol=1e-6, atol=1e-9)

    def test_robust_pipeline_runs_and_recovers(self):
        X, y, true = make_problem(noise=0.01, outliers=0.05)
        coeffs, info = robust_stridge(
            jnp.asarray(X), jnp.asarray(y), alpha=1e-4, threshold=0.05, n_bootstrap=8
        )
        np.testing.assert_allclose(np.asarray(coeffs), true, atol=0.1)
        assert "ci_95_low" in info


class TestLasso:
    def test_matches_sklearn(self):
        sklearn_lm = pytest.importorskip("sklearn.linear_model")
        X, y, _ = make_problem(n=1000, p=6, noise=0.05)
        for alpha in (0.001, 0.01, 0.1):
            ref = sklearn_lm.Lasso(alpha=alpha, max_iter=10000)
            ref.fit(X, y)
            w, b = lasso_ista(jnp.asarray(X), jnp.asarray(y), alpha, max_iter=5000)
            np.testing.assert_allclose(np.asarray(w), ref.coef_, atol=2e-4)
            assert abs(float(b) - ref.intercept_) < 2e-4


class TestStridgeQR:
    def test_matches_gram_path_f64(self):
        from pdx.solve.stridge import stridge_qr

        X, y, _ = make_problem()
        for alpha, thr in ((1e-3, 1e-6), (1e-6, 0.05)):
            want = oracle.stridge(X, y, alpha=alpha, threshold=thr)
            got = np.asarray(stridge_qr(jnp.asarray(X), jnp.asarray(y), alpha=alpha, threshold=thr))
            np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-9)

    def test_f32_accuracy_on_illconditioned(self):
        """On an ill-conditioned dictionary (collinear columns of wildly
        different scales) the f32 QR path must stay accurate where the f32
        Gram path loses percent-level accuracy (SURVEY §7.4 risk)."""
        from pdx.solve.stridge import stridge_qr, stridge

        rng = np.random.default_rng(0)
        n = 20000
        base = rng.normal(size=n)
        X = np.stack(
            [base, base + 1e-3 * rng.normal(size=n), rng.normal(size=n) * 100.0, np.ones(n)],
            axis=1,
        )
        true = np.array([2.0, 0.0, 0.03, 0.0])
        y = X @ true
        want = oracle.stridge(X, y, alpha=1e-8, threshold=1e-4)
        got32 = np.asarray(
            stridge_qr(jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32), alpha=1e-8, threshold=1e-4)
        )
        # f32 QR within 1e-2 of the f64 oracle on cond ~ 1e6 data
        np.testing.assert_allclose(got32, want, atol=2e-2)


class TestConstantColumn:
    def test_constant_column_does_not_blow_up(self):
        """XLA's std of an exactly-constant column can be O(eps) instead of 0;
        without a relative tolerance the final unscale divides by ~1e-16 and
        coefficients explode (observed 2.4e8 on a real pipeline). All
        standardize paths must treat near-zero std as zero variance."""
        from pdx.solve.stridge import stridge_qr
        from pdx.solve.robust import robust_stridge

        rng = np.random.default_rng(0)
        n = 3000
        X = np.column_stack([np.ones(n), rng.normal(size=n), rng.normal(size=n) * 10])
        y = X @ np.array([0.0, 2.0, 0.05]) + 1e-3 * rng.normal(size=n)
        for fit in (
            lambda: stridge(jnp.asarray(X), jnp.asarray(y), alpha=0.01, threshold=1e-5),
            lambda: stridge_qr(jnp.asarray(X), jnp.asarray(y), alpha=0.01, threshold=1e-5),
            lambda: robust_stridge(jnp.asarray(X), jnp.asarray(y), alpha=0.01, threshold=1e-5, n_bootstrap=6)[0],
        ):
            c = np.asarray(fit())
            assert np.abs(c).max() < 10, c
            np.testing.assert_allclose(c[1:], [2.0, 0.05], atol=0.01)
