"""Native C++ host-ops library: build + cross-implementation parity
(C++ vs JAX vs scipy — three independent implementations agreeing)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pdx import native


pytestmark = pytest.mark.skipif(not native.available(), reason="g++ build unavailable")


class TestNativeOps:
    def test_shift_periodic_matches_jax(self):
        from pdx.ops.interp import shift_periodic as jshift

        rng = np.random.default_rng(0)
        f = rng.normal(size=(24, 31))
        got = native.shift_periodic(f, 1.3, -0.7)
        want = np.asarray(jshift(jnp.asarray(f), 1.3, -0.7))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_shift_reflect_matches_jax(self):
        from pdx.ops.interp import shift_reflect as jshift

        rng = np.random.default_rng(1)
        f = rng.normal(size=(17, 23))
        got = native.shift_reflect(f, -2.6, 3.2)
        want = np.asarray(jshift(jnp.asarray(f), -2.6, 3.2))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_gaussian_matches_scipy(self):
        from scipy.ndimage import gaussian_filter

        rng = np.random.default_rng(2)
        f = rng.normal(size=(30, 28))
        for sigma in (0.8, 1.5):
            got = native.gaussian_blur_reflect(f, sigma)
            want = gaussian_filter(f, sigma)
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_blockwise_matches_jax(self):
        from pdx.library.blockwise import build_blockwise_dataset

        rng = np.random.default_rng(3)
        y = rng.normal(size=(7, 10, 12))
        terms = rng.normal(size=(4, 7, 10, 12))
        Xn, yn = native.blockwise_mean(y, terms, 3, 4, 5)
        Xj, yj = build_blockwise_dataset(jnp.asarray(y), jnp.asarray(terms), block_t=3, block_x=4, block_y=5)
        np.testing.assert_allclose(Xn, np.asarray(Xj), rtol=1e-12)
        np.testing.assert_allclose(yn, np.asarray(yj), rtol=1e-12)

    def test_stridge_matches_oracle_and_jax(self):
        import oracle
        from pdx.solve.stridge import stridge as jstridge

        rng = np.random.default_rng(4)
        X = rng.normal(size=(500, 6)) * rng.uniform(0.5, 2.0, 6)
        true = np.array([1.5, 0, -2.0, 0, 0.7, 0])
        y = X @ true + 0.01 * rng.normal(size=500)
        for alpha, thr in ((1e-3, 0.05), (1e-6, 1e-8)):
            got = native.stridge(X, y, alpha=alpha, threshold=thr)
            want = oracle.stridge(X, y, alpha=alpha, threshold=thr)
            np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
            jgot = np.asarray(jstridge(jnp.asarray(X), jnp.asarray(y), alpha=alpha, threshold=thr))
            np.testing.assert_allclose(got, jgot, rtol=1e-7, atol=1e-9)
