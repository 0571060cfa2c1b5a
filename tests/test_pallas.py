"""Pallas kernel parity tests (interpret mode on CPU; compiled path exercised
on TPU by bench/verify flows)."""

import numpy as np
import jax.numpy as jnp

from pdx.ops.pallas.fused_gram import fused_ks_gram, fused_ks_gram_reference


class TestFusedGram:
    def test_matches_reference_interpret(self):
        rng = np.random.default_rng(0)
        U = jnp.asarray(rng.normal(size=(8, 32, 128)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(8, 32, 128)).astype(np.float32))
        ref = fused_ks_gram_reference(U, Ut, 0.5, 0.25)
        got = fused_ks_gram(U, Ut, dx=0.5, dy=0.25, block_t=4, interpret=True)
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(g, r, rtol=2e-4, atol=1e-4 * np.abs(r).max())

    def test_nondivisible_block_falls_back(self):
        rng = np.random.default_rng(1)
        U = jnp.asarray(rng.normal(size=(7, 16, 128)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(7, 16, 128)).astype(np.float32))
        ref = fused_ks_gram_reference(U, Ut, 1.0, 1.0)
        got = fused_ks_gram(U, Ut, dx=1.0, dy=1.0, block_t=4, interpret=True)
        np.testing.assert_allclose(np.asarray(got["G"]), np.asarray(ref["G"]), rtol=1e-5)

    def test_stridge_on_kernel_stats(self):
        """End-to-end: kernel stats feed the masked STRidge and recover a
        planted sparse combination."""
        from pdx.solve.stridge import stridge_from_stats
        from pdx.ops.pallas.fused_gram import _ks_terms_2d

        rng = np.random.default_rng(2)
        U = jnp.asarray(rng.normal(size=(8, 32, 128)).astype(np.float32))
        lap, bih, gsq = _ks_terms_2d(U, 0.5, 0.5)
        Ut = -1.0 * lap - 0.5 * gsq  # planted: no biharmonic term
        stats = fused_ks_gram(U, Ut, dx=0.5, dy=0.5, block_t=4, interpret=True)
        res = stridge_from_stats(stats, alpha=1e-6, threshold=1e-3)
        c = np.asarray(res.coeffs)
        np.testing.assert_allclose(c, [-1.0, 0.0, -0.5], atol=2e-3)
