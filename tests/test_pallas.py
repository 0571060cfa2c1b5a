"""Pallas kernel parity tests.

The suite runs in interpret mode (conftest forces the CPU backend); the
compiled Mosaic path is exercised on the real chip by ``tools/tpu_checks.py``
(parity + timing vs the XLA materialize+GEMM path — numbers in
docs/RESULTS.md) and by ``pdx ks2d-bench --solver pallas``.
"""

import numpy as np
import jax.numpy as jnp

from pdx.ops.pallas.fused_gram import (
    RICH_TERM_NAMES,
    _terms_reference,
    fused_ks_gram,
    fused_ks_gram_reference,
    fused_ks_gram_terms,
)


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

    def test_nondivisible_block_zero_pads_exactly(self):
        """T not divisible by block_t: zero-frame padding is exact (spatial
        stencils only, zero frames contribute zero to every statistic)."""
        rng = np.random.default_rng(1)
        U = jnp.asarray(rng.normal(size=(7, 16, 128)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(7, 16, 128)).astype(np.float32))
        ref = fused_ks_gram_reference(U, Ut, 1.0, 1.0)
        got = fused_ks_gram(U, Ut, dx=1.0, dy=1.0, block_t=4, interpret=True)
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(g, r, rtol=2e-4, atol=1e-4 * max(np.abs(r).max(), 1.0))

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


class TestFullFieldGridPath:
    def test_bench_pallas_solver_recovers_ks(self):
        """ks2d-bench --solver pallas (full-field streaming Gram grid): the
        clean quick benchmark recovers (-1, -1, -0.5). Runs the kernel in
        interpret mode on CPU via the same pipeline entry the TPU uses."""
        from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run

        cfg = Ks2dBenchConfig(
            grid_search=True, dtype="float32", Nx=32, Ny=32, n_seconds=0.2,
            solver="pallas",
        )
        res = run(cfg)
        worst = max(v["rel_err_pct"] for v in res["gt_errors"].values())
        assert worst < 1.0, res["gt_errors"]

    def test_bench_pallas_rich_dictionary_recovers_ks(self):
        """ks2d-bench --dictionary rich --solver pallas: the generic
        streaming kernel sweeps the full field with the 9-term library and
        still recovers the true support + coefficients."""
        from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run

        cfg = Ks2dBenchConfig(
            grid_search=True, dictionary="rich", Nx=32, Ny=32, n_seconds=0.2,
            solver="pallas", dtype="float32",
        )
        res = run(cfg)
        worst = max(v["rel_err_pct"] for v in res["gt_errors"].values())
        assert worst < 2.0, res["gt_errors"]

    def test_pallas_solver_requires_finite_derivatives(self):
        import pytest

        from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run

        cfg = Ks2dBenchConfig(
            grid_search=True, derivatives="spectral", Nx=32, Ny=32,
            n_seconds=0.2, solver="pallas", dtype="float32",
        )
        with pytest.raises(ValueError, match="finite"):
            run(cfg)


class TestFusedGramTerms:
    def test_rich_matches_reference_interpret(self):
        rng = np.random.default_rng(3)
        U = jnp.asarray(rng.normal(size=(8, 32, 128)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(8, 32, 128)).astype(np.float32))
        ref = _terms_reference(U, Ut, 0.5, 0.25, RICH_TERM_NAMES)
        got = fused_ks_gram_terms(
            U, Ut, dx=0.5, dy=0.25, names=RICH_TERM_NAMES, block_t=4, interpret=True
        )
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(g, r, rtol=3e-4, atol=2e-4 * max(np.abs(r).max(), 1.0))

    def test_padding_with_one_term_is_exact(self):
        """T not divisible by block_t AND 'one' in the term list: the
        constant field does not vanish on padded frames — the closed-form
        correction must make the stats exact."""
        rng = np.random.default_rng(4)
        U = jnp.asarray(rng.normal(size=(7, 16, 128)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(7, 16, 128)).astype(np.float32))
        ref = _terms_reference(U, Ut, 1.0, 1.0, RICH_TERM_NAMES)
        got = fused_ks_gram_terms(
            U, Ut, dx=1.0, dy=1.0, names=RICH_TERM_NAMES, block_t=4, interpret=True
        )
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(g, r, rtol=3e-4, atol=2e-4 * max(np.abs(r).max(), 1.0))

    def test_advection_subset(self):
        names = ("lap", "bih", "gradsq", "ux", "uy")
        rng = np.random.default_rng(5)
        U = jnp.asarray(rng.normal(size=(6, 16, 128)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(6, 16, 128)).astype(np.float32))
        ref = _terms_reference(U, Ut, 0.5, 0.5, names)
        got = fused_ks_gram_terms(
            U, Ut, dx=0.5, dy=0.5, names=names, block_t=3, interpret=True
        )
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(g, r, rtol=3e-4, atol=2e-4 * max(np.abs(r).max(), 1.0))


class TestFusedBlockwise:
    def _compare(self, T, H, W, bt, bx, by, seed=0):
        from pdx.ops.pallas.fused_blockwise import (
            fused_blockwise_gram,
            fused_blockwise_gram_reference,
        )

        rng = np.random.default_rng(seed)
        U = jnp.asarray(rng.normal(size=(T, H, W)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(T, H, W)).astype(np.float32))
        ref = fused_blockwise_gram_reference(U, Ut, 0.5, 0.25, block_t=bt, block_x=bx, block_y=by)
        got = fused_blockwise_gram(
            U, Ut, dx=0.5, dy=0.25, block_t=bt, block_x=bx, block_y=by, interpret=True
        )
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(
                g, r, rtol=2e-4, atol=1e-4 * max(np.abs(r).max(), 1.0), err_msg=k
            )

    def test_matches_reference_interpret(self):
        self._compare(T=9, H=32, W=128, bt=3, bx=8, by=8)

    def test_ragged_tails_all_axes(self):
        """T, H, W all non-divisible: separable valid-count normalization
        must match build_blockwise_dataset's min() slicing on every axis."""
        self._compare(T=8, H=30, W=126, bt=3, bx=8, by=8, seed=1)

    def test_stridge_on_kernel_stats_recovers_planted(self):
        from pdx.solve.stridge import stridge_from_stats
        from pdx.ops.pallas.fused_gram import _ks_terms_2d
        from pdx.ops.pallas.fused_blockwise import fused_blockwise_gram

        rng = np.random.default_rng(2)
        U = jnp.asarray(rng.normal(size=(12, 32, 128)).astype(np.float32))
        lap, bih, gsq = _ks_terms_2d(U, 0.5, 0.5)
        Ut = -1.0 * lap - 0.5 * gsq
        stats = fused_blockwise_gram(U, Ut, dx=0.5, dy=0.5, block_t=3, block_x=8, block_y=8, interpret=True)
        res = stridge_from_stats(stats, alpha=1e-8, threshold=1e-3)
        np.testing.assert_allclose(np.asarray(res.coeffs), [-1.0, 0.0, -0.5], atol=2e-3)


class TestFusedBlockwiseTerms:
    def _compare(self, names, T, H, W, bt, bx, by, seed=0):
        from pdx.ops.pallas.fused_blockwise import (
            fused_blockwise_gram_terms,
            fused_blockwise_gram_terms_reference,
        )

        rng = np.random.default_rng(seed)
        U = jnp.asarray(rng.normal(size=(T, H, W)).astype(np.float32))
        Ut = jnp.asarray(rng.normal(size=(T, H, W)).astype(np.float32))
        ref = fused_blockwise_gram_terms_reference(
            U, Ut, 0.5, 0.25, names=names, block_t=bt, block_x=bx, block_y=by
        )
        got = fused_blockwise_gram_terms(
            U, Ut, dx=0.5, dy=0.25, names=names, block_t=bt, block_x=bx,
            block_y=by, interpret=True,
        )
        for k in ("G", "b", "sx", "syy", "sy", "n"):
            r, g = np.asarray(ref[k]), np.asarray(got[k])
            np.testing.assert_allclose(
                g, r, rtol=3e-4, atol=2e-4 * max(np.abs(r).max(), 1.0), err_msg=k
            )

    def test_rich_matches_reference(self):
        self._compare(RICH_TERM_NAMES, T=9, H=32, W=128, bt=3, bx=8, by=8)

    def test_ragged_tail_with_one_term(self):
        """T not divisible by block_t AND 'one' in the list: the constant
        field must be masked off the padded frames (block mean of ones stays
        exactly 1 on ragged temporal tails)."""
        self._compare(RICH_TERM_NAMES, T=8, H=30, W=126, bt=3, bx=8, by=8, seed=1)

    def test_bench_blockwise_rich_pallas_recovers(self):
        from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run

        cfg = Ks2dBenchConfig(
            grid_search=True, dictionary="rich", method="blockwise",
            Nx=32, Ny=32, n_seconds=0.2, solver="pallas", dtype="float32",
        )
        res = run(cfg)
        worst = max(v["rel_err_pct"] for v in res["gt_errors"].values())
        assert worst < 2.0, res["gt_errors"]
