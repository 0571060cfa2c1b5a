"""Registration stack tests: phase correlation, Farnebäck, DIS, ECC — on
synthetic fields with known ground-truth motion, cross-checked vs cv2."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter, shift as ndshift

from pdx.register import (
    phase_correlate,
    estimate_shift_phasecorr,
    stabilize_translation_sequence,
    estimate_interframe_shifts,
    farneback_flow,
    farneback_register_sequence,
    dis_flow,
    ecc_align,
    ecc_warp,
    registration_improvement,
)
from pdx.ops.interp import shift_periodic


def smooth_field(n=96, sigma=5, seed=0):
    rng = np.random.default_rng(seed)
    f = gaussian_filter(rng.normal(size=(n, n)), sigma, mode="wrap")
    return (f - f.min()) / (f.max() - f.min())


class TestPhaseCorr:
    def test_integer_shift_periodic(self):
        base = smooth_field()
        mov = np.roll(np.roll(base, 3, 0), -2, 1)
        dr, dc = phase_correlate(jnp.asarray(base), jnp.asarray(mov))
        assert abs(float(dr) - 3) < 0.05
        assert abs(float(dc) + 2) < 0.05

    def test_subpixel_shift(self):
        """Subpixel accuracy on a very smooth field is ~0.3 px for the
        weighted-centroid refinement (cv2.phaseCorrelate shows 0.24 px error
        on this exact case — broad correlation peak, inherent)."""
        base = smooth_field(seed=1)
        mov = np.asarray(shift_periodic(jnp.asarray(base), 1.4, -0.6))
        dr, dc = phase_correlate(jnp.asarray(base), jnp.asarray(mov))
        assert abs(float(dr) - 1.4) < 0.45
        assert abs(float(dc) + 0.6) < 0.45

    def test_matches_cv2_sign_convention(self):
        cv2 = pytest.importorskip("cv2")
        base = smooth_field(seed=2).astype(np.float32)
        mov = np.asarray(shift_periodic(jnp.asarray(base, jnp.float64), 2.0, 1.0)).astype(np.float32)
        (cx, cy), _resp = cv2.phaseCorrelate(base, mov)
        dr, dc = phase_correlate(jnp.asarray(base, jnp.float64), jnp.asarray(mov, jnp.float64))
        # cv2 returns (dx=col, dy=row)
        assert abs(float(dr) - cy) < 0.1
        assert abs(float(dc) - cx) < 0.1

    def test_estimate_shift_aligns(self):
        base = smooth_field(seed=3)
        mov = np.asarray(shift_periodic(jnp.asarray(base), 2.5, -1.5))
        sx, sy = estimate_shift_phasecorr(jnp.asarray(base), jnp.asarray(mov))
        aligned = np.asarray(shift_periodic(jnp.asarray(mov), sx, sy))
        # residual ~0.3 px of subpixel error remains on very smooth fields
        assert np.sqrt(np.mean((aligned - base) ** 2)) < 0.15 * np.sqrt(np.mean((np.asarray(mov) - base) ** 2))

    def test_stabilize_sequence_jitter(self):
        base = smooth_field(seed=4)
        rng = np.random.default_rng(0)
        T = 6
        U = [base]
        for _ in range(T - 1):
            s = rng.uniform(-2, 2, 2)
            U.append(np.asarray(shift_periodic(jnp.asarray(base), s[0], s[1])))
        U = jnp.asarray(np.stack(U))
        for mode in ("to_first", "to_prev"):
            out = stabilize_translation_sequence(U, mode=mode)
            resid = np.sqrt(np.mean((np.asarray(out) - base[None]) ** 2, axis=(1, 2)))
            resid_before = np.sqrt(np.mean((np.asarray(U) - base[None]) ** 2))
            assert resid.max() < 0.35 * resid_before, (mode, resid, resid_before)

    def test_interframe_shifts_batched(self):
        base = smooth_field(seed=5)
        shifts = [(0.0, 0.0), (1.0, -0.5), (2.0, 0.5)]
        U = jnp.asarray(np.stack([np.asarray(shift_periodic(jnp.asarray(base), s[0], s[1])) for s in shifts]))
        sx, sy = estimate_interframe_shifts(U)
        # shift to apply to frame t+1 to align to t = -(step shift);
        # ~0.25 px subpixel error on smooth fields (same as cv2)
        np.testing.assert_allclose(np.asarray(sx), [-1.0, -1.0], atol=0.3)
        np.testing.assert_allclose(np.asarray(sy), [0.5, -1.0], atol=0.3)


class TestFarneback:
    def test_translation_direction_and_magnitude(self):
        base = smooth_field(n=120, sigma=6, seed=6)
        s = (2.0, -1.2)
        mov = ndshift(base, s, mode="reflect")
        fr, fc = farneback_flow(jnp.asarray(base), jnp.asarray(mov))
        m = slice(30, -30)
        est = (float(np.median(np.asarray(fr)[m, m])), float(np.median(np.asarray(fc)[m, m])))
        # with re-warp refinement (default refine=2) recovery reaches ~0.99x
        # (cv2's expansion-fetch scheme plateaus at ~0.9x)
        assert est[0] / s[0] > 0.9 and est[0] / s[0] < 1.1
        assert est[1] / s[1] > 0.9 and est[1] / s[1] < 1.1

    def test_register_sequence_reduces_motion(self):
        base = smooth_field(n=96, sigma=6, seed=7)
        rng = np.random.default_rng(1)
        U = [base]
        for t in range(4):
            s = rng.uniform(-1.5, 1.5, 2)
            U.append(ndshift(base, s, mode="reflect"))
        U = jnp.asarray(np.stack(U))
        out = farneback_register_sequence(U)
        resid_before = np.sqrt(np.mean((np.asarray(U[1:]) - base[None]) ** 2))
        resid_after = np.sqrt(np.mean((np.asarray(out[1:]) - base[None]) ** 2))
        # Farnebäck's ~0.8x magnitude bias caps single-pass improvement
        assert resid_after < 0.75 * resid_before

    def test_compose_flow_chain_sums_constant_shifts(self):
        """Backward-map composition of constant translations is their
        cumulative sum (f_t(id + F) = f_t for constant fields)."""
        from pdx.register.farneback import compose_flow_chain

        steps = np.array([[0.5, -0.25], [1.0, 0.75], [-0.5, 0.5]])
        fx = jnp.asarray(np.broadcast_to(steps[:, 0, None, None], (3, 16, 16)).copy())
        fy = jnp.asarray(np.broadcast_to(steps[:, 1, None, None], (3, 16, 16)).copy())
        Fx, Fy = compose_flow_chain(fx, fy)
        cum = np.cumsum(steps, axis=0)
        m = slice(4, -4)  # reflect-border folding touches the rim only
        for t in range(3):
            np.testing.assert_allclose(np.asarray(Fx)[t][m, m], cum[t, 0], atol=1e-6)
            np.testing.assert_allclose(np.asarray(Fy)[t][m, m], cum[t, 1], atol=1e-6)
        # batched variant agrees with per-chain application
        Fxb, Fyb = compose_flow_chain(
            jnp.stack([fx, fx * 0.5]), jnp.stack([fy, fy * 0.5]), batched=True
        )
        np.testing.assert_allclose(np.asarray(Fxb)[0], np.asarray(Fx), atol=1e-6)

    def test_banded_sep_matches_shift(self, monkeypatch):
        """PDX_SEP_IMPL=banded lowers every separable pass (poly expansion,
        window blur, bilinear resize) as banded-matrix matmuls — the MXU
        path used on accelerators. Same linear maps as the shifted-add
        lowering, so outputs must agree to summation-reassociation noise."""
        import jax as _jax
        from pdx.ops.interp import resize_bilinear
        from pdx.register.farneback import farneback_flow

        a = smooth_field(n=40, sigma=4, seed=31)
        b = ndshift(a, (0.7, -1.2), mode="reflect")
        A, B = jnp.asarray(a), jnp.asarray(b)
        kw = dict(levels=2, winsize=11, iterations=3, poly_n=5,
                  poly_sigma=1.2, gaussian_win=True)
        from pdx.ops.filters import gaussian_filter_reflect

        fx0, fy0 = (np.asarray(v) for v in farneback_flow(A, B, **kw))
        r0 = np.asarray(resize_bilinear(A, 25, 17))
        g0 = np.asarray(gaussian_filter_reflect(A, 1.5))
        monkeypatch.setenv("PDX_SEP_IMPL", "banded")
        _jax.clear_caches()  # jit caches don't key on the env policy
        try:
            fx1, fy1 = (np.asarray(v) for v in farneback_flow(A, B, **kw))
            r1 = np.asarray(resize_bilinear(A, 25, 17))
            g1 = np.asarray(gaussian_filter_reflect(A, 1.5))
        finally:
            _jax.clear_caches()  # don't leak banded programs past the env restore
        np.testing.assert_allclose(r1, r0, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(g1, g0, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(fx1, fx0, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(fy1, fy0, rtol=1e-5, atol=1e-7)

    def test_chain_scan_matches_steps(self):
        """chain_impl='scan' (whole chain as ONE lax.scan program — a single
        tunnel dispatch instead of T-1) must reproduce the per-step host
        loop: identical math, different execution schedule."""
        base = smooth_field(n=64, sigma=5, seed=11)
        rng = np.random.default_rng(12)
        U = [base]
        for _ in range(4):
            U.append(ndshift(base, rng.uniform(-1.5, 1.5, 2), mode="reflect"))
        U = jnp.asarray(np.stack(U))
        steps = farneback_register_sequence(U)
        scan = farneback_register_sequence(U, chain_impl="scan")
        np.testing.assert_allclose(
            np.asarray(scan), np.asarray(steps), rtol=1e-6, atol=1e-9
        )

    def test_chain_half_res_flow_quality(self):
        """flow_ds=2 (the accelerator chain policy: per-step flow computed on
        2x-downsampled frames, upsampled before smooth+warp) must keep
        residual motion within a few % of the full-res chain on synthetic
        jitter. Measured it is BETTER (0.0039 vs 0.0056 vs 0.0204
        unregistered): the coarse flow is less magnitude-biased and the
        upsample smooths estimation noise."""
        base = smooth_field(n=128, sigma=8, seed=7)
        rng = np.random.default_rng(1)
        U = [base]
        for _ in range(4):
            U.append(ndshift(base, rng.uniform(-1.5, 1.5, 2), mode="reflect"))
        U = jnp.asarray(np.stack(U))
        resid = lambda out: np.sqrt(np.mean((np.asarray(out[1:]) - base[None]) ** 2))
        full = resid(farneback_register_sequence(U, flow_ds=1))
        half = resid(farneback_register_sequence(U, flow_ds=2))
        assert half <= full * 1.2, (half, full)
        assert half < 0.4 * resid(U)

    def test_chain_flow_ds_clamps_small_frames(self):
        """The ds policy never lets the chain flow grid drop below 64 px."""
        from pdx.register.farneback import _chain_flow_ds

        assert _chain_flow_ds(2, 512, 640) == 2
        assert _chain_flow_ds(2, 96, 96) == 1
        assert _chain_flow_ds(4, 512, 640) == 4
        assert _chain_flow_ds(4, 256, 320) == 4  # 256//4 = 64, at the floor
        assert _chain_flow_ds(4, 200, 320) == 2
        assert _chain_flow_ds(None, 512, 640) == 1  # CPU backend in tests

    def test_compose_mode_matches_or_beats_chain_on_drift(self):
        """VERDICT r3 task 2 acceptance: the batched compose registration must
        keep residual-motion improvement within a few % of the sequential
        chain on synthetic jitter. On drifting jitter it is measurably BETTER
        (direct alignment to frame 0 vs accumulated incremental warps)."""
        from pdx.register.farneback import farneback_register_sequence_compose

        base = smooth_field(n=96, sigma=6, seed=7)
        rng = np.random.default_rng(1)
        U, s = [base], np.zeros(2)
        for _ in range(6):
            s = s + rng.uniform(-1.0, 1.0, 2)
            U.append(ndshift(base, s, mode="reflect"))
        U = jnp.asarray(np.stack(U))
        resid = lambda out: np.sqrt(np.mean((np.asarray(out[1:]) - base[None]) ** 2))
        before = resid(U)
        chain = resid(farneback_register_sequence(U))
        comp = resid(farneback_register_sequence_compose(U))
        to_first = resid(farneback_register_sequence_compose(U, to_first=True))
        assert comp <= chain * 1.05, (comp, chain)
        assert to_first <= chain * 1.05, (to_first, chain)
        assert comp < 0.8 * before

    def test_reference_compat_sign_worsens(self):
        """warp_sign=-1 reproduces the reference's x - flow map, which
        measurably increases residuals (the documented reference bug)."""
        base = smooth_field(n=96, sigma=6, seed=8)
        mov = ndshift(base, (1.5, 1.0), mode="reflect")
        U = jnp.asarray(np.stack([base, mov]))
        out_fix = farneback_register_sequence(U, warp_sign=1.0)
        out_ref = farneback_register_sequence(U, warp_sign=-1.0)
        r_fix = np.sqrt(np.mean((np.asarray(out_fix[1]) - base) ** 2))
        r_ref = np.sqrt(np.mean((np.asarray(out_ref[1]) - base) ** 2))
        assert r_fix < r_ref


class TestDIS:
    def test_translation(self):
        base = smooth_field(n=96, sigma=5, seed=9)
        s = (1.5, -1.0)
        mov = ndshift(base, s, mode="reflect")
        fr, fc = dis_flow(jnp.asarray(base), jnp.asarray(mov))
        m = slice(24, -24)
        est = (float(np.median(np.asarray(fr)[m, m])), float(np.median(np.asarray(fc)[m, m])))
        assert abs(est[0] - s[0]) < 0.5
        assert abs(est[1] - s[1]) < 0.5


class TestECC:
    def test_translation_recovery(self):
        base = smooth_field(n=64, sigma=4, seed=10)
        mov = ndshift(base, (1.2, -0.8), mode="reflect")
        params, cc = ecc_align(jnp.asarray(base), jnp.asarray(mov), motion="translation")
        # template(x) ~ image(x + t): ecc_warp samples image at x + t; the
        # content moved by s so t should be ~ +s
        np.testing.assert_allclose(np.asarray(params), [1.2, -0.8], atol=0.2)
        aligned = ecc_warp(jnp.asarray(mov), params, motion="translation")
        assert np.sqrt(np.mean((np.asarray(aligned)[8:-8, 8:-8] - base[8:-8, 8:-8]) ** 2)) < 0.01

    def test_divergence_guard_keeps_unregistered_frame(self):
        """Reference parity: cv2.findTransformECC failure falls back to the
        unregistered patch (patch_based_sindy.py:193-196). The LM loop cannot
        raise, so the guard triggers on a sub-threshold correlation
        coefficient — an uncorrelated noise frame must pass through
        untouched."""
        from pdx.register.ecc import ecc_register_sequence

        rng = np.random.default_rng(3)
        base = smooth_field(n=48, sigma=4, seed=13)
        noise = rng.normal(size=(48, 48)).astype(base.dtype)  # cc ~ 0 vs base
        seq = jnp.asarray(np.stack([base, noise]))
        out, ccs = ecc_register_sequence(seq, motion="euclidean", cc_threshold=0.3)
        assert float(ccs[0]) < 0.3
        np.testing.assert_array_equal(np.asarray(out[1]), noise)

    def test_guard_does_not_block_good_alignment(self):
        from pdx.register.ecc import ecc_register_sequence

        base = smooth_field(n=64, sigma=4, seed=10)
        mov = ndshift(base, (1.2, -0.8), mode="reflect")
        seq = jnp.asarray(np.stack([base, mov]))
        out, ccs = ecc_register_sequence(seq, motion="translation", cc_threshold=0.3)
        assert float(ccs[0]) > 0.3
        # registered frame is closer to base than the unregistered one
        before = np.sqrt(np.mean((mov[8:-8, 8:-8] - base[8:-8, 8:-8]) ** 2))
        after = np.sqrt(np.mean((np.asarray(out[1])[8:-8, 8:-8] - base[8:-8, 8:-8]) ** 2))
        assert after < 0.5 * before

    def test_euclidean_rotation_recovery(self):
        cv2 = pytest.importorskip("cv2")
        base = smooth_field(n=80, sigma=4, seed=11).astype(np.float32)
        theta = 0.05
        M = cv2.getRotationMatrix2D((40, 40), -np.degrees(theta), 1.0)
        mov = cv2.warpAffine(base, M, (80, 80), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT_101)
        params, cc = ecc_align(jnp.asarray(base, jnp.float64), jnp.asarray(mov, jnp.float64), motion="euclidean")
        assert float(cc) > 0.95
        aligned = ecc_warp(jnp.asarray(mov, jnp.float64), params)
        m = slice(12, -12)
        before = np.sqrt(np.mean((mov[m, m] - base[m, m]) ** 2))
        after = np.sqrt(np.mean((np.asarray(aligned)[m, m] - base[m, m]) ** 2))
        assert after < 0.4 * before


class TestQuality:
    def test_improvement_metric(self):
        base = smooth_field(n=96, sigma=6, seed=12)
        rng = np.random.default_rng(2)
        U = [base] + [ndshift(base, rng.uniform(-1.5, 1.5, 2), mode="reflect") for _ in range(3)]
        U = jnp.asarray(np.stack(U))
        out = farneback_register_sequence(U)
        res = registration_improvement(U, out)
        assert float(res["improvement_pct"]) > 20.0


class TestBatchedPairFlows:
    def test_pair_batch_matches_sequential(self):
        """farneback_flow_pairs pair_batch=True (one flat-gather program for
        all consecutive pairs) == the legacy per-pair dispatch chain."""
        from pdx.register.farneback import farneback_flow_pairs

        base = smooth_field(n=80, sigma=5, seed=3)
        rng = np.random.default_rng(4)
        U = np.stack([ndshift(base, rng.uniform(-1.0, 1.0, 2), mode="reflect") for _ in range(5)])
        U = jnp.asarray(U)
        kw = dict(levels=3, winsize=15, iterations=4, poly_n=5, poly_sigma=1.2, gaussian_win=False)
        fb_x, fb_y = farneback_flow_pairs(U, pair_batch=True, **kw)
        fs_x, fs_y = farneback_flow_pairs(U, pair_batch=False, **kw)
        np.testing.assert_allclose(np.asarray(fb_x), np.asarray(fs_x), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(fb_y), np.asarray(fs_y), rtol=1e-8, atol=1e-10)

    def test_chunked_matches_single_program(self):
        """batched_pair_flows with a chunk_elems that forces multiple chunks
        (incl. an overlapping ragged tail) == one single-program batch. The
        chunking exists to bound HBM temps on chip (the 1500-pair patch grid
        OOMed a 16 GB v5e as one program, battery_20260817T182926Z)."""
        from pdx.register.farneback import batched_pair_flows

        base = smooth_field(n=48, sigma=4, seed=21)
        rng = np.random.default_rng(22)
        A = np.stack([ndshift(base, rng.uniform(-1, 1, 2), mode="reflect") for _ in range(5)])
        B = np.stack([ndshift(base, rng.uniform(-1, 1, 2), mode="reflect") for _ in range(5)])
        A, B = jnp.asarray(A), jnp.asarray(B)
        fs = (("gaussian_win", False), ("iterations", 3), ("levels", 2),
              ("poly_n", 5), ("poly_sigma", 1.2), ("winsize", 11))
        one_x, one_y = batched_pair_flows(A, B, flow_static=fs, chunk_elems=10**9)
        # chunk=2 -> starts [0, 2, 3]: two full chunks + overlapping tail
        chk_x, chk_y = batched_pair_flows(A, B, flow_static=fs, chunk_elems=2 * 48 * 48)
        np.testing.assert_allclose(np.asarray(chk_x), np.asarray(one_x), rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(chk_y), np.asarray(one_y), rtol=1e-8, atol=1e-12)

    def test_empty_pair_list_returns_empty_flows(self):
        """B=0 (e.g. a single-frame stack through farneback_flow_pairs) must
        return (0,H,W) flows, not crash on the chunk-start arithmetic."""
        from pdx.register.farneback import batched_pair_flows, farneback_flow_pairs

        Z = jnp.zeros((0, 32, 32))
        fx, fy = batched_pair_flows(Z, Z, flow_static=(("levels", 2),))
        assert fx.shape == (0, 32, 32) and fy.shape == (0, 32, 32)
        fx, fy = farneback_flow_pairs(jnp.zeros((1, 32, 32)), levels=2)
        assert fx.shape == (0, 32, 32)

    def test_batched_flow_matches_single(self):
        """farneback_flow(batched=True) over a batch == per-pair single calls
        (the flat-gather formulation changes dispatch, not math)."""
        from pdx.register.farneback import farneback_flow

        base = smooth_field(n=64, sigma=5, seed=7)
        rng = np.random.default_rng(8)
        A = np.stack([ndshift(base, rng.uniform(-1, 1, 2), mode="reflect") for _ in range(3)])
        B = np.stack([ndshift(base, rng.uniform(-1, 1, 2), mode="reflect") for _ in range(3)])
        A, B = jnp.asarray(A), jnp.asarray(B)
        kw = dict(levels=2, winsize=11, iterations=3, poly_n=5, poly_sigma=1.2, gaussian_win=True)
        bx, by = farneback_flow(A, B, batched=True, **kw)
        for i in range(3):
            sx, sy = farneback_flow(A[i], B[i], **kw)
            np.testing.assert_allclose(np.asarray(bx[i]), np.asarray(sx), rtol=1e-8, atol=1e-10)
            np.testing.assert_allclose(np.asarray(by[i]), np.asarray(sy), rtol=1e-8, atol=1e-10)


class TestTVL1:
    def test_translation(self):
        from pdx.register import tvl1_flow

        base = smooth_field(n=96, sigma=5, seed=20)
        s = (1.5, -1.0)
        mov = ndshift(base, s, mode="reflect")
        fr, fc = tvl1_flow(jnp.asarray(base), jnp.asarray(mov))
        m = slice(24, -24)
        est = (float(np.median(np.asarray(fr)[m, m])), float(np.median(np.asarray(fc)[m, m])))
        assert abs(est[0] - s[0]) < 0.4
        assert abs(est[1] - s[1]) < 0.4

    def test_zero_flow_on_identical(self):
        from pdx.register import tvl1_flow

        base = smooth_field(n=64, sigma=5, seed=21)
        fr, fc = tvl1_flow(jnp.asarray(base), jnp.asarray(base))
        assert np.abs(np.asarray(fr)).max() < 0.05
        assert np.abs(np.asarray(fc)).max() < 0.05
