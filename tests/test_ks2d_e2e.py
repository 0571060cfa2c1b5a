"""End-to-end KS-2D benchmark: simulator parity + clean recovery golden test."""

import numpy as np
import jax.numpy as jnp

from pdx.sim.ks2d import Ks2dConfig, simulate_ks2d, simulate_ks2d_spectral
from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run
from pdx.library.dictionaries import build_dictionary_true
from pdx.library.blockwise import build_blockwise_dataset

import oracle

# small-but-real config: 48x48 grid, 400 steps — fast on CPU, same physics
SMALL = dict(Nx=48, Ny=48, n_seconds=0.4, dt=1e-3)


class TestSimulator:
    def test_matches_numpy_reference(self):
        cfg = Ks2dConfig(Nx=32, Ny=32, n_seconds=0.05, dt=1e-3)
        U, dx, dy, DT = simulate_ks2d(cfg)
        U_ref, dx_r, dy_r, DT_r = oracle.simulate_ks2d(
            Nx=32, Ny=32, Lx=50.0, Ly=50.0, dt=1e-3, n_seconds=0.05
        )
        assert (dx, dy, DT) == (dx_r, dy_r, DT_r)
        np.testing.assert_allclose(np.asarray(U), U_ref, rtol=1e-10, atol=1e-13)

    def test_save_every_matches_reference(self):
        cfg = Ks2dConfig(Nx=24, Ny=24, n_seconds=0.06, dt=1e-3, save_every=3)
        U, *_ = simulate_ks2d(cfg)
        U_ref, *_ = oracle.simulate_ks2d(Nx=24, Ny=24, dt=1e-3, n_seconds=0.06, save_every=3)
        assert U.shape == U_ref.shape
        np.testing.assert_allclose(np.asarray(U), U_ref, rtol=1e-10, atol=1e-13)

    def test_spectral_stepper_matches_euler_on_smooth_ic(self):
        """On a smooth (low-k) field the FD and spectral integrators agree to
        ~1e-6 over 200 steps; on noise ICs they differ by FD truncation at
        high k (expected, not asserted)."""
        cfg = Ks2dConfig(Nx=64, Ny=64, n_seconds=0.2, dt=1e-3)
        x = np.linspace(0, 50, 64, endpoint=False)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u0 = 0.1 * np.sin(2 * np.pi * X / 50) * np.cos(2 * np.pi * Y / 50)
        U_e, *_ = simulate_ks2d(cfg, u0=u0)
        U_s, *_ = simulate_ks2d_spectral(cfg, u0=u0)
        assert np.all(np.isfinite(np.asarray(U_s)))
        assert np.abs(np.asarray(U_e[-1]) - np.asarray(U_s[-1])).max() < 1e-4


class TestCleanRecovery:
    def test_pointwise_true_dictionary_exact_recovery(self):
        """The M1 acceptance test: clean KS, pointwise, true dictionary ->
        coefficients (-1, -1, -0.5) with ~0% error and R^2 ~ 1
        (reference README.md:37)."""
        cfg = Ks2dBenchConfig(**SMALL, n_sample=20_000, alpha=1e-6, threshold=1e-10)
        res = run(cfg)
        assert res["names"] == ["lap", "bih", "gradsq"]
        for key, want in (("lap", -1.0), ("bih", -1.0), ("gradsq", -0.5)):
            assert res["gt_errors"][key]["rel_err_pct"] < 0.5, res["gt_errors"]
        assert res["fit"]["test_r2"] > 0.999
        assert res["rollout"]["mean"] < 1e-2

    def test_grid_search_matches_fixed_best(self):
        cfg = Ks2dBenchConfig(**SMALL, n_sample=10_000, grid_search=True)
        res = run(cfg)
        assert res["grid_best"]["r2_test"] > 0.999
        for key in ("lap", "bih", "gradsq"):
            assert res["gt_errors"][key]["rel_err_pct"] < 1.0

    def test_blockwise_matches_oracle_dataset(self):
        cfg = Ks2dConfig(Nx=24, Ny=24, n_seconds=0.05, dt=1e-3)
        U, dx, dy, DT = simulate_ks2d(cfg)
        Ut = (U[1:] - U[:-1]) / DT
        names, terms = build_dictionary_true(U[:-1], dx, dy)
        X, y = build_blockwise_dataset(Ut, terms, block_t=3, block_x=8, block_y=8)
        # oracle on numpy
        terms_np = {n: np.asarray(terms[i]) for i, n in enumerate(names)}
        X_ref, y_ref = oracle.blockwise_dataset(
            np.asarray(Ut), terms_np, names, block_t=3, block_x=8, block_y=8
        )
        np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-10)

    def test_blockwise_ragged_blocks_match_oracle(self):
        cfg = Ks2dConfig(Nx=26, Ny=22, n_seconds=0.05, dt=1e-3)
        U, dx, dy, DT = simulate_ks2d(cfg)
        Ut = (U[1:] - U[:-1]) / DT
        names, terms = build_dictionary_true(U[:-1], dx, dy)
        X, y = build_blockwise_dataset(Ut, terms, block_t=7, block_x=8, block_y=5)
        terms_np = {n: np.asarray(terms[i]) for i, n in enumerate(names)}
        X_ref, y_ref = oracle.blockwise_dataset(
            np.asarray(Ut), terms_np, names, block_t=7, block_x=8, block_y=5
        )
        np.testing.assert_allclose(np.asarray(X), X_ref, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-10)

    def test_blockwise_noisy_recovery_beats_pointwise(self):
        """Blockwise averaging beats pointwise under 5% noise on the lap
        coefficient (the 8x-improvement headline, reference README.md:41;
        docs/RESULTS.md:34-39: pointwise 42.3% vs blockwise 5.1%). Full
        reference scale (100x100, 2000 frames). Measured here: pointwise ~50%
        vs blockwise ~0.2%."""
        common = dict(perturbation="N2_noise", noise_rel=0.05, alpha=1e-6, threshold=1e-10)
        res_point = run(Ks2dBenchConfig(**common, method="pointwise"))
        res_block = run(Ks2dBenchConfig(**common, method="blockwise"))
        err_point = res_point["gt_errors"]["lap"]["rel_err_pct"]
        err_block = res_block["gt_errors"]["lap"]["rel_err_pct"]
        assert err_point > 20.0  # pointwise degrades badly under noise
        assert err_block < 5.0  # blockwise matches/beats the reference table
        assert err_block * 8 < err_point  # at least the 8x headline

    def test_weakform_golden_parity(self):
        """Golden-value parity with the reference script at this exact config:
        `python scripts/ks2d_stridge_benchmark.py --Nx 48 --Ny 48
        --n-seconds 0.4 --method weakform --weak-basis fourier --alpha 1e-6
        --threshold 1e-10` prints est = (-1.009053, -1.097355, -0.138060)
        (captured 2026-08-16; the residual error vs gt is inherent to the
        weak-form method at this resolution, faithfully reproduced)."""
        cfg = Ks2dBenchConfig(**SMALL, method="weakform", weak_basis="fourier",
                              n_sample=50_000, alpha=1e-6, threshold=1e-10)
        res = run(cfg)
        golden = {"lap": -1.009053, "bih": -1.097355, "gradsq": -0.138060}
        for key, want in golden.items():
            assert abs(res["gt_errors"][key]["est"] - want) < 1e-5, res["gt_errors"]

    def test_weakform_gaussian_golden_parity(self):
        """Same as above with the localized-Gaussian basis (reference default):
        exercises the default_rng(123) center draws and spectral lap/bih of
        phi. Reference prints est = (-1.078219, -2.242636, -0.152420)."""
        cfg = Ks2dBenchConfig(**SMALL, method="weakform", weak_basis="gaussian",
                              n_sample=50_000, alpha=1e-6, threshold=1e-10)
        res = run(cfg)
        golden = {"lap": -1.078219, "bih": -2.242636, "gradsq": -0.152420}
        for key, want in golden.items():
            assert abs(res["gt_errors"][key]["est"] - want) < 1e-5, res["gt_errors"]


class TestWeakformRich:
    def test_rich_weakform_recovers_true_terms(self):
        """pdx extension: weak form over the RICH dictionary (the reference
        only supports the true terms) — decoys built by integration by parts.
        On clean data the true terms should dominate with decoys near zero."""
        cfg = Ks2dBenchConfig(**SMALL, method="weakform", weak_basis="fourier",
                              dictionary="rich", n_sample=50_000,
                              alpha=1e-6, threshold=1e-3)
        res = run(cfg)
        assert res["names"] == ["one", "u", "u2", "ux", "uy", "lap", "bih", "gradsq", "u_lap"]
        # The dominant linear terms are identifiable; |grad u|^2 vs u*lap(u)
        # are strongly collinear in weak space at this resolution (the TRUE
        # dictionary's weak form already shows 72% gradsq error here), so
        # only the well-posed terms are asserted.
        assert res["gt_errors"]["lap"]["rel_err_pct"] < 5.0, res["gt_errors"]
        assert res["gt_errors"]["bih"]["rel_err_pct"] < 20.0, res["gt_errors"]
        coeffs = dict(zip(res["names"], res["coeffs"]))
        for decoy in ("one", "u", "ux", "uy"):
            assert abs(coeffs[decoy]) < 0.1, coeffs
        assert res["fit"]["test_r2"] > 0.9

    def test_rich_weakform_gaussian_basis(self):
        cfg = Ks2dBenchConfig(**SMALL, method="weakform", weak_basis="gaussian",
                              dictionary="rich", n_sample=50_000,
                              alpha=1e-6, threshold=1e-3)
        res = run(cfg)
        assert np.isfinite(res["fit"]["test_r2"])
        assert res["gt_errors"]["lap"]["rel_err_pct"] < 25.0, res["gt_errors"]

    def test_fd_operator_exact_recovery_clean(self):
        """operator='fd' (discrete-adjoint stencil columns): with save_every=1
        the weak identity holds exactly per Euler substep, so the 9-term rich
        dictionary recovers the KS support and coefficients to solver
        precision on clean data — impossible for the spectral quadrature
        (quadrature/discretization mismatch) and for the reference (which
        cannot fit decoys at all, ks2d_stridge_benchmark.py:1473-1474)."""
        cfg = Ks2dBenchConfig(**SMALL, method="weakform", weak_basis="gaussian",
                              dictionary="rich", weak_operator="fd",
                              n_sample=50_000, alpha=1e-8, threshold=1e-5)
        res = run(cfg)
        for key in ("lap", "bih", "gradsq"):
            assert res["gt_errors"][key]["rel_err_pct"] < 0.01, res["gt_errors"]
        coeffs = dict(zip(res["names"], res["coeffs"]))
        for decoy in ("one", "u", "u2", "ux", "uy", "u_lap"):
            assert abs(coeffs[decoy]) < 1e-4, coeffs

    def test_fd_operator_noisy_support_recovery(self):
        """Full-scale N2 regime (3% noise, 200 frames at save_every=10): the
        fd-operator rich weak form keeps every coefficient within a few
        percent of truth (lap/bih ~0.2-3%, gradsq ~20-40% depending on the
        row subsample) while the reference-parity spectral true-dictionary
        run shows 83% gradsq error at the identical config
        (docs/RESULTS.md table)."""
        cfg = Ks2dBenchConfig(method="weakform", weak_basis="gaussian",
                              dictionary="rich", weak_operator="fd",
                              perturbation="N2_noise", weak_n_phi=256,
                              save_every=10, n_sample=100_000,
                              alpha=1e-6, threshold=1e-4)
        res = run(cfg)
        assert res["gt_errors"]["lap"]["rel_err_pct"] < 5.0, res["gt_errors"]
        assert res["gt_errors"]["bih"]["rel_err_pct"] < 6.0, res["gt_errors"]
        assert res["gt_errors"]["gradsq"]["rel_err_pct"] < 45.0, res["gt_errors"]


class TestConfigPaths:
    """Smoke coverage for the less-traveled config combinations."""

    def test_stabilize_plus_sign_constraints_blockwise(self):
        cfg = Ks2dBenchConfig(
            Nx=32, Ny=32, n_seconds=0.2, dt=1e-3,
            perturbation="N5_shifts_noise", shift_mode="jitter", shift_max=1.0,
            stabilize_shifts=True, method="blockwise",
            regression="sign_constrained", sign_constraints=(-1, -1, -1),
        )
        res = run(cfg)
        # sign constraints: no positive coefficients survive
        assert all(c <= 0 for c in res["coeffs"]), res["coeffs"]
        assert np.isfinite(res["rollout"]["mean"])

    def test_correct_shift_ut_path(self):
        cfg = Ks2dBenchConfig(
            Nx=32, Ny=32, n_seconds=0.2, dt=1e-3,
            perturbation="N1_shifts", shift_mode="jitter", shift_max=0.8,
            correct_shift_ut=True,
        )
        res = run(cfg)
        assert np.isfinite(res["fit"]["test_r2"])

    def test_weak_motion_correct_path(self):
        cfg = Ks2dBenchConfig(
            Nx=32, Ny=32, n_seconds=0.2, dt=1e-3,
            perturbation="N1_shifts", shift_mode="jitter", shift_max=0.8,
            method="weakform", weak_basis="fourier", weak_motion_correct=True,
        )
        res = run(cfg)
        assert np.isfinite(res["fit"]["test_r2"])

    def test_denoise_paths(self):
        for kwargs in (
            dict(denoise_time_window=3),
            dict(denoise_space_sigma=1.0),
            dict(denoise_space_sigma=1.0, denoise_space_on="all"),
        ):
            cfg = Ks2dBenchConfig(Nx=32, Ny=32, n_seconds=0.1, dt=1e-3,
                                  perturbation="N2_noise", noise_rel=0.02, **kwargs)
            res = run(cfg)
            assert np.isfinite(res["fit"]["test_r2"]), kwargs

    def test_huber_trimmed_ensemble_regressions(self):
        for reg in ("huber", "trimmed", "ensemble"):
            cfg = Ks2dBenchConfig(Nx=24, Ny=24, n_seconds=0.1, dt=1e-3,
                                  n_sample=3_000, regression=reg, n_bootstrap=5,
                                  alpha=1e-6, threshold=1e-6)
            res = run(cfg)
            assert res["gt_errors"]["lap"]["rel_err_pct"] < 10.0, (reg, res["gt_errors"])

    def test_robust_pipeline_config(self):
        cfg = Ks2dBenchConfig(Nx=24, Ny=24, n_seconds=0.1, dt=1e-3,
                              n_sample=3_000, robust=True, n_bootstrap=5,
                              sign_constraints=(-1, -1, -1),
                              alpha=1e-6, threshold=1e-6)
        res = run(cfg)
        assert res["gt_errors"]["lap"]["rel_err_pct"] < 10.0, res["gt_errors"]


class TestFusedPathEquality:
    def test_fused_grid_matches_slow_path(self):
        """The one-dispatch fused grid benchmark must select identical
        hyperparameters and coefficients as the stage-by-stage path."""
        import dataclasses as dc

        cfg = Ks2dBenchConfig(Nx=32, Ny=32, n_seconds=0.2, dt=1e-3,
                              n_sample=8_000, grid_search=True, solver="gram")
        res_fast = run(cfg)
        # force the slow path by breaking a fast-path condition that does not
        # change the math (correct_shift_ut=False is required; use regression
        # dispatch via grid_search with robust=False but method untouched:
        # easiest is calling the internal slow branch through a non-default
        # solver toggle that keeps Gram semantics)
        res_slow = run(dc.replace(cfg, correct_shift_ut=True, perturbation="none"))
        # correct_shift_ut with no shifts estimates ~zero velocities; allow
        # tiny drift from the correction term
        assert res_slow["grid_best"]["alpha"] == res_fast["grid_best"]["alpha"]
        assert res_slow["grid_best"]["threshold"] == res_fast["grid_best"]["threshold"]
        np.testing.assert_allclose(res_fast["coeffs"], res_slow["coeffs"], rtol=5e-3)
