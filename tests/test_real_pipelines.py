"""Real-image pipeline tests on synthetic TIFF stacks (no real data ships).

The synthetic sequence is a diffusing anisotropic Gaussian blob with weak
advection — smooth dynamics a PDE fit can actually capture — written as
real .tif files so the host IO path is exercised end-to-end.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from pdx.io_host.images import load_images, list_image_resolutions


def make_synthetic_stack(T=24, N=220, D=2.0, vx=0.3, vy=-0.2, seed=0):
    """Diffusion + drift evolution of a smooth random field (periodic FFT)."""
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    u0 = gaussian_filter(rng.normal(size=(N, N)), 8, mode="wrap")
    u0 = (u0 - u0.min()) / (u0.max() - u0.min())
    kx = 2 * np.pi * np.fft.fftfreq(N)
    KX, KY = np.meshgrid(kx, kx, indexing="ij")
    K2 = KX**2 + KY**2
    F0 = np.fft.fft2(u0)
    frames = []
    for t in range(T):
        phase = np.exp(-D * K2 * t - 1j * (KX * vx + KY * vy) * t)
        frames.append(np.fft.ifft2(F0 * phase).real)
    U = np.stack(frames)
    U = (U - U.min()) / (U.max() - U.min())
    return (U * 60000).astype(np.uint16)


@pytest.fixture(scope="module")
def tiff_dir(tmp_path_factory):
    PIL = pytest.importorskip("PIL.Image")
    d = tmp_path_factory.mktemp("synth_tiffs")
    U = make_synthetic_stack()
    for i, frame in enumerate(U):
        PIL.fromarray(frame).save(d / f"frame_{i:03d}.tif")
    return d


class TestImageIO:
    def test_load_images(self, tiff_dir):
        U = load_images(tiff_dir, max_images=10)
        assert U.shape == (10, 220, 220)
        assert U.dtype == np.float32
        assert U.max() > 1000  # uint16 range preserved

    def test_resolution_audit(self, tiff_dir):
        hist = list_image_resolutions(tiff_dir)
        assert hist == {(220, 220): 24}

    def test_missing_folder_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_images(tmp_path / "nope")

    def test_stack_cache_roundtrip_and_invalidation(self, tiff_dir, tmp_path, monkeypatch):
        """Cache hit returns the decoded stack bit-for-bit; touching a frame
        invalidates the entry (key covers per-file size+mtime_ns)."""
        from pdx.io_host.images import clear_stack_memcache, flush_stack_cache_writes

        monkeypatch.setenv("PDX_STACK_CACHE_DIR", str(tmp_path / "stacks"))
        clear_stack_memcache()
        cold = load_images(tiff_dir, max_images=6, cache=True)
        flush_stack_cache_writes()
        assert len(list((tmp_path / "stacks").glob("*.npy"))) == 1
        warm = load_images(tiff_dir, max_images=6, cache=True)
        np.testing.assert_array_equal(cold, warm)
        ref = load_images(tiff_dir, max_images=6, cache=False)
        np.testing.assert_array_equal(warm, ref)
        # invalidation: bump one frame's mtime -> new key, second entry
        import os as _os

        f = sorted(tiff_dir.glob("*.tif"))[0]
        _os.utime(f, ns=(f.stat().st_atime_ns, f.stat().st_mtime_ns + 10_000_000))
        load_images(tiff_dir, max_images=6, cache=True)
        flush_stack_cache_writes()
        assert len(list((tmp_path / "stacks").glob("*.npy"))) == 2

    def test_integer_dtype_request_is_a_safe_hint(self, tmp_path):
        """dtype=np.uint16 ships raw camera bytes when the source really is
        u8/u16 — but a float source must fall back to float32 instead of
        silently truncating/wrapping through the C cast."""
        PIL = pytest.importorskip("PIL.Image")
        d = tmp_path / "float_tiffs"
        d.mkdir()
        rng = np.random.default_rng(0)
        F = (rng.random((3, 16, 16)) * 2.0 - 0.5).astype(np.float32)
        for i, frame in enumerate(F):
            PIL.fromarray(frame).save(d / f"f_{i}.tif")
        U = load_images(d, dtype=np.uint16, cache=False)
        assert U.dtype == np.float32
        np.testing.assert_array_equal(U, F)

    def test_integer_hint_honored_for_integer_source(self, tiff_dir):
        U = load_images(tiff_dir, max_images=4, dtype=np.uint16, cache=False)
        assert U.dtype == np.uint16

    def test_npy_fallback_integer_hint(self, tmp_path):
        F = np.linspace(-1.0, 1.0, 3 * 4 * 4, dtype=np.float64).reshape(3, 4, 4)
        np.save(tmp_path / "stack.npy", F)
        U = load_images(tmp_path, dtype=np.uint16)
        assert U.dtype == np.float32
        np.testing.assert_allclose(U, F.astype(np.float32))

    def test_disk_hit_without_memcache_is_writable(
        self, tiff_dir, tmp_path, monkeypatch
    ):
        """PDX_STACK_MEMCACHE=0 is the writable-result escape hatch; the
        disk-cache hit must not hand back a read-only memmap."""
        from pdx.io_host.images import clear_stack_memcache

        monkeypatch.setenv("PDX_STACK_CACHE_DIR", str(tmp_path / "stacks"))
        monkeypatch.setenv("PDX_STACK_MEMCACHE", "0")
        clear_stack_memcache()
        cold = load_images(tiff_dir, max_images=4, cache=True)
        assert cold.flags.writeable
        warm = load_images(tiff_dir, max_images=4, cache=True)
        assert warm.flags.writeable
        warm[0, 0, 0] = 0  # must not raise

    def test_fast_tiff_decoder_parity(self, tiff_dir):
        """The raw-TIFF fast path decodes bit-identically to the cv2/PIL
        path in both modes (16-bit unchanged + cv2's >>8 grayscale_u8)."""
        from pdx.io_host.images import _fast_tiff_gray

        f = sorted(tiff_dir.glob("*.tif"))[0]
        fast = _fast_tiff_gray(f)
        assert fast is not None and fast.dtype == np.uint16
        try:
            import cv2
        except Exception:
            from PIL import Image

            ref = np.asarray(Image.open(f))
        else:
            ref = cv2.imread(str(f), cv2.IMREAD_UNCHANGED)
            u8 = cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
            np.testing.assert_array_equal((fast >> 8).astype(np.uint8), u8)
        np.testing.assert_array_equal(fast, ref)
        # non-TIFF bytes fall through to None (caller uses cv2/PIL)
        bad = f.parent / "notatiff.tif"
        bad.write_bytes(b"NOPE" * 4)
        assert _fast_tiff_gray(bad) is None
        bad.unlink()

    def test_stack_cache_levels(self, tiff_dir, tmp_path, monkeypatch):
        """In-process hits alias one read-only array; a fresh process
        (cleared memcache) gets the identical stack back memory-mapped from
        the disk entry (deferred streaming, no eager copy)."""
        from pdx.io_host.images import clear_stack_memcache, flush_stack_cache_writes

        monkeypatch.setenv("PDX_STACK_CACHE_DIR", str(tmp_path / "stacks"))
        clear_stack_memcache()
        cold = load_images(tiff_dir, max_images=6, cache=True)
        assert cold.dtype == np.float32
        # read-only publish: mutating a cached stack must fail loudly
        with pytest.raises(ValueError):
            cold[0, 0, 0] = 0.0
        # memory-level hit: the SAME array object, no decode, no disk read
        assert load_images(tiff_dir, max_images=6, cache=True) is cold
        # one disk entry (written on a background thread), requested dtype
        flush_stack_cache_writes()
        (entry,) = (tmp_path / "stacks").glob("*.npy")
        assert np.load(entry).dtype == np.float32
        # cross-process warm (memcache gone): mmap-backed, read-only, exact
        clear_stack_memcache()
        warm = load_images(tiff_dir, max_images=6, cache=True)
        assert warm is not cold and warm.dtype == np.float32
        assert isinstance(warm, np.memmap) and not warm.flags.writeable
        np.testing.assert_array_equal(np.asarray(warm), cold)
        clear_stack_memcache()


class TestAnalyzePipeline:
    @pytest.fixture(scope="class")
    def result(self, tiff_dir, tmp_path_factory):
        from pdx.pipelines.analyze import AnalyzeConfig, run

        out_dir = tmp_path_factory.mktemp("analyze_out")
        cfg = AnalyzeConfig(
            data_dir=str(tiff_dir),
            output_dir=str(out_dir),
            max_images=24,
            registration=False,  # keep the smoke test fast; registration is
            # covered by test_register.py and the dedicated test below
            skip=10,
            subsample=4,
            rollout_steps=(1, 2, 3),
        )
        return cfg, run(cfg), out_dir

    def test_all_models_fit(self, result):
        _cfg, out, _dir = result
        assert len(out["results"]) == 6
        # smooth diffusive dynamics: the richest model should track u_t well
        # (selection may prefer a lower-R2 model with stabler rollouts — that
        # is the intended multi-objective behavior)
        assert max(r["r2"] for r in out["results"]) > 0.5, [r["r2"] for r in out["results"]]

    def test_artifact_contract(self, result):
        _cfg, out, out_dir = result
        best = json.loads((out_dir / "best_model.json").read_text())
        for key in (
            "name", "r2", "rmse", "nrmse", "corr", "one_step_rmse", "equation",
            "terms", "coeffs", "spatial_holdout", "rollout_time_test",
        ):
            assert key in best, key
        assert best["rollout_time_test"]["steps"] == [1, 2, 3]
        comp = json.loads((out_dir / "models_comparison.json").read_text())
        assert len(comp["models"]) == 6
        assert comp["best_overall"]["name"] == out["best_overall"]["name"]
        # display names use the reference's strings
        assert "lap(u)" in comp["models"][0]["terms"]

    def test_comparative_figure_suites(self, result, tiff_dir):
        """Asset-for-asset coverage of the reference's richer generators:
        25 comparative + finalclass + presentation PNGs from the artifact
        contract (+ raw images for fig1-3)."""
        from pdx.report.comparative import (
            create_comparative_final_figures,
            create_finalclass_figures,
            generate_presentation_figures,
        )

        _cfg, _out, out_dir = result
        comp = create_comparative_final_figures(out_dir)
        names = {p.name for p in comp}
        for expect in (
            "PRES1_MODELS_HEATMAP_WIDE.png", "PRES4_M3_VS_M4_DUMBBELL_WIDE.png",
            "PAPER1_SCORE_STACKED_BARS_WIDE.png", "PAPER3_COEFF_HEATMAP_WIDE.png",
            "MINI1_RANK_BARS_WIDE.png", "TRADEOFF_FIT_VS_STABILITY_SCATTER.png",
            "FIG2_ROLLOUT_VS_HORIZON_ALL_MODELS.png", "FIG1_ALT_COMPACT_HEATMAP.png",
            "FIG3_STABILIZATION_EFFECT.png", "FIG3B_METRIC_DISENTANGLEMENT.png",
        ):
            assert expect in names, expect
        assert len(comp) == 24  # 25 minus PAPER5 (needs the patch CSV)

        final = create_finalclass_figures(out_dir)
        fnames = {p.name for p in final}
        assert "FINAL1_PIPELINE_BARS.png" in fnames
        assert "FINAL2_MODEL3_VS_MODEL4_DASH.png" in fnames
        assert "FINAL3_COEFFS_COMPARISON.png" in fnames

        pres = generate_presentation_figures(out_dir, tiff_dir)
        pnames = {p.name for p in pres}
        for expect in (
            "fig1_data_overview.png", "fig2_motion_comparison.png",
            "fig3_velocity_field.png", "fig4_method_comparison.png",
            "fig5_pde_coefficients.png", "fig6_physics_schematic.png",
        ):
            assert expect in pnames, expect
        # every asset is a real PNG
        for p in list(comp) + list(final) + list(pres):
            assert p.stat().st_size > 1000, p

    def test_baseline_best_model_written(self, result):
        _cfg, _out, out_dir = result
        base = json.loads((out_dir / "best_model_baseline.json").read_text())
        assert base["selection"] == "best_test_by_r2_only"
        assert "rollout_time_test" in base and "coeffs" in base

    def test_fig4_snapshots_written(self, result):
        """FIG4 qualitative rollout panels (analyze_results.py:1104-1230)."""
        _cfg, _out, out_dir = result
        figs = sorted(p.name for p in out_dir.glob("FIG4*"))
        assert any(n.startswith("FIG4_QUAL_ROLLOUT_K") for n in figs), figs
        assert any(n.startswith("FIG4B_ERROR_GROWTH_PLUS_MAP_K") for n in figs), figs

    def test_models_1_and_2_identical_quirk(self, result):
        _cfg, out, _dir = result
        r1, r2 = out["results"][0], out["results"][1]
        np.testing.assert_allclose(r1["coeffs"], r2["coeffs"], rtol=1e-10)

    def test_spatial_holdout_structure(self, result):
        _cfg, out, _dir = result
        sh = out["spatial_holdout"]
        assert sh["space_split"] == "left_right"
        assert "one_step_rmse" in sh["test"]

    def test_with_registration_smoke(self, tiff_dir, tmp_path):
        from pdx.pipelines.analyze import AnalyzeConfig, run

        cfg = AnalyzeConfig(
            data_dir=str(tiff_dir),
            output_dir=str(tmp_path),
            max_images=6,
            registration=True,
            skip=10,
            subsample=4,
            rollout_steps=(1,),
        )
        out = run(cfg)
        assert np.isfinite(out["best_overall"]["r2"])

    def test_register_refine_plumbing(self, tiff_dir):
        """register_refine reaches the flow kernel: refine=0 (strict
        cv2-equivalent) and refine=2 must register differently, and the
        config default (1) must reproduce an explicit refine=1 exactly."""
        from pdx.pipelines.analyze import AnalyzeConfig, preprocess
        from pdx.io_host.images import load_images

        U_raw = np.asarray(load_images(tiff_dir, max_images=5, mode="grayscale_u8"))
        base = dict(data_dir="unused", max_images=5, registration=True,
                    register_mode="chain", skip=10, subsample=4)
        u_default = preprocess(AnalyzeConfig(**base), U_raw)
        u_r1 = preprocess(AnalyzeConfig(**base, register_refine=1), U_raw)
        u_r0 = preprocess(AnalyzeConfig(**base, register_refine=0), U_raw)
        np.testing.assert_array_equal(np.asarray(u_default), np.asarray(u_r1))
        assert not np.array_equal(np.asarray(u_r0), np.asarray(u_r1))


class TestPatchDiscovery:
    def test_pipeline_and_artifacts(self, tiff_dir, tmp_path):
        from pdx.pipelines.patch_discovery import PatchDiscoveryConfig, run

        cfg = PatchDiscoveryConfig(
            data_dir=str(tiff_dir),
            output_dir=str(tmp_path),
            max_images=24,
            registration=False,
            skip=10,
            subsample=4,
            patch=11,
            overlap=5,
            samples_per_patch=60,
            rt=1,
            rs=2,
            deg=2,
        )
        out = run(cfg)
        assert out["n_patches"] >= 4
        assert np.isfinite(out["global_test_metrics"]["r2"])
        csv = (tmp_path / "PATCH_PDE_COEFFS.csv").read_text()
        assert csv.startswith("term,median,q25,q75,nonzero_freq,sign_stability,agg_coeff")
        assert "lap(u)" in csv
        report = (tmp_path / "PATCH_PDE_REPORT.txt").read_text()
        assert "Aggregated PDE:" in report
        # the summary figure (patch_based_pde_discovery.py:564-565)
        assert (tmp_path / "PATCH_PDE_SUMMARY.png").stat().st_size > 10_000

    def test_localpoly_matches_reference_lstsq(self):
        """Batched extraction operator == per-point lstsq (oracle parity)."""
        from pdx.library.localpoly import local_poly_derivatives_batch, poly3d_exponents

        rng = np.random.default_rng(3)
        U = rng.normal(size=(9, 20, 22))
        rt, rs, deg = 2, 3, 3
        dt, dx, dy = 1.0, 0.1, 0.1
        pts = np.array([[3, 5, 7], [4, 10, 12], [6, 8, 15]])
        got = np.asarray(
            local_poly_derivatives_batch(jnp.asarray(U), pts, rt=rt, rs=rs, deg=deg, dt=dt, dx=dx, dy=dy)
        )
        # oracle: reference per-point lstsq
        exps = poly3d_exponents(deg)
        for row, (t0, y0, x0) in zip(got, pts):
            t_idx = np.arange(t0 - rt, t0 + rt + 1)
            y_idx = np.arange(y0 - rs, y0 + rs + 1)
            x_idx = np.arange(x0 - rs, x0 + rs + 1)
            tt = (t_idx - t0) * dt
            yy = (y_idx - y0) * dy
            xx = (x_idx - x0) * dx
            Tt, Yy, Xx = np.meshgrid(tt, yy, xx, indexing="ij")
            vals = U[np.ix_(t_idx, y_idx, x_idx)]
            A = np.column_stack(
                [(Tt.ravel() ** a) * (Xx.ravel() ** b) * (Yy.ravel() ** c) for a, b, c in exps]
            )
            coef, *_ = np.linalg.lstsq(A, vals.ravel(), rcond=None)

            def g(a, b, c):
                return coef[exps.index((a, b, c))]

            want = [g(0, 0, 0), g(1, 0, 0), g(0, 1, 0), g(0, 0, 1), 2 * g(0, 2, 0), 2 * g(0, 0, 2)]
            np.testing.assert_allclose(row, want, rtol=1e-7, atol=1e-9)


class TestTransport:
    def test_pipeline_runs(self, tiff_dir, tmp_path):
        from pdx.pipelines.transport import TransportConfig, run, mass_conservation_drift

        cfg = TransportConfig(
            data_dir=str(tiff_dir),
            output_dir=str(tmp_path),
            max_images=8,
            downsample=4,
            flow_levels=2,
        )
        out = run(cfg)
        assert out["mean_flow_speed"] >= 0
        assert set(out["results"].keys()) == {0.001, 0.01, 0.1}
        for r in out["results"].values():
            assert np.isfinite(r["r2"])
        res = json.loads((tmp_path / "transport_results.json").read_text())
        assert res["term_names"][0] == "constant"

    def test_mass_conservation_metric(self):
        from pdx.pipelines.transport import mass_conservation_drift

        U = np.ones((5, 4, 4))
        assert mass_conservation_drift(U) < 1e-9


class TestEnvConfig:
    def test_env_overrides(self, monkeypatch):
        from pdx.pipelines.analyze import AnalyzeConfig, config_from_env

        monkeypatch.setenv("PDE_ROLLOUT_STEPS", "2-4")
        monkeypatch.setenv("PDE_STABILIZE_TRANSLATION", "yes")
        monkeypatch.setenv("PDE_STABILIZE_MODE", "to_first")
        monkeypatch.setenv("PDE_STABILIZE_EST_SIGMA", "3.5")
        monkeypatch.setenv("PDE_ROBUST_REGRESSION", "1")
        cfg = config_from_env(AnalyzeConfig())
        assert cfg.rollout_steps == (2, 3, 4)
        assert cfg.stabilize_translation is True
        assert cfg.stabilize_mode == "to_first"
        assert cfg.stabilize_est_sigma == 3.5
        assert cfg.robust_regression is True

    def test_env_list_format(self, monkeypatch):
        from pdx.pipelines.analyze import AnalyzeConfig, config_from_env

        monkeypatch.setenv("PDE_ROLLOUT_STEPS", "1,5,3")
        cfg = config_from_env(AnalyzeConfig())
        assert cfg.rollout_steps == (1, 3, 5)

    def test_robust_regression_path(self, tiff_dir, tmp_path):
        """PDE_ROBUST_REGRESSION path: per-model robust STRidge with the
        bundled rollout curves (analyze_results.py:543-587)."""
        from pdx.pipelines.analyze import AnalyzeConfig, run

        cfg = AnalyzeConfig(
            data_dir=str(tiff_dir), output_dir=str(tmp_path), max_images=10,
            registration=False, skip=10, subsample=6, rollout_steps=(1, 2),
            robust_regression=True, write_artifacts=False,
        )
        out = run(cfg)
        assert len(out["results"]) == 6
        for r in out["results"]:
            assert np.isfinite(r["r2"])
            assert np.isfinite(r["rollout"]["k1_test"]["rmse"])
            assert np.isfinite(r["rollout"]["k2_train"]["nrmse"])
