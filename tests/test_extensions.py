"""Tests: 4th-order extended library, adaptive denoise, Poisson diagnostic,
resolution-audit CLI."""

import numpy as np
import jax.numpy as jnp
import pytest

from pdx.library.dictionaries import FOURTH_ORDER_TERMS, fourth_order_term_fields
from pdx.preprocess import preprocess_adaptive, poisson_noise_check


class TestFourthOrderLibrary:
    def test_term_count_and_names(self):
        assert len(FOURTH_ORDER_TERMS) == 25
        rng = np.random.default_rng(0)
        U = jnp.asarray(rng.normal(size=(3, 20, 22)))
        fields = fourth_order_term_fields(U, 0.1, 0.1)
        for n in FOURTH_ORDER_TERMS:
            assert fields[n].shape == U.shape, n

    def test_fourth_order_accuracy_on_sinusoid(self):
        """4th-order stencils should beat 2nd-order on smooth fields."""
        n, L = 64, 10.0
        x = np.linspace(0, L, n, endpoint=False)
        X, Y = np.meshgrid(x, x, indexing="ij")
        k = 2 * np.pi / L
        f = np.sin(3 * k * Y)  # varies along cols = the 'x' convention
        d = L / n
        fields = fourth_order_term_fields(jnp.asarray(f), d, d)
        exact = 3 * k * np.cos(3 * k * Y)
        interior = (slice(8, -8), slice(8, -8))
        err4 = np.abs(np.asarray(fields["ux"])[interior] - exact[interior]).max()
        # 2nd-order central for comparison
        ux2 = (np.roll(f, -1, 1) - np.roll(f, 1, 1)) / (2 * d)
        err2 = np.abs(ux2[interior] - exact[interior]).max()
        assert err4 < err2 / 20

    def test_analyze_model7(self, tmp_path):
        from test_real_pipelines import make_synthetic_stack
        from pdx.pipelines.analyze import AnalyzeConfig, run

        PIL = pytest.importorskip("PIL.Image")
        d = tmp_path / "tifs"
        d.mkdir()
        for i, frame in enumerate(make_synthetic_stack(T=14)):
            PIL.fromarray(frame).save(d / f"f_{i:03d}.tif")
        cfg = AnalyzeConfig(
            data_dir=str(d), output_dir=str(tmp_path / "out"), max_images=14,
            registration=False, skip=10, subsample=4, rollout_steps=(1, 2),
            include_fourth_order=True,
        )
        out = run(cfg)
        assert len(out["results"]) == 7
        m7 = out["results"][-1]
        assert m7["n_total"] == 25
        assert np.isfinite(m7["r2"])
        assert np.isfinite(m7["rollout"]["k2_test"]["rmse"])


class TestAdaptiveDenoise:
    def test_reduces_noise(self):
        """Temporal Savitzky-Golay assumes temporally smooth dynamics — test
        data must evolve smoothly in time (a slowly translating field)."""
        rng = np.random.default_rng(0)
        from scipy.ndimage import gaussian_filter, shift as ndshift

        base = gaussian_filter(rng.normal(size=(32, 32)), 4, mode="wrap")
        base = base / base.std()  # the reference TV step assumes O(1) amplitude
        clean = np.stack([ndshift(base, (0.3 * t, -0.2 * t), mode="wrap") for t in range(12)])
        noisy = clean + 0.5 * clean.std() * rng.normal(size=clean.shape)
        for level in (0.05, 0.3, 0.8):
            out = np.asarray(preprocess_adaptive(jnp.asarray(noisy), "gaussian", level))
            assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean(), level

    def test_impulse_path(self):
        rng = np.random.default_rng(1)
        clean = np.ones((8, 16, 16)) * 0.5
        noisy = clean.copy()
        mask = rng.random(clean.shape) < 0.05
        noisy[mask] = rng.choice([0.0, 1.0], size=mask.sum())
        out = np.asarray(preprocess_adaptive(jnp.asarray(noisy), "salt_pepper", 0.05))
        assert np.abs(out - clean).mean() < 0.2 * np.abs(noisy - clean).mean()


class TestPoissonCheck:
    def test_distinguishes_noise_models(self):
        rng = np.random.default_rng(2)
        base = rng.uniform(50, 500, size=(48, 48))
        # Poisson: variance ~ mean
        poisson = rng.poisson(base, size=(60, 48, 48)).astype(float)
        # Gaussian: constant variance
        gauss = base[None] + rng.normal(0, 5.0, size=(60, 48, 48))
        r_p = poisson_noise_check(jnp.asarray(poisson))
        r_g = poisson_noise_check(jnp.asarray(gauss))
        assert 0.7 < float(r_p["slope"]) < 1.3, float(r_p["slope"])
        assert abs(float(r_g["slope"])) < 0.1, float(r_g["slope"])


class TestResolutionCLI:
    def test_cli(self, tmp_path, capsys):
        PIL = pytest.importorskip("PIL.Image")
        for i in range(3):
            PIL.fromarray(np.zeros((10, 12), dtype=np.uint8)).save(tmp_path / f"a{i}.tif")
        from pdx.__main__ import cmd_list_resolutions

        rc = cmd_list_resolutions(["--data-dir", str(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "10 x 12: 3 files" in out

    def test_cli_empty(self, tmp_path, capsys):
        from pdx.__main__ import cmd_list_resolutions

        rc = cmd_list_resolutions(["--data-dir", str(tmp_path)])
        assert rc == 1


class TestProfiling:
    def test_stage_timer(self, tmp_path):
        import time as _time

        from pdx.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("a"):
            _time.sleep(0.01)
        with t.stage("b"):
            _time.sleep(0.005)
        rep = t.report()
        assert "a" in rep and "b" in rep and "total" in rep
        assert t.stages["a"] >= 0.01
        t.dump(tmp_path / "prof.json")
        import json as _json

        assert "a" in _json.loads((tmp_path / "prof.json").read_text())
