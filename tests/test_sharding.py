"""Multi-device tests on the 8-way virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdx.ops.linalg import gram_stats
from pdx.shard.mesh import make_mesh, sharded_gram_stats, shard_batch
from pdx.solve.stridge import stridge_from_stats


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


class TestShardedGram:
    def test_matches_single_device(self, mesh):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.normal(size=(1024, 7)))
        y = jnp.asarray(rng.normal(size=1024))
        want = gram_stats(X, y)
        Xs = shard_batch(X, mesh)
        ys = shard_batch(y, mesh)
        got = sharded_gram_stats(Xs, ys, mesh)
        for k in ("G", "b", "sx", "n", "syy", "sy"):
            np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]), rtol=1e-10)

    def test_stridge_on_sharded_stats(self, mesh):
        rng = np.random.default_rng(1)
        p = 6
        X = jnp.asarray(rng.normal(size=(2048, p)))
        true = np.zeros(p)
        true[[1, 4]] = [2.0, -1.5]
        y = X @ jnp.asarray(true)
        got = stridge_from_stats(
            sharded_gram_stats(shard_batch(X, mesh), shard_batch(y, mesh), mesh),
            alpha=1e-8,
            threshold=1e-3,
        )
        np.testing.assert_allclose(np.asarray(got.coeffs), true, atol=1e-6)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_dryrun_multichip(self):
        import sys, pathlib

        sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestPipelineMesh:
    def test_ks2d_bench_sharded_gram(self):
        """ks2d pipeline with mesh='on' on the 8-device virtual mesh: the
        sample-sharded psum Gram path must reproduce the single-device fit."""
        from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run

        common = dict(Nx=32, Ny=32, n_seconds=0.1, dt=1e-3, n_sample=5_000,
                      alpha=1e-6, threshold=1e-10, solver="gram")
        r_single = run(Ks2dBenchConfig(**common, mesh="off"))
        r_mesh = run(Ks2dBenchConfig(**common, mesh="on"))
        # zero-weight padding makes the sharded statistics exact
        np.testing.assert_allclose(r_mesh["coeffs"], r_single["coeffs"], rtol=1e-9, atol=1e-12)
        for k in r_single["gt_errors"]:
            assert r_mesh["gt_errors"][k]["rel_err_pct"] < 1.0

    def test_patch_discovery_sharded_matches_single(self, tmp_path):
        """patch axis sharded over the 8-device virtual mesh: coefficients
        must be identical to the single-device run (padding is sliced off)."""
        from tests.test_real_pipelines import make_synthetic_stack
        from pdx.pipelines.patch_discovery import PatchDiscoveryConfig, run

        U = make_synthetic_stack(T=16, N=120)
        common = dict(
            data_dir="unused", registration=False, downsample=1, skip=6,
            subsample=2, patch=15, overlap=7, rs=2, rt=1,
            samples_per_patch=60, write_artifacts=False,
        )
        r_off = run(PatchDiscoveryConfig(**common, mesh="off"), U_raw=U)
        r_on = run(PatchDiscoveryConfig(**common, mesh="on"), U_raw=U)
        np.testing.assert_allclose(
            r_on["patch_coeffs"], r_off["patch_coeffs"], rtol=1e-10, atol=1e-13
        )
        np.testing.assert_allclose(
            r_on["stats"]["coeffs"], r_off["stats"]["coeffs"], rtol=1e-10, atol=1e-13
        )
        # placement, not just values: mesh='on' must actually partition the
        # patch-fit result over every virtual device (XLA gathering the vmap
        # onto one device would still pass the value checks above)
        assert r_on["n_shard_devices"] == len(jax.devices())
        assert r_off["n_shard_devices"] == 1

    def test_patch_sindy_sharded_matches_single(self, tmp_path):
        from tests.test_real_pipelines import make_synthetic_stack
        from pdx.pipelines.patch_sindy import PatchSindyConfig, run

        U = make_synthetic_stack(T=12, N=96).astype(np.float64) / 60000.0
        common = dict(
            data_dir="unused", patch_size=40, overlap=10, skip_boundary=2,
            subsample=2, min_patches=2, write_artifacts=False,
        )
        r_off = run(PatchSindyConfig(**common, mesh="off"), U_raw=U)
        r_on = run(PatchSindyConfig(**common, mesh="on"), U_raw=U)
        # sharded layouts change f64 reduction order inside the per-patch
        # solve; agreement is to accumulation noise, not bitwise
        np.testing.assert_allclose(
            r_on["patch_coeffs"], r_off["patch_coeffs"], rtol=1e-7, atol=1e-9
        )
        np.testing.assert_allclose(r_on["coeffs"], r_off["coeffs"], rtol=1e-7, atol=1e-9)
        assert r_on["n_shard_devices"] == len(jax.devices())
        assert r_off["n_shard_devices"] == 1
