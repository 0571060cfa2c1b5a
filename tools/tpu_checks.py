"""On-chip checks that the CPU-pinned test suite cannot run.

Usage: python tools/tpu_checks.py   (requires a real TPU device)

1. Compiled (non-interpret) Mosaic run of the fused dictionary+Gram kernel,
   parity vs the XLA materialize+GEMM reference.
2. Honest wall-clock comparison of the two paths: K iterations chained inside
   one jit with a single device->host read at the end (block_until_ready on
   the axon tunnel returns at enqueue time, not completion — see
   .claude/skills/verify/SKILL.md).
3. ks2d-bench --solver pallas quick run: full-field recovery < 1%.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def parity(T: int = 64, H: int = 100, W: int = 100) -> None:
    from pdx.ops.pallas.fused_gram import fused_ks_gram, fused_ks_gram_reference

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    Ut = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    dx = dy = 0.5
    got = fused_ks_gram(U, Ut, dx=dx, dy=dy, block_t=8, interpret=False)
    ref = jax.jit(lambda U, Ut: fused_ks_gram_reference(U, Ut, dx, dy))(U, Ut)
    scale = float(np.abs(np.asarray(ref["G"])).max())
    for k in ("G", "b", "sx", "sy", "syy", "n"):
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * scale)
    print(f"parity: ok (f32 accumulation-order tolerance, T={T} {H}x{W})")


def timing(T: int = 2000, H: int = 100, W: int = 100, K: int = 50) -> dict[str, float]:
    from pdx.ops.pallas.fused_gram import fused_ks_gram, fused_ks_gram_reference

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    Ut = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    dx = dy = 0.5

    def chain(gram_fn):
        @jax.jit
        def run(U, Ut):
            def body(i, carry):
                out = gram_fn(U + carry, Ut)
                return out["G"][0, 0] * 1e-30

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return run

    results = {}
    for name, fn in [
        ("pallas", chain(lambda U, Ut: fused_ks_gram(U, Ut, dx=dx, dy=dy, block_t=10, interpret=False))),
        ("xla", chain(lambda U, Ut: fused_ks_gram_reference(U, Ut, dx, dy))),
    ]:
        float(fn(U, Ut))  # compile + flip the tunnel to sync dispatch
        t0 = time.perf_counter()
        float(fn(U, Ut))
        per_iter_ms = (time.perf_counter() - t0) / K * 1e3
        results[name] = per_iter_ms
        print(f"{name}: {per_iter_ms:.3f} ms/iter  (T={T}, {H}x{W}, K={K})")
    print(f"speedup pallas vs xla: {results['xla'] / results['pallas']:.2f}x")
    return results


def parity_rich(T: int = 63, H: int = 100, W: int = 100) -> None:
    from pdx.ops.pallas.fused_gram import (
        RICH_TERM_NAMES,
        _terms_reference,
        fused_ks_gram_terms,
    )

    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    Ut = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    dx = dy = 0.5
    got = fused_ks_gram_terms(
        U, Ut, dx=dx, dy=dy, names=RICH_TERM_NAMES, block_t=8, interpret=False
    )
    ref = jax.jit(lambda U, Ut: _terms_reference(U, Ut, dx, dy, RICH_TERM_NAMES))(U, Ut)
    scale = float(np.abs(np.asarray(ref["G"])).max())
    for k in ("G", "b", "sx", "sy", "syy", "n"):
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * scale)
    print(f"parity rich (9-term, ragged T={T}): ok")


def timing_rich(T: int = 2000, H: int = 100, W: int = 100, K: int = 50) -> dict[str, float]:
    from pdx.ops.pallas.fused_gram import (
        RICH_TERM_NAMES,
        _terms_reference,
        fused_ks_gram_terms,
    )

    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    Ut = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    dx = dy = 0.5

    def chain(gram_fn):
        @jax.jit
        def run(U, Ut):
            def body(i, carry):
                out = gram_fn(U + carry, Ut)
                return out["G"][0, 0] * 1e-30

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return run

    results = {}
    for name, fn in [
        ("pallas", chain(lambda U, Ut: fused_ks_gram_terms(
            U, Ut, dx=dx, dy=dy, names=RICH_TERM_NAMES, block_t=10, interpret=False))),
        ("xla", chain(lambda U, Ut: _terms_reference(U, Ut, dx, dy, RICH_TERM_NAMES))),
    ]:
        float(fn(U, Ut))  # compile + flip the tunnel to sync dispatch
        t0 = time.perf_counter()
        float(fn(U, Ut))
        per_iter_ms = (time.perf_counter() - t0) / K * 1e3
        results[name] = per_iter_ms
        print(f"rich {name}: {per_iter_ms:.3f} ms/iter  (T={T}, {H}x{W}, K={K})")
    print(f"rich speedup pallas vs xla: {results['xla'] / results['pallas']:.2f}x")
    return results


def parity_blockwise(T: int = 63, H: int = 100, W: int = 100) -> None:
    from pdx.ops.pallas.fused_blockwise import (
        fused_blockwise_gram,
        fused_blockwise_gram_reference,
    )

    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    Ut = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    dx = dy = 0.5
    kw = dict(block_t=3, block_x=8, block_y=8)
    got = fused_blockwise_gram(U, Ut, dx=dx, dy=dy, interpret=False, **kw)
    ref = jax.jit(
        lambda U, Ut: fused_blockwise_gram_reference(U, Ut, dx, dy, **kw)
    )(U, Ut)
    scale = float(np.abs(np.asarray(ref["G"])).max())
    for k in ("G", "b", "sx", "sy", "syy", "n"):
        a, b = np.asarray(got[k]), np.asarray(ref[k])
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * scale)
    print(f"parity blockwise: ok (ragged T={T}, 3x8x8 blocks, {H}x{W})")


def timing_blockwise(T: int = 2000, H: int = 100, W: int = 100, K: int = 50) -> dict[str, float]:
    from pdx.ops.pallas.fused_blockwise import (
        fused_blockwise_gram,
        fused_blockwise_gram_reference,
    )

    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    Ut = jnp.asarray(rng.normal(size=(T, H, W)), dtype=jnp.float32)
    dx = dy = 0.5
    kw = dict(block_t=3, block_x=8, block_y=8)

    def chain(gram_fn):
        @jax.jit
        def run(U, Ut):
            def body(i, carry):
                out = gram_fn(U + carry, Ut)
                return out["G"][0, 0] * 1e-30

            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return run

    results = {}
    for name, fn in [
        ("pallas", chain(lambda U, Ut: fused_blockwise_gram(U, Ut, dx=dx, dy=dy, interpret=False, **kw))),
        ("xla", chain(lambda U, Ut: fused_blockwise_gram_reference(U, Ut, dx, dy, **kw))),
    ]:
        float(fn(U, Ut))  # compile + flip the tunnel to sync dispatch
        t0 = time.perf_counter()
        float(fn(U, Ut))
        per_iter_ms = (time.perf_counter() - t0) / K * 1e3
        results[name] = per_iter_ms
        print(f"blockwise {name}: {per_iter_ms:.3f} ms/iter  (T={T}, {H}x{W}, K={K})")
    print(f"blockwise speedup pallas vs xla: {results['xla'] / results['pallas']:.2f}x")
    return results


def bench_pallas_solver() -> None:
    from pdx.pipelines.ks2d_bench import Ks2dBenchConfig, run

    cfg = Ks2dBenchConfig(
        grid_search=True, dtype="float32", Nx=48, Ny=48, n_seconds=0.4, solver="pallas"
    )
    res = run(cfg)
    worst = max(v["rel_err_pct"] for v in res["gt_errors"].values())
    assert worst < 1.0, res["gt_errors"]
    print(f"ks2d-bench --solver pallas: worst rel err {worst:.5f}% — ok")


def main() -> None:
    import json
    import sys

    assert jax.default_backend() == "tpu", (
        f"tpu_checks needs a TPU device, got {jax.default_backend()}"
    )
    parity()
    parity_rich()
    parity_blockwise()
    bench_pallas_solver()
    pointwise = timing()
    rich = timing_rich()
    blockwise = timing_blockwise()
    if len(sys.argv) > 1:  # stamped battery artifact
        record = {
            "pointwise_ms_per_iter": pointwise,
            "pointwise_speedup": round(pointwise["xla"] / pointwise["pallas"], 2),
            "rich_ms_per_iter": rich,
            "rich_speedup": round(rich["xla"] / rich["pallas"], 2),
            "blockwise_ms_per_iter": blockwise,
            "blockwise_speedup": round(blockwise["xla"] / blockwise["pallas"], 2),
        }
        with open(sys.argv[1], "w") as f:
            json.dump(record, f, indent=2)


if __name__ == "__main__":
    main()
