"""Chip microbenchmark: batched-2D-gather formulations.

flow_bench (battery_20260817T192554Z) showed the batched flat-1D-take
pyramid costing ~3.5-8x the per-pair dispatch chain PER FLOW on a v5e —
i.e. the "fast path" flat gather is still far off the unbatched
`f[..., ix, iy]` advanced-index gather the single-pair program uses. This
tool times every candidate batched formulation of the two gather shapes the
Farnebäck pyramid actually executes, so ops/interp.py can be rewired to the
measured winner:

shape A — expansion fetch: operand (B, 5, H, W), per-batch fractional
  coords (B, H, W) -> (B, 5, H, W). Variants:
    a1 flat-1D take, channel-first           (current _gather2d_flat_batch)
    a2 row-fold 2-index: reshape (B*5*H, W), advanced-index [rows, cols]
    a3 channel-last row-take: reshape (B*H*W, 5), take rows (1 idx/pixel)
    a4 per-b unrolled loop of the unbatched fast gather (B gathers in 1 jit)
shape B — flow warp: operand (B, H, W) -> (B, H, W). Variants:
    b1 flat-1D take (current)
    b2 row-fold 2-index: reshape (B*H, W)[b*H + ix, iy]
    b4 per-b unrolled loop

Each timing is a chained-iteration loop ending in ONE device->host read
(block_until_ready returns at enqueue on the axon tunnel).

Usage: python tools/gather_bench.py [--out OUT.json]
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    out_path = None
    argv = sys.argv[1:]
    if "--out" in argv:
        out_path = Path(argv[argv.index("--out") + 1])

    import jax
    import jax.numpy as jnp
    import numpy as np

    import pdx

    if jax.default_backend() not in ("cpu",):
        pdx.enable_compilation_cache()

    from pdx.ops.interp import _reflect101_index

    B, H, W = 8, 512, 640
    rng = np.random.default_rng(0)
    f5 = jnp.asarray(rng.normal(size=(B, 5, H, W)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(B, H, W)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, H - 1, size=(B, H, W)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, W - 1, size=(B, H, W)), jnp.float32)

    def corners(xq, yq, n, m):
        x0 = jnp.floor(xq)
        y0 = jnp.floor(yq)
        xa = _reflect101_index(x0.astype(jnp.int32), n)
        ya = _reflect101_index(y0.astype(jnp.int32), m)
        return xa, ya

    # ---- shape A variants: ONE corner gather (the bilinear op does 4; the
    # relative cost is what matters) -----------------------------------
    def a1(f, xa, ya):
        Bb, C, Hh, Ww = f.shape
        base = (
            jnp.arange(Bb, dtype=jnp.int32)[:, None, None, None] * (C * Hh * Ww)
            + jnp.arange(C, dtype=jnp.int32)[None, :, None, None] * (Hh * Ww)
        )
        idx = base + (xa[:, None] * Ww + ya[:, None])
        return jnp.take(f.reshape(-1), idx.reshape(-1)).reshape(idx.shape)

    def a2(f, xa, ya):
        Bb, C, Hh, Ww = f.shape
        rows = (
            jnp.arange(Bb, dtype=jnp.int32)[:, None, None, None] * C
            + jnp.arange(C, dtype=jnp.int32)[None, :, None, None]
        ) * Hh + xa[:, None]
        return f.reshape(Bb * C * Hh, Ww)[rows, ya[:, None]]

    def a3(f, xa, ya):
        Bb, C, Hh, Ww = f.shape
        fc = jnp.moveaxis(f, 1, -1).reshape(Bb * Hh * Ww, C)
        idx = (jnp.arange(Bb, dtype=jnp.int32)[:, None, None] * Hh + xa) * Ww + ya
        return jnp.moveaxis(jnp.take(fc, idx, axis=0), -1, 1)

    def a3cl(f_cl, xa, ya):
        # operand ALREADY channel-last (B, H, W, C): no transpose in the op
        Bb, Hh, Ww, C = f_cl.shape
        idx = (jnp.arange(Bb, dtype=jnp.int32)[:, None, None] * Hh + xa) * Ww + ya
        return jnp.take(f_cl.reshape(Bb * Hh * Ww, C), idx, axis=0)

    def a4(f, xa, ya):
        return jnp.stack(
            [f[b][:, xa[b], ya[b]] for b in range(f.shape[0])], axis=0
        )

    # ---- shape B variants ---------------------------------------------
    def b1(f, xa, ya):
        Bb, Hh, Ww = f.shape
        idx = jnp.arange(Bb, dtype=jnp.int32)[:, None, None] * (Hh * Ww) + xa * Ww + ya
        return jnp.take(f.reshape(-1), idx.reshape(-1)).reshape(xa.shape)

    def b2(f, xa, ya):
        Bb, Hh, Ww = f.shape
        rows = jnp.arange(Bb, dtype=jnp.int32)[:, None, None] * Hh + xa
        return f.reshape(Bb * Hh, Ww)[rows, ya]

    def b4(f, xa, ya):
        return jnp.stack([f[b][xa[b], ya[b]] for b in range(f.shape[0])], axis=0)

    results: dict = {"backend": jax.default_backend(), "shape": f"B={B} {H}x{W}"}

    def flush() -> None:
        if out_path:
            out_path.write_text(json.dumps(results, indent=2))

    def timed(label, gather, f, chan_last=False, iters=20):
        xa0, ya0 = corners(x, y, H, W)

        @jax.jit
        def loop(f, xa, ya):
            def body(c, _):
                # re-index from the carry so iterations chain (no DCE/overlap)
                xi = (xa + c.astype(jnp.int32)) % (H - 1)
                out = gather(f, xi, ya)
                return jnp.mean(out), None

            c0 = jnp.float32(0)
            c, _ = jax.lax.scan(body, c0, None, length=iters)
            return c

        float(loop(f, xa0, ya0))  # compile
        t0 = time.perf_counter()
        float(loop(f, xa0, ya0))
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[label] = round(ms, 3)
        print(f"{label}: {ms:.3f} ms/gather", flush=True)
        flush()

    timed("a1_flat_take_ms", a1, f5)
    timed("a2_rowfold_2idx_ms", a2, f5)
    timed("a3_chanlast_rowtake_ms", a3, f5)
    f5cl = jnp.moveaxis(f5, 1, -1)
    timed("a3cl_pretransposed_ms", a3cl, f5cl, chan_last=True)
    timed("a4_unrolled_loop_ms", a4, f5)
    timed("b1_flat_take_ms", b1, f1)
    timed("b2_rowfold_2idx_ms", b2, f1)
    timed("b4_unrolled_loop_ms", b4, f1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
