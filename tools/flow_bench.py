"""Chip A/B for the Farnebäck registration formulations.

Decides register_mode / PDX_FLOW_CHUNK_ELEMS defaults from measured data:
the 18:29Z battery showed the one-giant-program batched flows REGRESSING on
chip vs the round-2 sequential dispatch chain (transport 16.7 -> 48.5 s,
patch_discover 19.6 -> 76.7 s warm) and OOMing outright at patch scale
(27.5 GB of HBM temps for 1500 pairs, battery_20260817T182926Z). This tool
times, at the two production shapes:

  * analyze scale — 51 frames 512x640 (50 pairs, the post-downsample
    analyze/patch-discover registration input):
      - chain: farneback_register_sequence (sequential per-frame dispatches,
        the round-2 record holder at ~187 ms/flow)
      - compose: farneback_register_sequence_compose at chunk sizes
        {4, 12, 50} pairs/program
  * patch scale — 256 independent 256x256 pairs (a slice of patch-sindy's
    P*(T-1) flow grid) at chunk sizes {32, 128} (256 deliberately dropped:
    that config crashed the TPU worker — see the NOTE at the sweep loop)

Timing is chained-iteration with ONE device->host read at the end:
``block_until_ready`` returns at enqueue on the axon tunnel and must not be
trusted (see docs/RESULTS.md methodology notes).

Usage: python tools/flow_bench.py [--out OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def _read(x) -> float:
    return float(x.ravel()[0])


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

    from tools.make_synth_stack import make_stack
    from pdx.register.farneback import (
        batched_pair_flows,
        farneback_register_sequence,
        farneback_register_sequence_compose,
    )

    results: dict = {"backend": jax.default_backend()}

    def flush() -> None:
        if out_path:
            out_path.write_text(json.dumps(results, indent=2))

    def timed(label: str, fn, reps: int = 2) -> float:
        """warmup (compile) + best-of-reps, each rep ending in a host read."""
        _read(fn())
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _read(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f} s", flush=True)
        return round(best, 3)

    # ---- analyze scale ------------------------------------------------
    U = jnp.asarray(make_stack(T=51, H=512, W=640), jnp.float32)
    n_pairs = int(U.shape[0]) - 1
    an: dict = {"shape": "51x512x640"}
    results["analyze_scale"] = an

    # ---- single-flow separable-lowering A/B (banded MXU vs shifted-add) --
    from pdx.register.farneback import farneback_flow

    one: dict = {}
    results["single_flow_512x640"] = one
    fkw = dict(levels=3, winsize=15, iterations=5, poly_n=7,
               poly_sigma=1.5, gaussian_win=False, refine=1)
    for impl in ("banded", "shift"):
        os.environ["PDX_SEP_IMPL"] = impl
        jax.clear_caches()  # jit caches don't key on the env policy
        one[f"{impl}_s"] = timed(
            f"single flow {impl}",
            lambda: farneback_flow(U[0], U[1], **fkw)[0],
            reps=3,
        )
        flush()
    os.environ.pop("PDX_SEP_IMPL", None)
    jax.clear_caches()  # back to the backend-default policy for the rest

    an["chain_s"] = timed(
        "chain",
        lambda: farneback_register_sequence(U, chain_impl="steps"),
        reps=1,
    )
    flush()
    an["chain_scan_s"] = timed(
        "chain_scan",
        lambda: farneback_register_sequence(U, chain_impl="scan"),
        reps=1,
    )
    flush()
    for chunk in (2, 4, 12, 50):
        os.environ["PDX_FLOW_CHUNK_ELEMS"] = str(chunk * 512 * 640)
        an[f"compose_chunk{chunk}_s"] = timed(
            f"compose chunk={chunk}",
            lambda: farneback_register_sequence_compose(U),
        )
        flush()
    os.environ.pop("PDX_FLOW_CHUNK_ELEMS", None)

    # ---- patch scale --------------------------------------------------
    rng = np.random.default_rng(0)
    base = make_stack(T=2, H=256, W=256)[0].astype(np.float32)
    B = 256
    jit_amp = rng.uniform(-1.5, 1.5, size=(B, 2)).astype(np.float32)
    A = np.stack([np.roll(base, (int(a[0] * 2), int(a[1] * 2)), (0, 1)) for a in jit_amp])
    Bimg = np.stack([np.roll(base, (int(a[0] * 2) + 1, int(a[1] * 2)), (0, 1)) for a in jit_amp])
    A, Bimg = jnp.asarray(A), jnp.asarray(Bimg)
    flow_static = (
        ("gaussian_win", False), ("iterations", 5), ("levels", 3),
        ("poly_n", 7), ("poly_sigma", 1.5), ("winsize", 15),
    )
    # NOTE: a chunk-256 config (16.8M px-pairs/program) CRASHED the TPU
    # worker on the flat-gather implementation (battery 19:25Z) — keep the
    # sweep at sizes the chip demonstrably survives
    pa: dict = {"shape": f"{B}x256x256 pairs"}
    results["patch_scale"] = pa
    for chunk in (32, 128):
        pa[f"chunk{chunk}_s"] = timed(
            f"patch chunk={chunk}",
            lambda c=chunk: batched_pair_flows(
                A, Bimg, flow_static=flow_static, chunk_elems=c * 256 * 256
            )[0],
        )
        pa[f"chunk{chunk}_ms_per_pair"] = round(pa[f"chunk{chunk}_s"] / B * 1e3, 2)
        flush()

    # ---- patch-scale CHAIN formulations (sequences, not pairs) --------
    # (P, T) patch sequences: stepped chain (T-1 dispatches, patch-batched)
    # vs lax.scan chain (ONE program) — the production patch-sindy choices
    from pdx.pipelines.patch_sindy import (
        _assemble_time,
        _first_frames,
        _flow_register_chain_scan_all,
        _flow_warp_step_all_patches,
    )

    P, Tn = 64, 6
    seqs = jnp.asarray(
        rng.normal(size=(P, Tn, 256, 256)).astype(np.float32)
    ) * 0.1 + jnp.asarray(base)[None, None]

    def chain_stepped():
        prev = _first_frames(seqs)
        frames, qs = [], []
        for t in range(1, Tn):
            prev, q = _flow_warp_step_all_patches(seqs, prev, t)
            frames.append(prev)
            qs.append(q)
        out, _ = _assemble_time(_first_frames(seqs), frames, qs)
        return out

    pa["chain_stepped_s"] = timed("patch chain stepped", chain_stepped)
    flush()
    pa["chain_scan_s"] = timed(
        "patch chain scan", lambda: _flow_register_chain_scan_all(seqs)[0]
    )
    flush()

    an["chain_ms_per_flow"] = round(an["chain_s"] / n_pairs * 1e3, 1)
    for chunk in (2, 4, 12, 50):
        k = f"compose_chunk{chunk}_s"
        if k in an:
            an[f"compose_chunk{chunk}_ms_per_flow"] = round(an[k] / n_pairs * 1e3, 1)
    flush()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
