"""Quick chip A/B for the two accelerator execution-policy knobs.

Everything built after the 19:25Z worker crash — the banded-matmul separable
lowering (`pdx/ops/interp.py::use_mxu_sep`, default ON for accelerators) and
the lax.scan chain-registration schedule (`farneback.py::_chain_impl_default`,
default "scan" on accelerators) — shipped chip-UNVERIFIED. This tool takes
~3-6 min of a healthy-tunnel window to measure both knobs at the production
analyze shape and writes a machine-readable recommendation that
tools/tpu_battery.sh exports (PDX_SEP_IMPL / PDX_CHAIN_IMPL) for every
subsequent section, so the long real_bench sweep never measures a policy the
chip has already voted against.

Measurements (each flushed to --out as soon as it lands):
  * single 512x640 Farnebäck flow, separable passes lowered banded vs shift
    (best of 3 reps) -> recommend.PDX_SEP_IMPL
  * full 51-frame warp-to-prev chain, steps vs scan schedule (1 rep each,
    winner sep-impl applied) -> recommend.PDX_CHAIN_IMPL

Timing is chained-iteration with ONE device->host read at the end;
``block_until_ready`` returns at enqueue on the axon tunnel and must not be
trusted (docs/RESULTS.md methodology notes).

Usage: python tools/flow_quick.py [--out OUT.json] [--small]
(--small shrinks the stack to 6x64x80 — logic smoke test only, never a
measurement.)
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

    import pdx

    if jax.default_backend() not in ("cpu",):
        pdx.enable_compilation_cache()

    from tools.make_synth_stack import make_stack
    from pdx.register.farneback import farneback_flow, farneback_register_sequence

    results: dict = {"backend": jax.default_backend(), "recommend": {}}

    def flush() -> None:
        if out_path:
            out_path.write_text(json.dumps(results, indent=2))

    def timed(label: str, fn, reps: int) -> float:
        _read(fn())  # warmup: compile + first-read mode switch
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _read(fn())
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best:.3f} s", flush=True)
        return round(best, 3)

    small = "--small" in argv
    T, H, W = (6, 64, 80) if small else (51, 512, 640)
    U = jnp.asarray(make_stack(T=T, H=H, W=W), jnp.float32)
    fkw = dict(levels=3 if not small else 2, winsize=15, iterations=5,
               poly_n=7, poly_sigma=1.5, gaussian_win=False, refine=1)

    # ---- knob 1: separable lowering (single flow) ----------------------
    one: dict = {}
    results[f"single_flow_{H}x{W}"] = one
    for impl in ("shift", "banded"):
        os.environ["PDX_SEP_IMPL"] = impl
        jax.clear_caches()  # jit caches don't key on the env policy
        one[f"{impl}_s"] = timed(
            f"single flow {impl}",
            lambda: farneback_flow(U[0], U[1], **fkw)[0],
            reps=3,
        )
        flush()
    sep_winner = min(("shift", "banded"), key=lambda m: one[f"{m}_s"])
    results["recommend"]["PDX_SEP_IMPL"] = sep_winner
    print(f"sep winner: {sep_winner}", flush=True)
    flush()

    # ---- knob 2: chain schedule (production 50-flow sequence) ----------
    os.environ["PDX_SEP_IMPL"] = sep_winner
    jax.clear_caches()
    ch: dict = {}
    results[f"chain_{T}x{H}x{W}"] = ch
    for impl in ("steps", "scan"):
        ch[f"{impl}_s"] = timed(
            f"chain {impl}",
            lambda i=impl: farneback_register_sequence(U, chain_impl=i),
            reps=1,
        )
        flush()
    chain_winner = min(("steps", "scan"), key=lambda m: ch[f"{m}_s"])
    results["recommend"]["PDX_CHAIN_IMPL"] = chain_winner
    print(f"chain winner: {chain_winner}", flush=True)
    flush()

    # ---- knob 3: patch-sindy flow path, compose vs chain at the REAL
    # production patch shape. The flow_bench A/B ran 256 pairs of 256^2;
    # patch-sindy's real workload is ~285 patches x 50 steps of 128^2 —
    # different per-program pair counts and pyramid depths, so the policy
    # must be decided at this shape, on chip. A T=9 slice (8 steps) keeps
    # it ~1-2 min while exercising the exact registration functions the
    # pipeline dispatches to.
    os.environ["PDX_CHAIN_IMPL"] = chain_winner
    from pdx.pipelines.patch_sindy import (
        _flow_register_chain_scan_all,
        _flow_register_compose_all,
    )

    Tp, ph, pw, P = (9, 128, 128, 285) if not small else (4, 32, 32, 6)
    Up = jnp.asarray(make_stack(T=Tp, H=ph * 2, W=pw * 2), jnp.float32)
    import numpy as _np

    rng = _np.random.default_rng(7)
    ys = rng.integers(0, ph, size=P)
    xs = rng.integers(0, pw, size=P)
    seqs = jnp.stack([Up[:, y : y + ph, x : x + pw] for y, x in zip(ys, xs)])
    pa: dict = {}
    results[f"patch_flows_{P}x{Tp}x{ph}"] = pa
    pa["chain_s"] = timed(
        "patch chain", lambda: _flow_register_chain_scan_all(seqs)[0], reps=1
    )
    flush()
    pa["compose_s"] = timed(
        "patch compose", lambda: _flow_register_compose_all(seqs)[0], reps=1
    )
    compose_wins = pa["compose_s"] < pa["chain_s"]
    results["recommend"]["PDX_FLOW_COMPOSE"] = "1" if compose_wins else "0"
    print(f"patch flow winner: {'compose' if compose_wins else 'chain'}", flush=True)
    os.environ.pop("PDX_SEP_IMPL", None)
    os.environ.pop("PDX_CHAIN_IMPL", None)
    flush()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
