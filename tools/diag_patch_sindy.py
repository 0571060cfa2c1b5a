"""Diagnose the patch-sindy warm time, stage by stage.

real_bench recorded patch-sindy at 57.2 s warm on the chip
(battery_20260818T143942Z) against the <20 s round-3 target. The compose
flow path at the production shape (30 patches x 50 steps of 256^2 =
1500 pair flows) is estimated at ~35 s from the flow_quick per-pair
numbers, leaving ~20 s unattributed — this tool times every pipeline
stage so the attack order is measured, not guessed.

Usage (healthy tunnel, nothing else on the chip):
    python tools/diag_patch_sindy.py [--out OUT.json] [--small]

Timing convention: one scalar device->host read per stage to force
completion (block_until_ready returns at enqueue on the axon tunnel).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    out_path = None
    argv = sys.argv[1:]
    if "--out" in argv:
        out_path = Path(argv[argv.index("--out") + 1])
    small = "--small" in argv

    import jax
    import jax.numpy as jnp

    import pdx  # noqa: F401  (precision pins)

    if jax.default_backend() not in ("cpu",):
        pdx.enable_compilation_cache()

    from tools.make_synth_stack import make_stack
    from pdx.pipelines.patch_sindy import (
        PatchSindyConfig,
        run as ps_run,
        extract_patch_sequences,
        _compose_all_prep,
        _compose_all_finish,
        _discover_all,
    )
    from pdx.ops.filters import gaussian_filter_reflect, savgol_time
    from pdx.register.farneback import batched_pair_flows

    results: dict = {"backend": jax.default_backend(), "stages_s": {}}

    def flush() -> None:
        if out_path:
            out_path.write_text(json.dumps(results, indent=2))

    if small:
        U_raw = make_stack(T=11, H=512, W=640).astype(np.float64)
    else:
        U_raw = make_stack().astype(np.float64)  # 51 x 1024 x 1280, real_bench scale
    cfg = PatchSindyConfig(
        data_dir="unused", registration_method="optical_flow",
        write_artifacts=False,
    )

    def sync(x) -> None:
        jnp.asarray(x).sum().item()

    # ---- full-pipeline warmup + warm timing (write_artifacts=False) ----
    ps_run(cfg, U_raw=U_raw)
    t0 = time.perf_counter()
    out = ps_run(cfg, U_raw=U_raw)
    full_warm = time.perf_counter() - t0
    results["full_warm_no_artifacts_s"] = round(full_warm, 2)
    print(f"full pipeline warm (no artifacts): {full_warm:.2f} s "
          f"(backend={jax.default_backend()})")
    flush()

    # ---- warm timing WITH artifacts (real_bench's configuration) ----
    cfg_art = PatchSindyConfig(
        data_dir="unused", registration_method="optical_flow",
        write_artifacts=True, output_dir="/tmp/diag_patch_sindy_out",
    )
    ps_run(cfg_art, U_raw=U_raw)
    t0 = time.perf_counter()
    ps_run(cfg_art, U_raw=U_raw)
    full_art = time.perf_counter() - t0
    results["full_warm_with_artifacts_s"] = round(full_art, 2)
    results["artifacts_figure_s"] = round(full_art - full_warm, 2)
    print(f"full pipeline warm (with artifacts): {full_art:.2f} s "
          f"(figure/json cost {full_art - full_warm:.2f} s)")
    flush()

    # ---- stage attribution (each stage warmed once, then timed) ----
    from pdx.utils.precision import resolve_dtype

    dtype = resolve_dtype(cfg.dtype)

    def stage(name, fn, *args):
        fn(*args)  # warm
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r[0] if isinstance(r, tuple) else r)
        dt = time.perf_counter() - t0
        results["stages_s"][name] = round(dt, 3)
        print(f"  {name:28s} {dt:7.3f} s", flush=True)
        flush()
        return r

    t0 = time.perf_counter()
    U = jnp.asarray(U_raw, dtype=dtype)
    sync(U[0, 0, :2])
    results["stages_s"]["host_to_device_ship"] = round(time.perf_counter() - t0, 3)
    print(f"  {'host->device ship':28s} {results['stages_s']['host_to_device_ship']:7.3f} s")

    U = stage("gaussian_predenoise", lambda a: gaussian_filter_reflect(a, cfg.spatial_sigma), U)
    U = stage("savgol_time", lambda a: savgol_time(a, cfg.temporal_window, 2), U)

    T_, H_, W_ = U.shape
    patch_size = min(cfg.patch_size, H_, W_)
    stride = patch_size - cfg.overlap
    seqs, coords = stage(
        "extract_patches",
        lambda a: extract_patch_sequences(a, patch_size, stride), U,
    )
    P, T = int(seqs.shape[0]), int(seqs.shape[1])
    results["patch_grid"] = {"P": P, "T": T, "ps": patch_size}
    print(f"  patch grid: P={P} T={T} ps={patch_size} -> {P*(T-1)} pair flows")

    prev, cur = stage("compose_prep", _compose_all_prep, seqs)
    flow_static = (
        ("gaussian_win", False), ("iterations", 5), ("levels", 3),
        ("poly_n", 7), ("poly_sigma", 1.5), ("winsize", 15),
    )
    fx, fy = stage(
        "batched_pair_flows",
        lambda a, b: batched_pair_flows(a, b, flow_static=flow_static),
        prev, cur,
    )
    results["ms_per_pair_flow"] = round(
        1e3 * results["stages_s"]["batched_pair_flows"] / (P * (T - 1)), 2
    )
    seqs_reg, quals = stage("compose_finish_warp", _compose_all_finish, seqs, fx, fy)

    stage(
        "discover_all",
        lambda s, q: _discover_all(
            s, q.astype(s.dtype), dt=cfg.dt, dx=cfg.dx, dy=cfg.dy,
            alpha=cfg.alpha, sb=cfg.skip_boundary, sub=cfg.subsample,
        ),
        seqs_reg, quals,
    )

    accounted = sum(results["stages_s"].values())
    results["remainder_s"] = round(full_warm - accounted, 3)
    print(f"  {'remainder (agg+host reads)':28s} {results['remainder_s']:7.3f} s")
    print("ens coeffs:", np.asarray(out["coeffs"]).round(5).tolist())
    flush()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
