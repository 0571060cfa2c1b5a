"""Diagnose the bench patch-ensemble warm time, stage by stage.

bench.py's `_patch_ensemble_seconds` recorded 18.64 s warm on the chip
(battery_20260818T120920Z) vs the 3.98-4.38 s round-2 record on the same
workload — this tool attributes the warm time to pipeline stages so the
regression can be pinned to a code change rather than guessed at.

Usage (healthy tunnel, nothing else on the chip):
    python tools/diag_bench_patch.py [--out OUT.json]

Timing convention: one scalar device->host read per stage to force
completion (block_until_ready returns at enqueue on the axon tunnel).
The first read drops the tunnel into its ~30 ms/dispatch slow mode, which
is the SAME mode bench.py's patch section runs in (the ks2d section reads
results first) — so these stage times are representative of the bench
record, not of a fresh process.
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

    import jax
    import jax.numpy as jnp

    import pdx  # noqa: F401  (precision pins)

    if jax.default_backend() not in ("cpu",):
        pdx.enable_compilation_cache()

    from tools.make_synth_stack import make_stack
    from pdx.pipelines.patch_discovery import PatchDiscoveryConfig, run as pd_run
    from pdx.preprocess import resize_denoise_normalize
    from pdx.register.farneback import register_sequence_dispatch
    from pdx.ops.filters import gaussian_filter_reflect

    results: dict = {"backend": jax.default_backend(), "stages_s": {}}

    def flush() -> None:
        if out_path:
            out_path.write_text(json.dumps(results, indent=2))

    U_raw = make_stack(T=51, H=512, W=640).astype(np.float64)
    cfg = PatchDiscoveryConfig(
        data_dir="unused", write_artifacts=False, skip=12, subsample=6
    )

    def sync(x) -> None:
        jnp.asarray(x).sum().item()

    # ---- full-pipeline warmup + warm timing (mirrors bench.py) ----
    pd_run(cfg, U_raw=U_raw)
    t0 = time.perf_counter()
    out = pd_run(cfg, U_raw=U_raw)
    full_warm = time.perf_counter() - t0
    results["full_pipeline_warm_s"] = round(full_warm, 2)
    print(f"full pipeline warm: {full_warm:.2f} s "
          f"(backend={jax.default_backend()})")
    flush()

    # ---- stage attribution (each stage warmed once, then timed) ----
    from pdx.utils.precision import resolve_dtype

    dtype = resolve_dtype(cfg.dtype)
    T0, H0, W0 = U_raw.shape

    def stage(name, fn, *args):
        fn(*args)  # warm
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r if not isinstance(r, tuple) else r[0])
        dt = time.perf_counter() - t0
        results["stages_s"][name] = round(dt, 3)
        print(f"  {name:28s} {dt:7.3f} s")
        flush()
        return r

    t_ship0 = time.perf_counter()
    U_dev = jnp.asarray(U_raw)
    sync(U_dev[0, 0, :2])
    dt_ship = time.perf_counter() - t_ship0
    results["stages_s"]["host_to_device_ship_f64"] = round(dt_ship, 3)
    print(f"  {'host->device ship (f64 np)':28s} {dt_ship:7.3f} s")
    flush()

    U = stage(
        "resize_denoise_normalize",
        lambda a: resize_denoise_normalize(
            a, out_h=H0 // cfg.downsample, out_w=W0 // cfg.downsample,
            sigma=cfg.denoise_sigma1, eps=1e-12, dtype_name=jnp.dtype(dtype).name,
        ),
        U_dev,
    )
    U_reg = stage(
        "registration_dispatch",
        lambda a: register_sequence_dispatch(
            a, mode=cfg.register_mode, refine=cfg.register_refine,
            reference_compat_warp=cfg.reference_compat_warp,
        ),
        U,
    )
    stage("denoise2", lambda a: gaussian_filter_reflect(a, cfg.denoise_sigma2), U_reg)

    # remainder = full - (ship + preprocess + registration + denoise2):
    # extraction + local-poly fits + aggregation + host reads
    accounted = sum(results["stages_s"].values())
    results["remainder_s"] = round(full_warm - accounted, 3)
    print(f"  {'remainder (extract+fit+agg)':28s} {results['remainder_s']:7.3f} s")
    print("coeff shape:", np.asarray(out["patch_coeffs"]).shape)
    flush()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
