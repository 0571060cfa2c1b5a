"""Virtual-mesh scaling curve for the multichip story (VERDICT r2 #7).

Runs the framework's two collective-bearing paths — the sample-sharded psum
Gram accumulation and the alpha-sharded STRidge grid sweep — at
n_devices in {1, 2, 4, 8} on a virtual CPU mesh with FIXED TOTAL WORK
(strong scaling), and records per-step wall-clock plus a coefficient-parity
check against the n=1 run.

Interpretation on THIS host: the virtual devices share one physical CPU
core, so the curve cannot show real speedup — what it measures is the
OVERHEAD the psum/sharding path adds over the single-device program (the
collective cost an 8-chip v5e slice would amortize across real cores). A
flat curve = the sharded formulation adds no material cost at fixed work.

Each n runs in a child process (the device count must be fixed before jax
initializes). Usage: python tools/mesh_scaling.py --out out.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD_CODE = r"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, "__REPO__")
from pdx.ops.linalg import gram_stats
from pdx.shard.mesh import make_mesh, shard_batch, sharded_gram_stats
from pdx.solve.stridge import stridge_from_stats, stridge_grid

n_dev = int(sys.argv[1])
assert len(jax.devices()) >= n_dev, (n_dev, jax.devices())
mesh = make_mesh(n_dev)

# fixed total work: 524288 x 16 Gram + a 24-alpha x 6-threshold grid sweep
rng = np.random.default_rng(0)
n_rows, p = 1 << 19, 16
X = jnp.asarray(rng.normal(size=(n_rows, p)), dtype=jnp.float32)
true = jnp.asarray(rng.normal(size=p) * (rng.random(p) > 0.5), dtype=jnp.float32)
y = X @ true
Xs, ys = shard_batch(X, mesh), shard_batch(y, mesh)

alphas = jnp.logspace(-8, -1, 24, dtype=jnp.float32)
alphas = jax.device_put(alphas, NamedSharding(mesh, P("data")))
thresholds = jnp.asarray([1e-8, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2], dtype=jnp.float32)

def step():
    stats = sharded_gram_stats(Xs, ys, mesh)
    coeffs, _ = stridge_grid(stats, alphas, thresholds)
    return coeffs

step().block_until_ready()  # compile
reps = 10
t0 = time.perf_counter()
for _ in range(reps):
    out = step()
out.block_until_ready()
per_step_ms = (time.perf_counter() - t0) / reps * 1e3

coeffs = np.asarray(out)
print(json.dumps({
    "n_devices": n_dev,
    "per_step_ms": round(per_step_ms, 2),
    "coeffs_checksum": float(np.abs(coeffs).sum()),
    "grid_first_coeffs": np.asarray(coeffs)[0, 0].tolist(),
}))
"""


def run_one(n_dev: int, repo: str) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_dev}")
    env["XLA_FLAGS"] = " ".join(flags)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD_CODE.replace("__REPO__", repo), str(n_dev)],
        env=env, capture_output=True, text=True, timeout=900,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"n={n_dev} child failed:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    rows = []
    for n in (int(x) for x in args.devices.split(",")):
        r = run_one(n, repo)
        rows.append(r)
        print(f"n={r['n_devices']}: {r['per_step_ms']} ms/step")

    base = rows[0]
    for r in rows:
        r["overhead_vs_n1_pct"] = round(
            (r["per_step_ms"] / base["per_step_ms"] - 1.0) * 100.0, 1
        )
        # parity: the sharded Gram + grid sweep must reproduce n=1 results
        rel = abs(r["coeffs_checksum"] - base["coeffs_checksum"]) / (
            abs(base["coeffs_checksum"]) + 1e-12
        )
        r["coeffs_rel_diff_vs_n1"] = float(rel)
        assert rel < 1e-4, f"n={r['n_devices']} coefficients diverged: {rel}"

    result = {"workload": "sharded Gram (2^19 x 16 rows, psum) + 24x6 STRidge grid",
              "note": "virtual CPU mesh, one physical core: measures sharding "
                      "overhead at fixed work, not speedup",
              "rows": rows}
    blob = json.dumps(result, indent=2)
    print(blob)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)


if __name__ == "__main__":
    main()
