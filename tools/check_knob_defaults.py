"""Assert benched-knob == shipped-default (VERDICT r4 #6).

The battery measures every long section under the flow_quick winner knobs
(PDX_CHAIN_IMPL / PDX_SEP_IMPL / PDX_FLOW_COMPOSE exported into the
environment). The auto policies in pdx resolve those same knobs at trace
time when the env vars are absent — which is what every out-of-box user
runs. If a policy edit ever makes the two diverge, the recorded battery
numbers silently stop describing default behavior (and worse, the
persistent compile cache populated by the battery stops matching the
programs a default run traces, so "cold (cache-hot)" claims break too).

Run with NO PDX_* knobs in the environment (the battery invokes it via
`env -u ...` before eval'ing the exports). Exits nonzero on mismatch.

Reference for why the knobs exist: the accelerator policy table in
.claude/skills/verify/SKILL.md and farneback._chain_impl_default /
interp.use_mxu_sep / patch_sindy._resolve_flow_compose.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def newest_tpu_recommend() -> dict | None:
    paths = sorted(glob.glob("docs/measurements/battery_*/flow_quick.json"))
    for p in reversed(paths):
        try:
            data = json.load(open(p))
        except Exception:
            continue
        rec = data.get("recommend", {})
        if rec and data.get("backend") == "tpu":
            return rec
    return None


def main() -> int:
    leaked = [k for k in os.environ if k.startswith("PDX_") and k != "PDX_COMPILATION_CACHE"]
    for k in leaked:
        # the check is only meaningful against a clean environment
        del os.environ[k]

    rec = newest_tpu_recommend()
    if rec is None:
        print("knob-check: no TPU flow_quick record found — nothing to assert")
        return 0

    # pdx first: it translates an env CPU request (JAX_PLATFORM_NAME=cpu)
    # into the config knob — bare jax init would hang on a wedged tunnel
    import pdx  # noqa: F401
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        print("knob-check: backend is cpu — chip defaults not resolvable, skipping")
        return 0

    from pdx.ops.interp import use_mxu_sep
    from pdx.pipelines.patch_sindy import _resolve_flow_compose
    from pdx.register.farneback import _chain_impl_default

    resolved = {
        "PDX_CHAIN_IMPL": _chain_impl_default(),
        "PDX_SEP_IMPL": "banded" if use_mxu_sep() else "shift",
        "PDX_FLOW_COMPOSE": "1" if _resolve_flow_compose(None) else "0",
    }
    mismatches = []
    for k, want in sorted(rec.items()):
        got = resolved.get(k)
        if got is None:
            continue
        if str(got) != str(want):
            mismatches.append(f"{k}: benched={want} shipped-default={got}")
    if mismatches:
        print("knob-check: MISMATCH — battery numbers would not describe "
              "out-of-box behavior:\n  " + "\n  ".join(mismatches))
        return 1
    checked = {k: v for k, v in rec.items() if k in resolved}
    print(f"knob-check: ok — shipped defaults match benched winners {checked}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
