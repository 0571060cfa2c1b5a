#!/bin/bash
# TPU measurement battery — run when `pdx doctor` shows a ~ms-fast
# device->host read (the tunnel wedges for hours at a stretch; see CLAUDE.md).
#
# Wedge-resilient by design: every section is timeout-bounded and flushes its
# own stamped artifact the moment it finishes, so a tunnel wedge mid-battery
# loses at most the section it happened in. The battery ends with an explicit
# COMPLETE / INCOMPLETE marker in STATUS (and on stdout).
#
# Durable artifacts land under docs/measurements/battery_<stamp>/ (tracked in
# git); bench.py additionally writes its own per-run stamped record.
#
# Resumable: SECTIONS="bench real_bench" runs a subset (default all). Every
# section that finishes ok is appended to outputs/battery_sections_done.txt,
# so a caller (tools/tpu_watch.sh) can retry only what a flapping tunnel cut
# short instead of restarting the whole 45-90 min sweep each time.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%Y%m%dT%H%M%SZ)
DIR="docs/measurements/battery_${STAMP}"
mkdir -p "$DIR" outputs
STATUS="$DIR/STATUS"
: > "$STATUS"
FAILED=""
ALL_SECTIONS="flow_quick knob_check bench diag_patch real_bench profile comprehensive cold_bench pallas mesh_scaling gather_bench flow_bench"
SECTIONS="${SECTIONS:-$ALL_SECTIONS}"
DONE_FILE="outputs/battery_sections_done.txt"

note() { echo "$*" | tee -a "$STATUS"; }

want() { case " $SECTIONS " in *" $1 "*) return 0 ;; *) return 1 ;; esac; }

reprobe() {
  # quick tunnel re-check between sections: the tunnel flaps on ~minute
  # timescales (seen 2026-08-17: 32 ms warm read, wedged <1 min later) —
  # running TPU sections against a wedged tunnel burns their full timeout
  # on garbage. Returns nonzero when the tunnel is gone.
  timeout 100 python - <<'PY' >/dev/null 2>&1
import sys, time, jax, jax.numpy as jnp
x = jnp.ones((128, 128)); v = float((x @ x)[0, 0])
t0 = time.time(); v = float((x @ x)[0, 0])
sys.exit(0 if (jax.default_backend() == "tpu" and time.time() - t0 < 2.0) else 1)
PY
}

probe_retry() {
  # probe_retry <label> <attempts>: a single hung probe does NOT mean the
  # tunnel is gone — a probe launched seconds after another process released
  # the chip can hang on acquisition (seen 2026-08-17 16:37: two healthy
  # probes, then a hang 30 s later). Retry with 60 s gaps before concluding.
  local label="$1" attempts="${2:-3}" i
  for i in $(seq 1 "$attempts"); do
    if reprobe; then
      [ "$i" -gt 1 ] && note "note: probe $label recovered on attempt $i"
      return 0
    fi
    echo "    probe $label attempt $i/$attempts failed $(date -u +%H:%M:%SZ)"
    [ "$i" -lt "$attempts" ] && sleep 60
  done
  return 1
}

abort_if_wedged() {
  if ! probe_retry "$1" 3; then
    note "FAIL reprobe before $1 (tunnel wedged mid-battery — aborting remaining TPU sections)"
    FAILED="$FAILED reprobe:$1"
    return 1
  fi
  return 0
}

run_section() {
  # run_section <name> <timeout_s> <cmd...>: tee output to its own log,
  # record ok/fail immediately, never abort the battery.
  local name="$1" tmo="$2"; shift 2
  echo "=== section $name ($(date -u +%H:%M:%SZ))"
  if timeout "$tmo" "$@" > "$DIR/${name}.log" 2>&1; then
    note "ok $name"
    echo "$name $STAMP" >> "$DONE_FILE"
  else
    note "FAIL $name (rc=$? — timeout or error; see ${name}.log)"
    FAILED="$FAILED $name"
  fi
  grep -v -i warning "$DIR/${name}.log" | tail -6
}

note "battery $STAMP start"

# 0. tunnel probe: a tiny matmul + TWO device->host reads. The first read
#    absorbs backend init + compile; the SECOND must be ~ms-fast — a tunnel
#    that answers in 60 s still "completes" but every measurement behind it
#    is garbage (seen 2026-08-17: probe read=60s passed, bench fell back).
#    Retried: a hang right after another process released the chip is an
#    acquisition stall, not an hours-long wedge.
#    Skipped entirely when only CPU sections are wanted (mesh_scaling can be
#    pre-recorded without spending a healthy-tunnel window on it).
needs_tpu=""
for s in flow_quick knob_check bench diag_patch comprehensive real_bench profile cold_bench pallas gather_bench flow_bench; do want "$s" && needs_tpu=1; done
if [ -z "$needs_tpu" ]; then
  note "probe skipped (CPU-only sections: $SECTIONS)"
else
probe_ok=""
for attempt in 1 2 3 4 5; do
  if timeout 120 python - > "$DIR/probe.log" 2>&1 <<'PY'
import sys, time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((128, 128))
v = float((x @ x)[0, 0])
init_s = time.time() - t0
t0 = time.time()
v = float((x @ x)[0, 0])
warm_s = time.time() - t0
print(f"probe: backend={jax.default_backend()} init={init_s:.3f}s warm_read={warm_s:.3f}s value={v}")
if jax.default_backend() != "tpu":
    sys.exit("probe FAIL: not on TPU")
if warm_s > 2.0 or init_s > 45.0:
    sys.exit(f"probe FAIL: tunnel too slow (init={init_s:.1f}s warm={warm_s:.3f}s) — wedged or degraded")
PY
  then probe_ok=1; break; fi
  echo "    initial probe attempt $attempt/5 failed $(date -u +%H:%M:%SZ)"
  [ "$attempt" -lt 5 ] && sleep 60
done
if [ -z "$probe_ok" ]; then
  cat "$DIR/probe.log"
  note "FAIL probe (tunnel wedged/degraded after 5 attempts — chip sections aborted)"
  # CPU-only sections don't need the tunnel — record them anyway so a
  # wedged-all-day tunnel still retires them
  want mesh_scaling && run_section mesh_scaling 1200 python tools/mesh_scaling.py \
    --out "$DIR/mesh_scaling.json"
  note "battery INCOMPLETE (probe)"
  exit 1
fi
note "ok probe: $(tail -1 "$DIR/probe.log")"
fi

# 0. flow_quick FIRST: ~3-6 min that decides the two accelerator policy
#    knobs (PDX_SEP_IMPL banded-vs-shift, PDX_CHAIN_IMPL steps-vs-scan) that
#    shipped chip-unverified after the 19:25Z worker crash — the long
#    sections must not measure a policy the chip votes against
want flow_quick && run_section flow_quick 900 python tools/flow_quick.py \
  --out "$DIR/flow_quick.json"

# export the measured winners for every subsequent section (falls back to
# the newest prior battery's flow_quick.json when this run skipped the
# section because a previous attempt already recorded it)
knob_exports=$(python - <<'PY'
import glob, json
paths = sorted(glob.glob("docs/measurements/battery_*/flow_quick.json"))
for p in reversed(paths):
    try:
        data = json.load(open(p))
        rec = data.get("recommend", {})
    except Exception:
        continue
    # only chip data may set chip policy (a CPU-fallback record must not)
    if rec and data.get("backend") == "tpu":
        for k, v in sorted(rec.items()):
            print(f"export {k}={v}")
        break
PY
)
if [ -n "$knob_exports" ]; then
  eval "$knob_exports"
  note "knobs: $(echo "$knob_exports" | tr '\n' ' ')"
  # benched-knob == shipped-default assertion (VERDICT r4 #6): the sections
  # below measure under the exported winners; the checker re-resolves the
  # auto policies in a PDX_*-clean child and fails the battery loudly when
  # a policy edit has made recorded numbers unrepresentative of out-of-box
  # behavior. Chip-touching (needs jax init), hence timeout-bounded.
  if want knob_check; then
    if timeout 180 python tools/check_knob_defaults.py > "$DIR/knob_check.log" 2>&1; then
      note "ok knob_check: $(tail -1 "$DIR/knob_check.log")"
    else
      note "FAIL knob_check (benched knobs != shipped defaults — see knob_check.log)"
      FAILED="$FAILED knob_check"
    fi
  fi
fi

# 1. the driver bench (writes docs/measurements/bench_tpu_<stamp>.json itself)
#    no-fallback: a wedge must fail in ~90 s, not burn 900 s on a CPU rerun
want bench && run_section bench 900 env PDX_BENCH_NO_FALLBACK=1 python bench.py

# 1b. bench patch-ensemble stage attribution: pins the 18.6 s-vs-4 s warm
#     regression (battery_20260818T120920Z) to a stage (ship / preprocess /
#     registration / fits) instead of a guess. Cheap (~3-5 min warm reps).
want diag_patch && abort_if_wedged diag_patch && run_section diag_patch 1200 python tools/diag_bench_patch.py \
  --out "$DIR/diag_patch.json"

# 2. real-image pipeline sweep — the most-owed record (moved ahead of the
#    microbenches 2026-08-17: the register-formulation question they existed
#    to answer is settled — chain won at every compose chunk size — and
#    flow_bench CRASHED the TPU worker at 19:25Z, wedging the tunnel for
#    hours; the headline sweep must not queue behind a section that can
#    destroy the window). Flushes its JSON after every pipeline.
want real_bench && abort_if_wedged real_bench && run_section real_bench 3600 python tools/real_bench.py /tmp/synth51 \
  --out "$DIR/real_bench.json"
[ -f "$DIR/real_bench.json" ] && cp "$DIR/real_bench.json" outputs/real_bench_tpu.json

# 3. comprehensive 21x8 matrix, batched dispatch, cold + warm (VERDICT r2 #2)
want comprehensive && abort_if_wedged comprehensive && run_section comprehensive 2400 python - "$DIR/comprehensive.json" <<'PY'
import json, sys, time
import pdx
pdx.enable_compilation_cache()
from pdx.pipelines.comprehensive import ComprehensiveConfig, run
cfg = ComprehensiveConfig(write_artifacts=False)
out = {}
t0 = time.time(); run(cfg); out["cold_s"] = round(time.time() - t0, 1)
# flush the cold number immediately: a wedge during the warm run must not
# lose it
json.dump(out, open(sys.argv[1], "w"), indent=2)
t0 = time.time(); run(cfg); out["warm_s"] = round(time.time() - t0, 1)
import jax
out["backend"] = jax.default_backend()
json.dump(out, open(sys.argv[1], "w"), indent=2)
print(out)
PY

# 2b. chip-utilization traces (VERDICT r4 #1): device-busy %, dispatch
#     counts, transfer stats for the headline workloads. Parsed summary is
#     the durable artifact; raw xplanes kept gzipped when small.
want profile && abort_if_wedged profile && run_section profile 1800 python tools/profile_trace.py /tmp/synth51 \
  --out "$DIR/profile.json"

# 3b. fresh-process cache-hot colds (VERDICT r4 #3): what a SECOND
#     first-time user pays with the persistent compile cache populated.
#     Child processes only — the parent never imports jax (one-client
#     tunnel), so no abort_if_wedged wrapper here; each child is itself
#     timeout-bounded inside cold_bench.py.
want cold_bench && run_section cold_bench 4500 python tools/cold_bench.py /tmp/synth51 \
  --out "$DIR/cold_bench.json"

# 4. Pallas kernel microbenchmarks: parity + ms/iter vs the XLA path for the
#    fused pointwise and blockwise Gram kernels (stamped record of the 8.9x /
#    12x claims in docs/RESULTS.md)
want pallas && abort_if_wedged pallas && run_section pallas 1200 python tools/tpu_checks.py "$DIR/pallas.json"

# 5. virtual-mesh scaling curve (CPU — cheap, but record it alongside)
want mesh_scaling && run_section mesh_scaling 1200 python tools/mesh_scaling.py \
  --out "$DIR/mesh_scaling.json"

# 6/7. informational microbenches LAST: their decisions are already made
#    (flow_quick + the 19:25Z partial flow_bench), and flow_bench's heavy
#    batched-pyramid programs once CRASHED the TPU worker — nothing owed may
#    queue behind them
# 6. batched-gather formulation microbench (flat take / row-fold /
#     channel-last / unrolled) — the primitive-level data behind flow_bench
want gather_bench && abort_if_wedged gather_bench && run_section gather_bench 900 python tools/gather_bench.py \
  --out "$DIR/gather_bench.json"

# 7. registration-formulation sweep (chain vs chunked compose + patch-scale
#     chunk/chain A/B, both production shapes) — re-measures the row-folded
#     gather rewrite the 19:25Z crash predates
want flow_bench && abort_if_wedged flow_bench && run_section flow_bench 1500 python tools/flow_bench.py \
  --out "$DIR/flow_bench.json"

if [ -z "$FAILED" ]; then
  note "battery COMPLETE"
else
  note "battery INCOMPLETE (failed:$FAILED)"
fi

# measurement-history invariant (CLAUDE.md, VERDICT r3+r4): stamped
# artifacts must be git-tracked. Stage them HERE — rounds 3 and 4 both
# ended with orphaned battery dirs because staging was left to a human —
# then warn that a commit is still owed (the battery never commits: the
# message belongs to whoever interprets the numbers).
git -C . add docs/measurements 2>/dev/null || true
STAGED_UNCOMMITTED=$(git -C . status --porcelain docs/measurements 2>/dev/null | grep -c '^[AM]' || true)
if [ "${STAGED_UNCOMMITTED:-0}" -gt 0 ]; then
  note "STAGED $STAGED_UNCOMMITTED measurement artifacts — commit them"
fi
cp "$STATUS" outputs/tpu_battery_status.txt 2>/dev/null || true
