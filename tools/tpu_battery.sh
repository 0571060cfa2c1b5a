#!/bin/bash
# TPU measurement battery — run when `pdx doctor` shows a ~ms-fast
# device->host read (the tunnel wedges for hours at a stretch; see CLAUDE.md).
# Writes results under outputs/ so they survive into the repo.
cd "$(dirname "$0")/.."
mkdir -p outputs
{
echo "=== tpu_battery $(date -u)"
echo "=== bench.py"
timeout 900 python bench.py 2>&1 | grep -v WARNING
echo "=== bench_details"
cat outputs/bench_details.json
echo "=== real_bench TPU"
timeout 3500 python tools/real_bench.py /tmp/synth51 --out outputs/real_bench_tpu.json 2>&1 | grep -v WARNING | tail -8
echo "=== comprehensive batched (timed)"
timeout 1200 python - <<'PY' 2>&1 | grep -v WARNING
import time
import pdx
pdx.enable_compilation_cache()
from pdx.pipelines.comprehensive import ComprehensiveConfig, run
cfg = ComprehensiveConfig(write_artifacts=False)
t0=time.time(); run(cfg); print(f"comprehensive cold: {time.time()-t0:.1f}s")
t0=time.time(); run(cfg); print(f"comprehensive warm: {time.time()-t0:.1f}s")
PY
} 2>&1 | tee outputs/tpu_battery.log
