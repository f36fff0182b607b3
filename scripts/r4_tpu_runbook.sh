#!/bin/bash
# Round-4 TPU run queue: waits for the axon tunnel to recover, then runs
# the remaining VERDICT-r3 measurement jobs sequentially (one python
# process at a time — see CLAUDE.md on process contention):
#   1. scripts/quality_edit_controlnet_mid.py  (editing + ControlNet rows)
#   2. scripts/distill_serve_mid.py            (distill-serve rows)
#   3. scripts/perf_probe15.py                 (fast-recipe batch sweep)
#   4. bench.py                                (refresh bench_last_good)
# Logs go to /tmp/r4rb_*.log and are copied into docs/evidence/.
# Launch detached:  setsid nohup bash scripts/r4_tpu_runbook.sh \
#                     > /tmp/r4_runbook.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 90 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda a:a*2)(jnp.ones(4)))" >/dev/null 2>&1
}

echo "[runbook] $(date +%T) waiting for tunnel (probe every 120s, up to 6h)"
up=0
for i in $(seq 1 180); do
  if probe; then up=1; echo "[runbook] $(date +%T) tunnel up (probe $i)"; break; fi
  sleep 120
done
if [ "$up" != 1 ]; then echo "[runbook] tunnel never recovered"; exit 7; fi

run_stage() {  # name, log, cmd...
  local name=$1 log=$2; shift 2
  echo "[runbook] $(date +%T) stage $name -> $log"
  "$@" > "$log" 2>&1
  local rc=$?
  echo "[runbook] $(date +%T) stage $name rc=$rc"
  cp "$log" "docs/evidence/$(basename "$log")"
}

run_stage qc  /tmp/r4rb_qc.log      python -u scripts/quality_edit_controlnet_mid.py
run_stage ds  /tmp/r4rb_ds.log      python -u scripts/distill_serve_mid.py
run_stage p15 /tmp/r4rb_probe15.log python -u scripts/perf_probe15.py
run_stage bench /tmp/r4rb_bench.log python -u bench.py
echo "[runbook] $(date +%T) done"
