#!/bin/bash
# Round-4 TPU run queue, part 2: the two jobs that remain after the
# first runbook (scripts/r4_tpu_runbook.sh) completed on 2026-08-19:
#   1. scripts/distill_serve_mid.py   (re-run: first attempt OOM-killed at
#      130 GB anon RSS before the donation/host-staging fix, second attempt
#      died with the controlling session — this one is setsid-detached)
#   2. scripts/perf_probe15.py        (re-sweep on the r4 cfg_refresh(2)
#      recipe — the first sweep ran the r3 gi-variant)
# Logs go to /tmp/r4rb2_*.log and are copied into docs/evidence/.
# Launch detached:  setsid nohup bash scripts/r4_tpu_runbook2.sh \
#                     > /tmp/r4_runbook2.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 90 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda a:a*2)(jnp.ones(4)))" >/dev/null 2>&1
}

echo "[runbook2] $(date +%T) waiting for tunnel (probe every 120s, up to 6h)"
up=0
for i in $(seq 1 180); do
  if probe; then up=1; echo "[runbook2] $(date +%T) tunnel up (probe $i)"; break; fi
  sleep 120
done
if [ "$up" != 1 ]; then echo "[runbook2] tunnel never recovered"; exit 7; fi

run_stage() {  # name, log, cmd...
  local name=$1 log=$2; shift 2
  echo "[runbook2] $(date +%T) stage $name -> $log"
  "$@" > "$log" 2>&1
  local rc=$?
  echo "[runbook2] $(date +%T) stage $name rc=$rc"
  cp "$log" "docs/evidence/$(basename "$log")"
}

run_stage ds  /tmp/r4rb2_ds.log      python -u scripts/distill_serve_mid.py
run_stage p15 /tmp/r4rb2_probe15.log python -u scripts/perf_probe15.py
echo "[runbook2] $(date +%T) done"

# Appended while the queue was waiting on the tunnel (append-only is safe
# for a running bash script): refresh bench_last_good.json at the new
# batch-8 default once the sweep evidence is in.
run_stage bench /tmp/r4rb2_bench.log python -u bench.py
echo "[runbook2] $(date +%T) bench stage done"
