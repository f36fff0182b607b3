#!/bin/bash
# Round-5 follow-up: re-run the depth-28 quality validation after the
# main runbook (scripts/r5_tpu_runbook.sh) drains.  The first two qv28
# attempts OOM'd: a stray full init pinned 3.5 GB and the harness
# hardwired f32 Adam (866.7M params -> ~17 GB state+activations on a
# 16 GB chip).  Fixed: abstract param count + MID_MU_DTYPE knob.
# Attempt 1: batch 8 + remat + mu bf16; fallback: batch 4.
# Launch detached:  setsid nohup bash scripts/r5b_qv28.sh \
#                     > /tmp/r5b_runbook.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 90 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda a:a*2)(jnp.ones(4)))" >/dev/null 2>&1
}

wait_tunnel() {
  for i in $(seq 1 240); do
    if probe; then echo "[runbook5b] $(date +%T) tunnel up (probe $i)"; return 0; fi
    sleep 120
  done
  echo "[runbook5b] $(date +%T) tunnel never recovered"; return 1
}

# wait for the main runbook to finish (max 6 h; pid recorded at launch)
for i in $(seq 1 360); do
  if [ ! -f /tmp/r5_runbook.pid ] \
     || ! kill -0 "$(cat /tmp/r5_runbook.pid)" 2>/dev/null; then
    break
  fi
  grep -q "all stages done" /tmp/r5_runbook.log 2>/dev/null && break
  sleep 60
done
echo "[runbook5b] $(date +%T) main runbook drained"

run_stage() {
  local name=$1 log=$2 tmo=$3; shift 3
  echo "[runbook5b] $(date +%T) stage $name -> $log (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "[runbook5b] $(date +%T) stage $name rc=$rc"
  cp "$log" "docs/evidence/$(basename "$log")"
  return $rc
}

qv28_env() {
  export MID_DEPTH=28 MID_DIM=1152 MID_HEADS=16 MID_REMAT=1 \
         MID_MU_DTYPE=bfloat16 \
         MID_FLOW=0 MID_DISTILL=0 MID_TRAIN_STEPS=4000 \
         MID_ROWS='reference default,max recipe,max+cfgr2,cfgr2 (no gi),cfgr3 (no gi),m=4,(2M)-10'
}

wait_tunnel || exit 7
if ! ( qv28_env; export MID_BATCH=8
       run_stage qv28 /tmp/r5_qv28.log 10800 \
         python -u scripts/quality_validate_mid.py ); then
  echo "[runbook5b] qv28 batch-8 failed — retrying at batch 4"
  wait_tunnel || exit 7
  ( qv28_env; export MID_BATCH=4
    run_stage qv28 /tmp/r5_qv28.log 10800 \
      python -u scripts/quality_validate_mid.py )
fi
echo "[runbook5b] $(date +%T) done"
