#!/bin/bash
# Round-5 qv28, third attempt.  Attempts 1-2 (r5b) crashed the TPU
# worker at the FIRST sampling row regardless of MID_BATCH: the eval
# sampler width is MID_EVAL_CHUNK (default 32) -> a 64-wide f32 CFG
# pair at depth 28 / dim 1152 / L 500 (einsum attention: ~1 GB QK^T
# buffers inside a 100-step scan).  Teacher is already cached (b4,
# mu=bf16), so this goes straight to the rows at chunk 8.
# Launch detached:  setsid nohup bash scripts/r5c_qv28.sh \
#                     > /tmp/r5c_runbook.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 90 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda a:a*2)(jnp.ones(4)))" >/dev/null 2>&1
}
wait_tunnel() {
  for i in $(seq 1 240); do
    if probe; then echo "[runbook5c] $(date +%T) tunnel up (probe $i)"; return 0; fi
    sleep 120
  done
  echo "[runbook5c] $(date +%T) tunnel never recovered"; return 1
}
run_stage() {
  local name=$1 log=$2 tmo=$3; shift 3
  echo "[runbook5c] $(date +%T) stage $name -> $log (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "[runbook5c] $(date +%T) stage $name rc=$rc"
  cp "$log" "docs/evidence/$(basename "$log")"
  return $rc
}

qv28_env() {
  export MID_DEPTH=28 MID_DIM=1152 MID_HEADS=16 MID_REMAT=1 \
         MID_MU_DTYPE=bfloat16 MID_BATCH=4 MID_EVAL_CHUNK=8 \
         MID_FLOW=0 MID_DISTILL=0 MID_TRAIN_STEPS=4000 \
         MID_ROWS='reference default,max recipe,max+cfgr2,cfgr2 (no gi),cfgr3 (no gi),m=4,(2M)-10'
}

wait_tunnel || exit 7
if ! ( qv28_env
       run_stage qv28 /tmp/r5_qv28.log 10800 \
         python -u scripts/quality_validate_mid.py ); then
  echo "[runbook5c] chunk-8 failed — last fallback: chunk 4, no int8 rows"
  wait_tunnel || exit 7
  ( qv28_env; export MID_EVAL_CHUNK=4
    run_stage qv28 /tmp/r5_qv28.log 10800 \
      python -u scripts/quality_validate_mid.py )
fi
echo "[runbook5c] $(date +%T) done"
