#!/bin/bash
# Round-5 TPU run queue (VERDICT r4 items 1, 2, 4, plus the crossfade
# seam A/B from item 5).  Stages, in priority order:
#   1. ds    — scripts/distill_serve_mid.py: the full 16->8->4 distill +
#              GenerationServer serve + serving-path FAD (the one open r3
#              item; per-stage disk checkpoints make re-runs resumable)
#   2. qv28  — scripts/quality_validate_mid.py at the TRUE shipped bench
#              geometry (s3_xl: depth 28 / dim 1152 / heads 16): DDIM-100
#              anchor, max recipe, bench default max+cfgr2, and the cliff
#              rows — with CLAP columns (items 2 + 3)
#   3. qc    — scripts/quality_edit_controlnet_mid.py editing phase only:
#              class-MATCHED splice floor + crossfade A/B (item 5)
#   4. p15   — scripts/perf_probe15.py batch re-sweep on the SHIPPED
#              cfg_refresh(2) recipe (item 4; r4 swept the demoted gi one)
#   5. bench — bench.py refresh (throughput + latency-optimal rows)
# Logs: /tmp/r5_<stage>.log, copied into docs/evidence/ after each stage.
# Launch detached:  setsid nohup bash scripts/r5_tpu_runbook.sh \
#                     > /tmp/r5_runbook.log 2>&1 &
set -u
cd /root/repo

probe() {
  timeout 90 python -c "import jax,numpy as np,jax.numpy as jnp; np.asarray(jax.jit(lambda a:a*2)(jnp.ones(4)))" >/dev/null 2>&1
}

wait_tunnel() {  # up to 8h, probe every 120s
  for i in $(seq 1 240); do
    if probe; then echo "[runbook5] $(date +%T) tunnel up (probe $i)"; return 0; fi
    sleep 120
  done
  echo "[runbook5] $(date +%T) tunnel never recovered"; return 1
}

run_stage() {  # name log timeout_s cmd...
  local name=$1 log=$2 tmo=$3; shift 3
  echo "[runbook5] $(date +%T) stage $name -> $log (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "[runbook5] $(date +%T) stage $name rc=$rc"
  cp "$log" "docs/evidence/$(basename "$log")"
  return $rc
}

echo "[runbook5] $(date +%T) waiting for tunnel"
wait_tunnel || exit 7

# ds is stage-checkpointed in .cache_mid — a retry resumes, so one
# mid-run tunnel outage doesn't forfeit the round's top-priority item
if ! run_stage ds /tmp/r5_ds.log 14400 python -u scripts/distill_serve_mid.py
then
  echo "[runbook5] ds attempt 1 failed — waiting for tunnel and resuming"
  wait_tunnel || exit 7
  run_stage ds /tmp/r5_ds.log 14400 python -u scripts/distill_serve_mid.py
fi

wait_tunnel || exit 7
# shipped bench geometry (ezaudio-xl.yml): depth 28 / dim 1152 / 16 heads.
# batch 8 + remat off + donated state per probe9/probe12 (287 ms/step at
# depth 28); rows: anchor + max recipe + the bench-default max+cfgr2 +
# cfgr2/cfgr3 components + the two known cliffs (lc m=4, DPM-10).
qv28_env() {  # shipped geometry knobs (subshell-scoped exports)
  export MID_DEPTH=28 MID_DIM=1152 MID_HEADS=16 MID_BATCH=8 \
         MID_FLOW=0 MID_DISTILL=0 MID_TRAIN_STEPS=4000 \
         MID_ROWS='reference default,max recipe,max+cfgr2,cfgr2 (no gi),cfgr3 (no gi),m=4,(2M)-10'
}
if ! ( qv28_env; export MID_REMAT=0
       run_stage qv28 /tmp/r5_qv28.log 10800 \
         python -u scripts/quality_validate_mid.py ); then
  echo "[runbook5] qv28 failed (OOM at remat=0?) — retrying with remat"
  wait_tunnel || exit 7
  ( qv28_env; export MID_REMAT=1
    run_stage qv28 /tmp/r5_qv28.log 10800 \
      python -u scripts/quality_validate_mid.py )
fi

wait_tunnel || exit 7
QC_SKIP_CN=1 run_stage qc /tmp/r5_qc_seam.log 9000 \
  python -u scripts/quality_edit_controlnet_mid.py

wait_tunnel || exit 7
run_stage p15 /tmp/r5_probe15.log 3600 python -u scripts/perf_probe15.py

wait_tunnel || exit 7
run_stage bench /tmp/r5_bench.log 3600 python -u bench.py
echo "[runbook5] $(date +%T) all stages done"
