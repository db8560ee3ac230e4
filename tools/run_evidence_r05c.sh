#!/bin/bash
# Round-5 gap-fill evidence queue (session 24): waits for the r05b queue,
# then (a) retries the E2E cor leg that died at 08:40 UTC with an opaque
# tunnel-side `INVALID_ARGUMENT: TPU backend error` at readback (cor eval
# ran clean in EVAL_r05 at 86.3k QA/s the same session, so the failure is
# presumed transient — two attempts with a rest between), and (b) re-runs
# any main-queue leg whose artifact never landed (SERVE tpu lines,
# CONV_r05, EXPORT_r05, SOL_r05) so a single dead leg can't leave a hole.
#
# Usage: nohup bash tools/run_evidence_r05c.sh > /tmp/evidence_r05c.log 2>&1 &
# Same discipline as run_evidence_r05.sh: strictly serialized (1-vCPU
# host), nohup-detached, append+commit per leg, bounded gates.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

ci() {
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    if git add -- "$@" 2>/dev/null && git commit -q -m "$msg" -- "$@" 2>/dev/null; then
      say "committed: $msg"; return 0
    fi
    sleep 11
  done
  say "COMMIT FAILED: $msg ($*)"
}

gate() {
  say "gate: device_ready --wait"
  timeout 900 python tools/device_ready.py --wait 2>/dev/null | tail -1 > /tmp/gate_c_last.json
  cat /tmp/gate_c_last.json
  grep -q '"ready": true' /tmp/gate_c_last.json
}

run() {
  local t="$1"; shift
  say "RUN: $*"
  timeout "$t" "$@"
  local rc=$?
  [ "$rc" -ne 0 ] && say "LEG FAILED rc=$rc: $*"
  return "$rc"
}

# ---- 0. wait for the prior queues ----------------------------------------
# Lesson (session 24): /tmp/evidence_r05b.pid held a STALE pid — `echo $!`
# under the session harness can record a wrapper pid that exits immediately,
# so the first r05c launch sailed straight past its wait and had to be
# killed before it touched the device. Wait on pids verified live via ps at
# launch time, passed in /tmp/evidence_r05c_waits (one per line).
if [ -f /tmp/evidence_r05c_waits ]; then
  while read -r P; do
    [ -z "$P" ] && continue
    say "waiting for prior queue pid $P"
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
    say "pid $P exited"
  done < /tmp/evidence_r05c_waits
fi

# ---- 1. E2E cor retry (up to 2 attempts, rest between) -------------------
if ! grep -q '"arch": "cor"' E2E_r05.json 2>/dev/null; then
  for attempt in 1 2; do
    sleep 120
    gate || say "gate not ready — e2e cor retry may read low"
    if E2E_APPEND=E2E_r05.json run 5400 python tools/bench_e2e.py --arch cor; then
      ci "E2E_r05: cor (retry after transient tunnel InvalidArgument)" E2E_r05.json
      break
    fi
    say "e2e cor attempt $attempt failed"
  done
else
  say "E2E cor already recorded — skip"
fi

# ---- 2. SERVE tpu gap-fill ------------------------------------------------
for c in 32 64; do
  if ! grep -q "\"platform\": \"tpu\".*\"clients\": $c\|\"clients\": $c.*\"platform\": \"tpu\"" SERVE_r05.json 2>/dev/null; then
    sleep 90
    gate || say "gate not ready — tpu serve $c may read low"
    SERVE_APPEND=SERVE_r05.json run 3600 python tools/bench_serve.py \
      --flagship --clients "$c" --requests $((c * 25)) --max_batch "$c"
    ci "SERVE_r05: tpu flagship ${c}-client load (gap-fill)" SERVE_r05.json
  else
    say "SERVE tpu $c-client already recorded — skip"
  fi
done

# ---- 3. CONV / EXPORT / SOL gap-fill --------------------------------------
if [ ! -s CONV_r05.json ]; then
  sleep 90
  gate || say "gate not ready — extract may read low"
  EXTRACT_APPEND=CONV_r05.json run 3600 python tools/bench_extract.py
  ci "CONV_r05: ResNet-152@448 bf16 extraction refresh (gap-fill)" CONV_r05.json
fi
if [ ! -s EXPORT_r05.json ]; then
  EXPORT_APPEND=EXPORT_r05.json run 3600 python tools/check_export.py --platform cpu
  sleep 60
  EXPORT_APPEND=EXPORT_r05.json run 3600 python tools/check_export.py --platform tpu
  ci "EXPORT_r05: jax.export AOT round-trip refresh (gap-fill)" EXPORT_r05.json
fi
if [ ! -s SOL_r05.json ] && [ -s EVAL_r05.json ] && [ -s TRAIN_r05.json ]; then
  run 3600 python tools/flops_audit.py --eval EVAL_r05.json --train TRAIN_r05.json --out SOL_r05.json
  ci "SOL_r05: speed-of-light accounting (gap-fill)" SOL_r05.json
fi

say "GAP-FILL QUEUE DONE (leave the device idle for the round-end bench)"
