#!/bin/bash
# Round-5 follow-up evidence queue: TRAIN_r05 re-record at BENCH_BATCH=1024.
#
# Why: run_evidence_r05.sh launched the per-family train legs without
# BENCH_BATCH, so they recorded bench_train's default batch=256 — the
# ledger's train numbers (TRAIN_r03.json and the batch-saturation ADR:
# "the step is batch-saturated at 1024") are all @1024, so the r5/r3
# comparison must be like-for-like. Each appended JSON line carries its
# own "batch" field, so the 256-batch lines stay in the artifact as an
# honest batch-scaling data point; the @1024 lines are the headline.
#
# Usage: nohup bash tools/run_evidence_r05b.sh > /tmp/evidence_r05b.log 2>&1 &
# Waits for the main queue (/tmp/evidence_r05.pid) to exit first so the
# two never contend on the 1-vCPU host or interleave device traffic.
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
  timeout 900 python tools/device_ready.py --wait 2>/dev/null | tail -1 > /tmp/gate_b_last.json
  cat /tmp/gate_b_last.json
  grep -q '"ready": true' /tmp/gate_b_last.json
}

run() {
  local t="$1"; shift
  say "RUN: $*"
  timeout "$t" "$@"
  local rc=$?
  [ "$rc" -ne 0 ] && say "LEG FAILED rc=$rc: $*"
  return "$rc"
}

# ---- 0. wait for the main queue to finish --------------------------------
if [ -f /tmp/evidence_r05.pid ]; then
  MAIN=$(cat /tmp/evidence_r05.pid)
  say "waiting for main evidence queue (pid $MAIN)"
  while kill -0 "$MAIN" 2>/dev/null; do sleep 60; done
  say "main queue exited"
fi

# ---- 1. per-family train @1024 (the ledger-comparable batch) --------------
sleep 90
gate || say "gate not ready — train@1024 legs may read low"
for f in mutan mutan_st mfb mfh cor; do
  sleep 60
  BENCH_BATCH=1024 TRAIN_APPEND=TRAIN_r05.json run 3600 python tools/bench_train.py "$f"
  ci "TRAIN_r05: $f @1024 (ledger-comparable batch)" TRAIN_r05.json
done

# ---- 2. SOL re-audit against the @1024 train lines -------------------------
# The main queue's SOL leg ran against whatever TRAIN_r05 held at the time
# (the @256 lines). flops_audit.load_measured prefers batch==1024 JSONL
# lines, so re-running after leg 1 overwrites SOL_r05 with the
# ledger-comparable accounting. CPU-only (tracing), no device traffic.
if [ -s EVAL_r05.json ] && [ -s TRAIN_r05.json ]; then
  run 3600 python tools/flops_audit.py --eval EVAL_r05.json --train TRAIN_r05.json --out SOL_r05.json
  ci "SOL_r05: re-audit against the @1024 train lines" SOL_r05.json
fi

# ---- 3. one in-session bench.py reading for the ledger --------------------
sleep 120
gate || say "gate not ready — in-session bench may read low"
run 3600 python bench.py | tail -1 > /tmp/bench_r05_insession.json
cat /tmp/bench_r05_insession.json

say "FOLLOW-UP QUEUE DONE (leave the device idle for the round-end bench)"
