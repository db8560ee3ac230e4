#!/bin/bash
# Round-5 evidence runner (VERDICT r4 items 1,3,4,5,6,7): one sequential
# queue of measurement legs, nohup-detached so a driver-side session kill
# cannot take a run with it, with every artifact line appended to its file
# AND committed the moment it lands — the r4 failure mode was five sessions
# dying mid-measurement with nothing recorded.
#
# Usage: nohup bash tools/run_evidence_r05.sh > /tmp/evidence_r05.log 2>&1 &
#
# Discipline baked in (perf ledger): legs run strictly one at a time (the
# host has 1 vCPU — concurrent host load depresses TPU readings ~-23% with
# no calibration signal); 60-90s rests between device legs; device_ready
# gates before each TPU section; pytest serialized into the queue so it
# never contends with a timed leg.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

ci() { # commit named paths; retry through index.lock races with my own session
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    if git add -- "$@" 2>/dev/null && git commit -q -m "$msg" -- "$@" 2>/dev/null; then
      say "committed: $msg"; return 0
    fi
    sleep 11
  done
  say "COMMIT FAILED: $msg ($*)"
}

gate() { # bounded in-band gate; never hangs the queue (wedge discipline)
  say "gate: device_ready --wait"
  timeout 900 python tools/device_ready.py --wait 2>/dev/null | tail -1 > /tmp/gate_last.json
  cat /tmp/gate_last.json
  grep -q '"ready": true' /tmp/gate_last.json
}

run() { # bounded leg; log failures, never abort the queue
  local t="$1"; shift
  say "RUN: $*"
  timeout "$t" "$@"
  local rc=$?
  [ "$rc" -ne 0 ] && say "LEG FAILED rc=$rc: $*"
  return "$rc"
}

# ---- 0. the int8 capacity leg launched at session start ----------------
if [ -f /tmp/cap_r05.pid ]; then
  say "waiting for int8 capacity leg (pid $(cat /tmp/cap_r05.pid))"
  while kill -0 "$(cat /tmp/cap_r05.pid)" 2>/dev/null; do sleep 30; done
fi
[ -s CAPACITY_r05.json ] && \
  ci "CAPACITY_r05: trainval-scale int8 leg (123k images, 9GB table on-chip)" CAPACITY_r05.json

# ---- 1. row-sharded CPU-mesh leg (host-only) ----------------------------
run 5400 python tools/bench_capacity.py --rowsharded_cpu --out CAPACITY_r05.json
ci "CAPACITY_r05: row-sharded bf16 CPU-mesh leg (18GB over 8 devices)" CAPACITY_r05.json

# ---- 2. full test suite (serialized; cold CPU caches on this host) ------
say "pytest full suite"
if timeout 7200 python -m pytest tests/ -q > /tmp/pytest_r05.log 2>&1; then
  say "pytest green: $(tail -1 /tmp/pytest_r05.log)"
else
  say "PYTEST FAILED: $(tail -3 /tmp/pytest_r05.log | tr '\n' ' ')"
fi

# ---- 3. kernels: the only real-Mosaic compile gate ----------------------
sleep 90
gate || say "gate not ready — kernels leg may read low"
run 5400 python tools/check_kernels.py --out KERNELS_r05.json
ci "KERNELS_r05: real-Mosaic compile + numerics + timing refresh" KERNELS_r05.json

# ---- 4. per-family eval -------------------------------------------------
sleep 60
gate || say "gate not ready — eval legs may read low"
for f in mutan mutan_st mfb mfh cor; do
  sleep 60
  EVAL_APPEND=EVAL_r05.json run 3600 python tools/bench_eval.py "$f"
  ci "EVAL_r05: $f" EVAL_r05.json
done

# ---- 5. per-family train ------------------------------------------------
sleep 90
gate || say "gate not ready — train legs may read low"
for f in mutan mutan_st mfb mfh cor; do
  sleep 60
  TRAIN_APPEND=TRAIN_r05.json run 3600 python tools/bench_train.py "$f"
  ci "TRAIN_r05: $f" TRAIN_r05.json
done

# ---- 6. streamed-put equivalence A/B (VERDICT item 7) -------------------
sleep 90
gate || say "gate not ready — A/B still valid (same-session relative)"
run 5400 python tools/bench_capacity.py --ab_streamed --out CAPACITY_r05.json
ci "CAPACITY_r05: streamed-vs-direct put equivalence A/B (4GB int8)" CAPACITY_r05.json

# ---- 7. per-family E2E (disk -> prep -> FeatureStore -> eval) -----------
sleep 90
gate || say "gate not ready — e2e legs may read low"
for f in mutan mfb cor; do
  sleep 60
  E2E_APPEND=E2E_r05.json run 5400 python tools/bench_e2e.py --arch "$f"
  ci "E2E_r05: $f" E2E_r05.json
done

# ---- 8. mfb profile re-stamp in-band (VERDICT weak #2) -------------------
sleep 60
run 3600 python tools/probe_mfb_phases.py mfb > /tmp/profile_r05_mfb.out 2>&1
grep -h '^{' /tmp/profile_r05_mfb.out >> PROFILE_r05_mfb.json || true
[ -s PROFILE_r05_mfb.json ] && \
  ci "PROFILE_r05_mfb: re-stamp mfb phase decomposition on an in-band device" PROFILE_r05_mfb.json

# ---- 9. serve at 32/64 clients (VERDICT weak #1) ------------------------
# max_batch scales with the client count: at 64 clients a 32-row cap would
# pin rows/forward at the cap instead of showing the coalescing headroom
for c in 32 64; do
  SERVE_APPEND=SERVE_r05.json run 3600 python tools/bench_serve.py \
    --platform cpu --clients "$c" --requests $((c * 25)) --max_batch "$c"
  ci "SERVE_r05: cpu ${c}-client load" SERVE_r05.json
done
sleep 90
gate || say "gate not ready — tpu serve legs may read low"
for c in 32 64; do
  SERVE_APPEND=SERVE_r05.json run 3600 python tools/bench_serve.py \
    --flagship --clients "$c" --requests $((c * 25)) --max_batch "$c"
  ci "SERVE_r05: tpu flagship ${c}-client load" SERVE_r05.json
done

# ---- 10. round refreshes: extraction throughput, export, SOL ------------
sleep 90
gate || say "gate not ready — extract leg may read low"
EXTRACT_APPEND=CONV_r05.json run 3600 python tools/bench_extract.py
ci "CONV_r05: ResNet-152@448 bf16 extraction refresh" CONV_r05.json

EXPORT_APPEND=EXPORT_r05.json run 3600 python tools/check_export.py --platform cpu
sleep 60
EXPORT_APPEND=EXPORT_r05.json run 3600 python tools/check_export.py --platform tpu
ci "EXPORT_r05: jax.export AOT round-trip refresh (cpu + tpu)" EXPORT_r05.json

# SOL audit reads the fresh EVAL/TRAIN artifacts (CPU-only XLA cost analysis)
if [ -s EVAL_r05.json ] && [ -s TRAIN_r05.json ]; then
  run 3600 python tools/flops_audit.py --eval EVAL_r05.json --train TRAIN_r05.json --out SOL_r05.json
  ci "SOL_r05: speed-of-light accounting against the r5 artifacts" SOL_r05.json
fi

say "EVIDENCE QUEUE DONE"
