#!/bin/bash
# Round-5 gap-fill queue, relaunched (session 25): the session-24 queues
# (run_evidence_r05c/d.sh) died un-run in a host swap + home reset, so the
# compile caches are COLD — every TPU program this session is a fresh
# remote compile, including the driver's round-end bench.py. Order of
# business, strictly serialized (1-vCPU host), nohup-detached,
# append+commit per leg:
#   1. warm bench.py's compile cache (one run, logged not recorded) so the
#      round-end BENCH_r05 isn't a cold-compile gamble through the 40-min
#      watchdog;
#   2. retry the one missing r5 artifact leg — E2E cor (died session 24 at
#      readback with a transient tunnel INVALID_ARGUMENT; cor eval ran
#      clean at 86.3k the same session);
#   3. full pytest suite (CPU-only; fresh ISA-keyed test cache on this
#      host, so slower than the warm 492s);
#   4. leave the device idle for the driver's round-end bench.
#
# Usage: nohup bash tools/run_evidence_r05e.sh > /tmp/evidence_r05e.log 2>&1 &
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
  timeout 1800 python tools/device_ready.py --wait 2>/dev/null | tail -1 > /tmp/gate_e_last.json
  cat /tmp/gate_e_last.json
  grep -q '"ready": true' /tmp/gate_e_last.json
}

run() {
  local t="$1"; shift
  say "RUN: $*"
  timeout "$t" "$@"
  local rc=$?
  [ "$rc" -ne 0 ] && say "LEG FAILED rc=$rc: $*"
  return "$rc"
}

# ---- 1. bench.py compile-cache warm (cold caches after home reset) --------
gate || say "gate not ready — warm run proceeds anyway (it is not recorded)"
say "bench.py warm run (fresh compile expected; output logged, not recorded)"
run 5400 python bench.py | tee /tmp/bench_warm_r05e.json
say "warm run done — device compile cache now seeded for the round-end bench"

# ---- 2. E2E cor retry (up to 2 attempts, rest between) --------------------
if ! grep -q '"arch": "cor"' E2E_r05.json 2>/dev/null; then
  for attempt in 1 2; do
    sleep 120
    gate || say "gate not ready — e2e cor retry may read low"
    if E2E_APPEND=E2E_r05.json run 7200 python tools/bench_e2e.py --arch cor; then
      ci "E2E_r05: cor (retry; fresh compile after host swap)" E2E_r05.json
      break
    fi
    say "e2e cor attempt $attempt failed"
  done
else
  say "E2E cor already recorded — skip"
fi

# ---- 3. full pytest suite (CPU-only, after all timed device legs) ---------
say "pytest full suite (cold test cache on this host)"
if timeout 10800 python -m pytest tests/ -q > /tmp/pytest_r05e.log 2>&1; then
  say "pytest green: $(tail -1 /tmp/pytest_r05e.log)"
else
  say "PYTEST FAILED: $(tail -5 /tmp/pytest_r05e.log | tr '\n' ' ')"
fi

say "QUEUE DONE — device left idle for the round-end bench"
