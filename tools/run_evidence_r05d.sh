#!/bin/bash
# Round-5 final validation queue: waits for the r05c gap-fill queue, then
# runs the full pytest suite once more (the last full run predates the
# flops_audit JSONL-artifact change + its new test) and leaves the device
# idle so the driver's round-end bench.py reads an un-backlogged chip.
#
# Usage: nohup bash tools/run_evidence_r05d.sh > /tmp/evidence_r05d.log 2>&1 &
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

say() { echo "[$(date -u +%H:%M:%S)] $*"; }

# wait on pids verified live at launch (see run_evidence_r05c.sh's lesson
# on stale `echo $!` pid files)
if [ -f /tmp/evidence_r05d_waits ]; then
  while read -r P; do
    [ -z "$P" ] && continue
    say "waiting for prior queue pid $P"
    while kill -0 "$P" 2>/dev/null; do sleep 60; done
    say "pid $P exited"
  done < /tmp/evidence_r05d_waits
fi

# full suite, serialized after all timed device legs (CPU-only, 8 virtual
# devices; one suite at a time per compile-cache dir — ledger NOTE 2)
say "pytest full suite"
if timeout 7200 python -m pytest tests/ -q > /tmp/pytest_r05d.log 2>&1; then
  say "pytest green: $(tail -1 /tmp/pytest_r05d.log)"
else
  say "PYTEST FAILED: $(tail -3 /tmp/pytest_r05d.log | tr '\n' ' ')"
fi

say "FINAL VALIDATION DONE — device left idle for the round-end bench"
