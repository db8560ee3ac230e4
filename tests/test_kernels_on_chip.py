"""Opt-in real-TPU Mosaic compile gate as a pytest target (SURVEY.md L1).

The default suite runs CPU-only (conftest forces the virtual 8-device mesh),
so Pallas kernels are exercised in interpret mode and a REAL Mosaic compile
is never attempted in CI — the per-round KERNELS_rNN.json artifact is the
manual gate (VERDICT r2/r4 "what's weak": CI never executes a real Mosaic
compile). This wraps that gate as a one-command pytest target:

    VQA_TPU_REAL_KERNELS=1 python -m pytest tests/test_kernels_on_chip.py -q

It runs tools/check_kernels.py in a SUBPROCESS (the conftest CPU force is
process-wide and irreversible after backend init) against the real chip and
asserts every kernel's numerics check passed. Skipped — loudly, not
silently — unless explicitly requested via the env var: it needs the
tunneled device, takes minutes, and timed evidence runs must not share the
host (perf ledger: host contention depresses readings with no calibration
signal).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("VQA_TPU_REAL_KERNELS", "") != "1",
    reason="real-TPU Mosaic gate is opt-in: VQA_TPU_REAL_KERNELS=1 "
    "(needs the tunneled chip + an otherwise idle host)",
)
def test_mosaic_kernels_compile_and_match_on_chip(tmp_path):
    out = tmp_path / "kernels.json"
    env = dict(os.environ)
    # undo the conftest's CPU forcing for the child: the check must reach
    # the real device through the normal platform resolution
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_kernels.py"),
         "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(out.read_text())
    assert report["kernels"], "no kernels checked"
    bad = {k: v for k, v in report["kernels"].items() if not v.get("ok")}
    assert not bad, f"kernel numerics failed on chip: {bad}"
