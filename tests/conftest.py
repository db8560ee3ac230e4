"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in this environment; sharding paths are
validated with XLA's forced host-platform device count (SURVEY.md section 4,
"Distributed without a cluster"). These env vars must be set before the first
jax import, hence this conftest.
"""

import hashlib
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compile cache: model-test wall time is compile-dominated.
# Keyed per host ISA — XLA:CPU AOT results are specialized to the compiling
# machine's CPU features, and reusing another host's entries can SIGILL
# (vqa_tpu.utils.cache.host_isa_tag has the full story; duplicated here
# because this must run before any heavyweight import).
try:
    with open("/proc/cpuinfo") as _f:
        _lines = _f.readlines()
    # flags + model name: identical flags on different uarches still yield
    # different XLA target features (prefer-no-gather/-scatter are per-uarch;
    # observed as a cross-machine AOT feature-mismatch warning)
    _flags = next(line for line in _lines if line.startswith("flags"))
    _flags += next((line for line in _lines if line.startswith("model name")), "")
except (OSError, StopIteration):
    _flags = "unknown"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    "/root/.cache/jax_test_cache_" + hashlib.sha1(_flags.encode()).hexdigest()[:10],
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU in-process collectives abort the WHOLE process when a rendezvous
# participant thread is starved past a hard 40s default ("Termination timeout
# ... Exiting to ensure a consistent program state", rendezvous.cc). On this
# environment's 1-vCPU hosts the 8-virtual-device all-gathers occasionally
# starve 1-2 participant threads past that line under full-suite load — seen
# as the historical "Fatal Python error: Aborted inside a trivial CPU
# apply_primitive" suite crashes (the Python dump shows the innocent main
# thread; the abort comes from an XLA pool thread — root-caused r5s25 with
# `pytest -s`: F rendezvous.cc:127 + InProcessCommunicator::AllGather stack).
# Raise the limits far past any plausible scheduler stall. (The matching
# warn_stuck flag is NOT registered in this jaxlib's flag parser — passing
# it is itself fatal; only these two parse.)
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    _flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A plugin may have imported jax before this conftest ran, in which case the
# env vars above are ignored; force the platform through the config API too
# (works any time before backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.default_backend()
    )
    assert jax.device_count() == 8
