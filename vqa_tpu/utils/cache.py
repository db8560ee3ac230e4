"""Persistent XLA compile cache (one place; CLI/bench/tools/graft all use it).

First TPU compiles on this image go through a slow remote-compile helper
(SURVEY.md Appendix A); the on-disk cache makes every later invocation hit
prior sessions' work. Disable with VQA_TPU_COMPILE_CACHE=0.
"""

from __future__ import annotations

import hashlib
import os

import jax


def host_isa_tag() -> str:
    """CPU-feature fingerprint for cache keying.

    XLA:CPU persists AOT results specialized to the *compiling* host's ISA;
    loading them on a machine with different features logs cpu_aot_loader
    "could lead to execution errors such as SIGILL" — and an intermittent
    hard interpreter crash matching exactly that was observed when a cache
    written on another host was reused. TPU executables don't care, but the
    CPU-forced paths (tests, multichip dryrun) share these cache dirs, so
    the default dirs are suffixed per host ISA.

    The fingerprint hashes the cpuinfo *flags* line AND the *model name*:
    two machines with identical flags but different microarchitectures were
    observed to disagree on XLA's derived target features (prefer-no-gather/
    prefer-no-scatter are picked per uarch), which the flags alone miss."""
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.readlines()
        flags = next(l for l in lines if l.startswith("flags"))
        model = next((l for l in lines if l.startswith("model name")), "")
        flags += model
    except (OSError, StopIteration):
        import platform

        flags = platform.machine() + " " + platform.processor()
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def enable_compile_cache() -> None:
    """Pick the cache dir by target platform:

    - CPU-forced runs (``--platform cpu`` / jax_platforms=cpu) get an
      ISA-keyed dir — XLA:CPU AOT results are host-specific (SIGILL story
      above) and XLA's own cache key does NOT include CPU features.
    - device runs share one host-independent dir: TPU executables are
      compiled for the chip, not the host, and they are the expensive
      (remote-compiled) entries worth keeping across machine swaps.

    Safe to call again after changing jax_platforms (entry points that
    force CPU late re-call it); the config just repoints the directory.
    """
    cache_dir = os.environ.get("VQA_TPU_COMPILE_CACHE")
    if cache_dir is None:
        # the shared host-independent dir ONLY when a non-CPU platform is
        # positively requested (config or env): an unset platform can still
        # resolve to the CPU backend (plugin-init failure fallback), and
        # host-specific CPU AOT entries must never land in the shared dir
        plat = getattr(jax.config, "jax_platforms", None) or os.environ.get(
            "JAX_PLATFORMS", ""
        ) or ""
        non_cpu = bool(plat) and not plat.startswith("cpu")
        suffix = "device" if non_cpu else "cpu_" + host_isa_tag()
        cache_dir = os.path.expanduser("~/.cache/vqa_tpu_jax_" + suffix)
    if not cache_dir or cache_dir == "0":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # never let cache plumbing break an entry point
