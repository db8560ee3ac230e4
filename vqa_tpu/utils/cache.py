"""Persistent XLA compile cache (one place; CLI/bench/tools/graft all use it).

First TPU compiles on this image go through a slow remote-compile helper
(SURVEY.md Appendix A); the on-disk cache makes every later invocation hit
prior sessions' work. Disable with VQA_TPU_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os

import jax


def enable_compile_cache() -> None:
    cache_dir = os.environ.get(
        "VQA_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/vqa_tpu_jax")
    )
    if not cache_dir or cache_dir == "0":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # never let cache plumbing break an entry point
