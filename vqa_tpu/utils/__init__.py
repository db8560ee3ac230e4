"""Shared utilities."""

from vqa_tpu.utils.cache import enable_compile_cache  # noqa: F401
