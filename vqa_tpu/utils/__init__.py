"""Shared utilities."""

from vqa_tpu.utils.cache import enable_compile_cache  # noqa: F401
from vqa_tpu.utils.platform import force_platform  # noqa: F401
