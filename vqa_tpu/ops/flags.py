"""Pallas kernel selection (engine.pallas: 'auto' | 'on' | 'off').

'auto' enables the fused kernels only when the default backend is TPU (the
kernels are TPU Mosaic programs; on CPU the jnp references are both the
oracle and the fast path).
"""

from __future__ import annotations

import jax

_MODE = "auto"


def set_pallas(mode: str) -> None:
    global _MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"pallas mode must be auto|on|off, got {mode!r}")
    _MODE = mode


def pallas_enabled() -> bool:
    """True when fused kernels may dispatch. Kernels are TPU Mosaic programs,
    so even 'on' requires the TPU backend — 'on' differs from 'auto' only for
    ops whose auto-policy prefers XLA on measured grounds (attention)."""
    if _MODE == "off":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
