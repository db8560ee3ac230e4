"""Pallas kernel selection (engine.pallas: 'auto' | 'on' | 'off').

'auto' enables the fused kernels only when the default backend is TPU (the
kernels are TPU Mosaic programs; on CPU the jnp references are both the
oracle and the fast path).
"""

from __future__ import annotations

import jax

_MODE = "auto"

# recurrence backward for the train path (LSTM and GRU): 'bigmatmul' keeps
# only dh-propagation sequential and computes the weight grads as single
# full-rate GEMMs (+10% train, ops/lstm.py); 'native' = XLA scan AD
_RNN_BWD = "bigmatmul"


def set_pallas(mode: str) -> None:
    global _MODE
    if mode not in ("auto", "on", "off"):
        raise ValueError(f"pallas mode must be auto|on|off, got {mode!r}")
    _MODE = mode


def set_rnn_bwd(mode: str) -> None:
    global _RNN_BWD
    if mode not in ("native", "bigmatmul"):
        raise ValueError(f"rnn_bwd must be native|bigmatmul, got {mode!r}")
    _RNN_BWD = mode


def rnn_bwd() -> str:
    return _RNN_BWD


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
