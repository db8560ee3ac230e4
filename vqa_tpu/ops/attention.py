"""Fused glimpse attention (SURVEY.md C10 kernel, section 2.2).

glimpse_attend(logits [B, R, G], v [B, R, D]) -> attended [B, G, D]

One VMEM pass per batch tile: softmax over the region axis + the
[G, R] x [R, D] weighted sum on the MXU — replaces XLA's
softmax/transpose/einsum chain with a single Mosaic program, no [B, R, G]
intermediates ever round-tripping HBM.

Differentiable via custom_vjp (backward = vjp of the jnp reference, which is
also the CPU fallback and the test oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops.flags import pallas_enabled


def glimpse_attend_reference(logits: jax.Array, v: jax.Array) -> jax.Array:
    alpha = jax.nn.softmax(logits, axis=1)                 # [B, R, G]
    return jnp.einsum("brg,brd->bgd", alpha, v)


def _kernel(logits_ref, v_ref, out_ref):
    l = logits_ref[:].astype(jnp.float32)                  # [bB, R, G]
    m = jnp.max(l, axis=1, keepdims=True)
    e = jnp.exp(l - m)
    alpha = e / jnp.sum(e, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        alpha.astype(v_ref.dtype),
        v_ref[:],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),    # contract R, batch bB
        preferred_element_type=jnp.float32,
    )                                                       # [bB, G, D]
    out_ref[:] = out.astype(out_ref.dtype)


def _pallas_fwd(logits: jax.Array, v: jax.Array, block_b: int = 8) -> jax.Array:
    B, R, G = logits.shape
    D = v.shape[-1]
    grid = (B // block_b,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, R, G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, R, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, G, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, D), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * G * D,
            bytes_accessed=logits.size * 4 + v.size * v.dtype.itemsize,
            transcendentals=B * R * G,
        ),
    )(logits, v)


@jax.custom_vjp
def glimpse_attend(logits: jax.Array, v: jax.Array) -> jax.Array:
    return _dispatch(logits, v)


def _dispatch(logits, v):
    from vqa_tpu.ops import flags

    # measured on v5e (tools/check_kernels.py + bench A/B): XLA's fused
    # softmax+einsum edges out this kernel at VQA shapes (R=36 is far off the
    # 128-lane tile), so 'auto' prefers XLA here; 'on' forces the kernel.
    B = logits.shape[0]
    if flags._MODE == "on" and pallas_enabled() and B % 8 == 0:
        return _pallas_fwd(logits, v)
    return glimpse_attend_reference(logits, v)


def _fwd(logits, v):
    return _dispatch(logits, v), (logits, v)


def _bwd(residuals, g):
    logits, v = residuals
    _, vjp = jax.vjp(glimpse_attend_reference, logits, v)
    return vjp(g)


glimpse_attend.defvjp(_fwd, _bwd)
