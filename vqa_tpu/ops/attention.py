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
def _glimpse_attend_pallas(logits: jax.Array, v: jax.Array) -> jax.Array:
    """Pallas forward; backward = vjp of the reference with recompute."""
    return _pallas_fwd(logits, v)


def _fwd(logits, v):
    return _pallas_fwd(logits, v), (logits, v)


def _bwd(residuals, g):
    logits, v = residuals
    _, vjp = jax.vjp(glimpse_attend_reference, logits, v)
    return vjp(g)


_glimpse_attend_pallas.defvjp(_fwd, _bwd)


def glimpse_attend(logits: jax.Array, v: jax.Array) -> jax.Array:
    """Measured on v5e (tools/check_kernels.py + bench A/B): XLA's fused
    softmax+einsum edges out this kernel at VQA shapes (R=36 is far off the
    128-lane tile), so 'auto' prefers XLA here; 'on' forces the kernel.
    Only the Pallas path carries the recompute custom_vjp — the XLA path
    keeps native AD (remat trap, see ops/lstm.py)."""
    from vqa_tpu.ops import flags

    B = logits.shape[0]
    if flags._MODE == "on" and pallas_enabled() and B % 8 == 0:
        return _glimpse_attend_pallas(logits, v)
    return glimpse_attend_reference(logits, v)


# ---------------------------------------------------------------------------
# fused glimpse HEAD: logits Dense + softmax + weighted sum in one program
# (VERDICT r1 item 5: amortize the R=36 lane waste by fusing the whole tail)
# ---------------------------------------------------------------------------


def glimpse_head_reference(joint: jax.Array, w: jax.Array, b: jax.Array, v: jax.Array):
    """joint [B, R, M], w [M, G], b [G], v [B, R, D] ->
    (attended [B, G, D], logits [B, R, G])."""
    logits = jnp.dot(joint, w, preferred_element_type=joint.dtype) + b
    return glimpse_attend_reference(logits, v), logits


def _head_kernel(joint_ref, w_ref, b_ref, v_ref, out_ref, logits_ref):
    joint = joint_ref[:].astype(jnp.float32)                 # [bB, R, M]
    w = w_ref[:].astype(jnp.float32)                          # [M, G]
    logits = jax.lax.dot_general(
        joint, w,
        dimension_numbers=(((2,), (0,)), ((), ())),           # [bB, R, G]
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    alpha = e / jnp.sum(e, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        alpha.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),       # [bB, G, D]
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.astype(out_ref.dtype)
    logits_ref[:] = logits.astype(logits_ref.dtype)


def _head_pallas(joint, w, b, v, block_b: int = 8):
    B, R, M = joint.shape
    G = w.shape[-1]
    D = v.shape[-1]
    b2 = b.reshape(1, G)
    return pl.pallas_call(
        _head_kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, R, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, R, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, G, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, R, G), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, G, D), v.dtype),
            jax.ShapeDtypeStruct((B, R, G), joint.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * M * G + 2 * B * R * G * D,
            bytes_accessed=(joint.size + v.size) * joint.dtype.itemsize,
            transcendentals=B * R * G,
        ),
    )(joint, w, b2, v)


@jax.custom_vjp
def _glimpse_head_pallas(joint, w, b, v):
    """Pallas forward; backward = vjp of the reference with recompute."""
    return _head_pallas(joint, w, b, v)


def _head_fwd(joint, w, b, v):
    return _head_pallas(joint, w, b, v), (joint, w, b, v)


def _head_bwd(residuals, g):
    joint, w, b, v = residuals
    _, vjp = jax.vjp(glimpse_head_reference, joint, w, b, v)
    return vjp(g)


_glimpse_head_pallas.defvjp(_head_fwd, _head_bwd)


def glimpse_head(joint: jax.Array, w: jax.Array, b: jax.Array, v: jax.Array):
    """Fused glimpse tail. Dispatch mirrors glimpse_attend: measured on v5e
    the XLA chain stays ahead at R=36 (see KERNELS_r02 + perf ledger), so
    'auto' uses XLA and 'on' forces the Mosaic program. Only the Pallas path
    carries the recompute custom_vjp — the XLA path keeps native AD so its
    backward reuses stored residuals (same remat trap as ops/lstm.py)."""
    from vqa_tpu.ops import flags

    B, R, M = joint.shape
    # the joint tile [bB, R, M] + v tile must fit VMEM next to Mosaic's
    # double buffers; at flagship dims (R=36, M=510, D=2048) block 8 is ~2MB
    if (
        flags._MODE == "on"
        and pallas_enabled()
        and B % 8 == 0
        and (R * M + R * v.shape[-1]) * 8 * joint.dtype.itemsize < 6 * 1024 * 1024
    ):
        return _glimpse_head_pallas(joint, w, b, v)
    return glimpse_head_reference(joint, w, b, v)
