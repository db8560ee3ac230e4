"""Fused CoR relation core (SURVEY.md C13 kernel, section 2.2).

relation_attend(pg [B, N, D], r [B, N, D]) -> absorbed [B, N, D]

One Mosaic program per batch tile for the factorized pairwise-relation
attention inside each CoR step:

    s_ij  = <pg_i, r_j> / sqrt(D)      (one batched MXU matmul, no [B,N,N,D])
    alpha = softmax_j(s)
    out_i = sum_j alpha_ij r_j          (second batched MXU matmul)

The jnp reference is the oracle, the CPU path, and the custom_vjp backward.
Dispatch policy: measured on v5e (KERNELS_r02.json) — XLA's fused chain is
ahead at N=36 (both pair axes far off the 128 lane/sublane tiles), so 'auto'
prefers XLA and 'on' forces the kernel, mirroring the glimpse head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops.flags import pallas_enabled


def relation_attend_reference(pg: jax.Array, r: jax.Array) -> jax.Array:
    d = pg.shape[-1]
    s = jnp.einsum("bnd,bmd->bnm", pg, r) * jax.lax.rsqrt(jnp.asarray(float(d), pg.dtype))
    alpha = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", alpha, r)


def _kernel(pg_ref, r_ref, out_ref):
    pg = pg_ref[:].astype(jnp.float32)                      # [bB, N, D]
    r = r_ref[:].astype(jnp.float32)
    d = pg.shape[-1]
    s = jax.lax.dot_general(
        pg, r,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),      # [bB, N, N]
        preferred_element_type=jnp.float32,
    ) * jax.lax.rsqrt(jnp.asarray(float(d), jnp.float32))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    alpha = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        alpha, r,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),      # [bB, N, D]
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _pallas_fwd(pg: jax.Array, r: jax.Array, block_b: int = 8) -> jax.Array:
    B, N, D = pg.shape
    return pl.pallas_call(
        _kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, D), pg.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * N * D,
            bytes_accessed=2 * pg.size * pg.dtype.itemsize,
            transcendentals=B * N * N,
        ),
    )(pg, r)


@jax.custom_vjp
def _relation_attend_pallas(pg: jax.Array, r: jax.Array) -> jax.Array:
    """Pallas forward; backward = vjp of the reference with recompute."""
    return _pallas_fwd(pg, r)


def _fwd(pg, r):
    return _pallas_fwd(pg, r), (pg, r)


def _bwd(residuals, g):
    pg, r = residuals
    _, vjp = jax.vjp(relation_attend_reference, pg, r)
    return vjp(g)


_relation_attend_pallas.defvjp(_fwd, _bwd)


def relation_attend(pg: jax.Array, r: jax.Array) -> jax.Array:
    """Only the Pallas path carries the recompute custom_vjp; the default
    XLA path keeps native AD so the CoR chain's backward reuses stored
    residuals instead of re-running the relation forward (the remat trap
    measured and fixed for ops/lstm.py)."""
    from vqa_tpu.ops import flags

    B, N, D = pg.shape
    if (
        flags._MODE == "on"
        and pallas_enabled()
        and B % 8 == 0
        and 2 * N * D * 8 * pg.dtype.itemsize < 6 * 1024 * 1024
    ):
        return _relation_attend_pallas(pg, r)
    return relation_attend_reference(pg, r)
