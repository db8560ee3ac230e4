"""Fused MFB pooling (SURVEY.md C12 kernel, section 2.2).

mfb_pool(z [..., m*k], k) -> [..., m]

sum-pool over k-windows + signed-sqrt + row L2-normalize in one VMEM pass —
the elementwise tail of MFB/MFH fusion (graded config #4) without HBM
round-trips between the three stages.

Differentiable via custom_vjp (backward = vjp of the jnp reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops.flags import pallas_enabled


def mfb_pool_reference(z: jax.Array, k: int) -> jax.Array:
    """Pooling groups are STRIDED (group d sums z[..., j*m + d] for j<k), not
    contiguous: the two conventions are reparametrizations of each other via
    a permutation of the learned projection's output channels, and the
    strided layout lets the TPU kernel pool with k static slice-adds instead
    of an (unsupported in Mosaic) 3-D vector reshape."""
    m = z.shape[-1] // k
    pooled = z.reshape(z.shape[:-1] + (k, m)).sum(axis=-2)
    ss = jnp.sign(pooled) * jnp.sqrt(jnp.abs(pooled) + 1e-12)
    return ss * jax.lax.rsqrt(jnp.sum(ss * ss, axis=-1, keepdims=True) + 1e-12)


def _kernel(z_ref, out_ref, *, k: int):
    mk = z_ref.shape[-1]
    m = mk // k
    pooled = z_ref[:, 0:m].astype(jnp.float32)
    for j in range(1, k):                                   # static unroll
        pooled = pooled + z_ref[:, j * m : (j + 1) * m].astype(jnp.float32)
    ss = jnp.sign(pooled) * jnp.sqrt(jnp.abs(pooled) + 1e-12)
    norm = jax.lax.rsqrt(jnp.sum(ss * ss, axis=-1, keepdims=True) + 1e-12)
    out_ref[:] = (ss * norm).astype(out_ref.dtype)


def _pallas_fwd(z: jax.Array, k: int, block_n: int = 128) -> jax.Array:
    lead = z.shape[:-1]
    mk = z.shape[-1]
    m = mk // k
    z2 = z.reshape(-1, mk)
    n = z2.shape[0]
    block_n = min(block_n, n)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k),
        grid=(n // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, mk), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_n, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m), z.dtype),
    )(z2)
    return out.reshape(lead + (m,))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _mfb_pool_pallas(z: jax.Array, k: int) -> jax.Array:
    """Pallas forward; backward = vjp of the reference with recompute."""
    return _pallas_fwd(z, k)


def _fwd(z, k):
    return _pallas_fwd(z, k), z


def _bwd(k, z, g):
    _, vjp = jax.vjp(lambda zz: mfb_pool_reference(zz, k), z)
    return vjp(g)


_mfb_pool_pallas.defvjp(_fwd, _bwd)


def mfb_pool(z: jax.Array, k: int) -> jax.Array:
    """Measured on v5e with low-noise timing (KERNELS_r02.json): XLA's fused
    chain is ahead at config-#4 shapes (1.66 vs 2.61 ms) — the r1 "+10%"
    was tunnel noise. 'auto' keeps XLA; 'on' forces the Mosaic program.
    Only the Pallas path carries the recompute custom_vjp — the XLA path
    keeps native AD (remat trap, see ops/lstm.py)."""
    from vqa_tpu.ops import flags

    n = 1
    for s in z.shape[:-1]:
        n *= s
    if (
        flags._MODE == "on"
        and pallas_enabled()
        and n % 128 == 0
        and z.shape[-1] % k == 0
    ):
        return _mfb_pool_pallas(z, k)
    return mfb_pool_reference(z, k)
