"""Feature-table row gather (SURVEY.md C6 device path).

gather_rows(table [N, R, D], idx [B]) -> out [B, R, D]

The HBM-resident feature table is gathered by image index inside the jitted
step (engine/steps._resolve_visual). Measured best-of-N (KERNELS_r02.json,
2048x[36,2048] bf16 rows from a 1024-image table): jnp.take 4.02ms vs this
kernel 3.21ms (1.25x) — both bounded by the device's ~115GB/s random-row
HBM read rate (multi-row DMA ADR in the perf ledger), not DMA-issue
latency. This Mosaic program uses the scalar-prefetch gather pattern — the
index vector is prefetched, each grid step's BlockSpec index_map selects
table row idx[i], and Mosaic's pipeliner double-buffers the row DMAs.

Backward (rarely taken: the table is data, not params) is the vjp of the
jnp reference (scatter-add).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops.flags import pallas_enabled


def gather_rows_reference(table: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take(table, idx, axis=0)


def _kernel(idx_ref, row_ref, out_ref):
    del idx_ref  # consumed by the index_map
    out_ref[:] = row_ref[:]


# rows gathered per grid step. Measured ADR (v5e, 1024x[36,2048] bf16,
# best-of-3x30): jnp.take 3.05ms / rows=1 2.59 / rows=4 2.89 / rows=8 2.51
# / rows=16 2.62 / rows=32 VMEM-OOM. Multi-row blocks are ~neutral — the
# ~115GB/s ceiling is the device's random-row HBM read rate, not DMA issue
# latency — so 8 is kept as the (marginally) best measurement, NOT a
# claimed win over 1.
_ROWS_PER_STEP = 8


def _make_multi_kernel(rows: int):
    def kernel(idx_ref, *refs):
        del idx_ref
        row_refs, out_ref = refs[:rows], refs[rows]
        for j in range(rows):
            out_ref[j] = row_refs[j][0]

    return kernel


def _pallas_fwd(table: jax.Array, idx: jax.Array) -> jax.Array:
    B = idx.shape[0]
    tail = table.shape[1:]
    zeros = (0,) * len(tail)
    rows = _ROWS_PER_STEP if B % _ROWS_PER_STEP == 0 else 1

    def row_spec(j):
        return pl.BlockSpec(
            (1,) + tail,
            lambda i, idx_ref, j=j: (idx_ref[i * rows + j],) + zeros,
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // rows,),
        in_specs=[row_spec(j) for j in range(rows)],
        out_specs=pl.BlockSpec(
            (rows,) + tail, lambda i, idx_ref: (i,) + zeros,
            memory_space=pltpu.VMEM,
        ),
    )
    # the table rides in once per row-spec (same array -> one HBM buffer;
    # the aliases only exist so each spec can carry its own index_map)
    return pl.pallas_call(
        _make_multi_kernel(rows) if rows > 1 else _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B,) + tail, table.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=2 * B * math.prod(tail) * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(idx, *([table] * rows))


@jax.custom_vjp
def _gather_rows_pallas(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Pallas forward; backward = vjp of the reference (scatter-add)."""
    return _pallas_fwd(table, idx)


def _fwd(table, idx):
    return _pallas_fwd(table, idx), (table, idx)


def _bwd(residuals, g):
    table, idx = residuals
    _, vjp = jax.vjp(lambda t: gather_rows_reference(t, idx), table)
    return vjp(g) + (None,)


_gather_rows_pallas.defvjp(_fwd, _bwd)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    # NOTE a manual rolling-window make_async_copy variant (HBM->HBM row
    # DMAs) was attempted and crashes this image's remote Mosaic compile
    # helper in EVERY form, including a single static copy (see perf ledger
    # gotchas); the scalar-prefetch BlockSpec gather here compiles and
    # beats jnp.take by 1.25x at bench shapes (KERNELS_r02.json). The
    # custom_vjp wraps only the Pallas path; the reference path keeps
    # native AD.
    if pallas_enabled() and table.ndim >= 2 and idx.ndim == 1:
        return _gather_rows_pallas(table, idx)
    return gather_rows_reference(table, idx)
