"""Device mesh + sharding rules (SURVEY.md section 2.3).

Default layout: a 2-D mesh ('data', 'model') with every chip on the data
axis. VQA models are small (the whole parameter set fits per-chip), so data
parallelism is the graded strategy; the 'model' axis exists as the design
seam for tensor sharding (SURVEY.md 2.3 TP row) and stays size 1 unless
requested.

Under jit: batch arrays are sharded P('data') on their leading axis, the
train state is replicated P(). XLA inserts the gradient all-reduce (psum)
over ICI automatically — that is the whole distributed backend (section 5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for input arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    return jax.device_put(batch, batch_sharding(mesh))


def shard_state(state, mesh: Mesh):
    """Replicate the train state across the mesh (params fit per chip)."""
    return jax.device_put(state, replicated(mesh))


def table_format(sharding, ndim: int = 3):
    """Row-major put Format for device-resident feature tables.

    The PJRT default device_put layout for a ``[N, 36, 2048]`` table is
    ``major_to_minor=(1, 0, 2)``, but every compiled eval/train step consumes
    the table in canonical row-major ``(0, 1, 2)`` — so XLA inserts a
    FULL-TABLE relayout copy inside each executable. Invisible at toy scale;
    fatal at trainval scale: the ~9GB int8 capacity table OOMs a 16GB v5e
    because the in-program copy doubles residency (measured r4 at 20k
    images: HLO temp 1.65GB -> 0.475GB once the put layout matches the
    program). Putting row-major makes entry layout == program layout: no
    per-call copy, no double residency. Tiling is left to the backend
    default for the dtype (canonical compact tiling)."""
    from jax.experimental.layout import Format, Layout

    return Format(Layout(major_to_minor=tuple(range(ndim))), sharding)


# Above this many bytes, device_put is assumed to silently drop the custom
# layout (see put_table) and the streaming path is taken directly. Probed on
# the r4 image: a 4.4GB int8 put honors the requested row-major Format, a
# 9.1GB put silently commits the PJRT default (1, 0, 2) instead — consistent
# with a transfer-then-relayout implementation that skips the relayout when
# the 2x-table transient would not fit HBM. Env-overridable for other images.
_STREAM_PUT_BYTES = int(
    __import__("os").environ.get("VQA_TPU_STREAM_PUT_BYTES", 6 * 1024**3)
)


def _streamed_put(table, fmt, chunk_bytes=1 << 30):
    """Upload a huge host table into an on-device row-major buffer without
    ever holding 2x the table in HBM: allocate a zeros accumulator directly
    in the target Format (on-device, no transfer), then stream ~1GB row
    slabs through device_put + a DONATED dynamic_update_slice (in-place —
    peak residency = table + one slab). Replicated-sharding tables only;
    row-sharded tables keep per-device shards small enough for direct put."""
    import jax.numpy as jnp

    shape, dtype = table.shape, table.dtype
    rows_per_chunk = max(1, int(chunk_bytes // max(1, table.nbytes // shape[0])))
    acc = jax.jit(lambda: jnp.zeros(shape, dtype), out_shardings=fmt)()

    @partial(jax.jit, donate_argnums=0, out_shardings=fmt)
    def update(a, slab, start):
        zeros = (jnp.int32(0),) * (a.ndim - 1)
        return jax.lax.dynamic_update_slice(a, slab, (start,) + zeros)

    for start in range(0, shape[0], rows_per_chunk):
        slab = jax.device_put(table[start : start + rows_per_chunk], fmt.sharding)
        acc = update(acc, slab, np.int32(start))
    return acc


def put_table(table, sharding):
    """device_put a feature-table array in the canonical row-major layout
    (see table_format) under the given sharding.

    Large tables stream (see _streamed_put): on this image device_put
    SILENTLY ignores a custom Format above ~somewhere in (4.4, 9.1] GB —
    the committed array comes back in the PJRT default (1, 0, 2) layout,
    and the next compiled step then embeds a full-table relayout copy to
    feed the row-major-operand Mosaic gather, which OOMs a 16GB v5e at
    trainval scale (root-caused r4 session 17; the r4s10 row-major put fix
    was validated at 20k images, below the drop threshold). The committed
    layout is verified after every direct put so a drop can never silently
    re-introduce the in-program copy."""
    ndim = np.ndim(table)
    fmt = table_format(sharding, ndim)
    replicated_spec = getattr(sharding, "spec", None) == P()
    if replicated_spec and getattr(table, "nbytes", 0) > _STREAM_PUT_BYTES:
        return _streamed_put(table, fmt)
    out = jax.device_put(table, fmt)
    got = out.format.layout.major_to_minor
    if got != tuple(range(ndim)):
        if not replicated_spec:
            import warnings

            warnings.warn(
                f"device_put dropped the row-major table layout (got {got}) "
                "for a sharded table; compiled steps will carry a per-shard "
                "relayout copy. Lower per-device shard bytes or raise "
                "VQA_TPU_STREAM_PUT_BYTES handling."
            )
            return out
        out.delete()
        return _streamed_put(table, fmt)
    return out


def put_replicated_table(table, mesh: Mesh):
    """Replicate a feature table across the mesh, row-major (table_format)."""
    return put_table(table, replicated(mesh))


def shard_feature_table(table, mesh: Mesh):
    """Row-shard a feature table over every mesh device (flattened 'data' x
    'model' axes) for tables bigger than one chip's HBM
    (engine.features_sharded). Rows are padded to the device count; the pad
    rows are never indexed. The gather inside the jitted step is partitioned
    by XLA (local gather + collective) — see steps.make_*_step."""
    import numpy as np

    table = np.asarray(table)  # ml_dtypes covers bf16 as a numpy dtype
    n_dev = mesh.size
    pad = (-table.shape[0]) % n_dev
    if pad:
        table = np.concatenate(
            [table, np.zeros((pad,) + table.shape[1:], table.dtype)], axis=0
        )
    return put_table(table, NamedSharding(mesh, P(("data", "model"))))


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    n = mesh.shape["data"]
    if batch_size % n:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by data-parallel size {n}"
        )
