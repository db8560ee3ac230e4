"""Fused LSTM sequence kernel (SURVEY.md C8 kernel, section 2.2).

lstm_seq(xg [T, B, 4H], mask [T, B, 1], wh [H, 4H]) -> (h_last [B, H],
seq [T, B, H])

The input-side projection xg is precomputed by one big GEMM (see
models/seq2vec.py); this kernel runs the whole recurrence for a batch tile
in one Mosaic program: the recurrent weights stay VMEM-resident across all
T steps (for the hidden sizes of graded configs #1/#4/#5, wh fits VMEM),
h/c live in VMEM scratch, and each step is one MXU matmul + VPU gates.

Honest engineering note (measured, see tests/test_ops.py + bench history):
for our shapes XLA's scan is already compute-bound at the device's sustained
matmul rate, so this kernel is about latency (one program vs 26 dispatched
loop bodies) and the component contract, not a FLOP win. The jnp reference
(models/seq2vec.LSTMLayer) stays the default where it measures equal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops.flags import pallas_enabled

# wh bigger than this doesn't fit VMEM next to the working set once Mosaic
# double-buffers the grid blocks (measured OOM behavior on v5e: constant-
# index-map blocks are buffered x2 like any other block)
MAX_VMEM_WH_BYTES = 3 * 1024 * 1024


def lstm_seq_reference(xg: jax.Array, mask: jax.Array, wh: jax.Array):
    hs = wh.shape[0]
    batch = xg.shape[1]
    init = (
        jnp.zeros((batch, hs), dtype=xg.dtype),
        jnp.zeros((batch, hs), dtype=xg.dtype),
    )

    def step(carry, inp):
        h, c = carry
        xg_t, m = inp
        gates = xg_t + jnp.dot(h, wh, preferred_element_type=xg.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        h = jnp.where(m, new_h, h)
        c = jnp.where(m, new_c, c)
        return (h, c), new_h * m

    (h_last, _), seq = jax.lax.scan(step, init, (xg, mask))
    return h_last, seq


def _kernel(xg_ref, mask_ref, wh_ref, hlast_ref, seq_ref, h_scr, c_scr):
    T = xg_ref.shape[0]
    H = wh_ref.shape[0]
    h_scr[:] = jnp.zeros_like(h_scr)
    c_scr[:] = jnp.zeros_like(c_scr)
    wh = wh_ref[:]

    def step(t, _):
        xg_t = xg_ref[t]                                    # [bB, 4H]
        # arithmetic masking: bf16 compares are unsupported on this target,
        # so blend with the 0/1 mask via multiplies (m frozen past length)
        m = mask_ref[t].astype(jnp.float32)                 # [bB, 1]
        h = h_scr[:]
        # all gate math in f32 (Mosaic requires a 32-bit matmul accumulator,
        # and mixed f32/bf16 elementwise trips its verifier); cast at stores
        gates = xg_t.astype(jnp.float32) + jnp.dot(
            h, wh, preferred_element_type=jnp.float32
        )
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c_old = c_scr[:].astype(jnp.float32)
        new_c = f * c_old + i * g
        new_h = o * jnp.tanh(new_c)
        h_old = h.astype(jnp.float32)
        dt = h_scr.dtype
        h_scr[:] = (m * new_h + (1.0 - m) * h_old).astype(dt)
        c_scr[:] = (m * new_c + (1.0 - m) * c_old).astype(dt)
        seq_ref[t] = (m * new_h).astype(dt)
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    hlast_ref[:] = h_scr[:]


def _pallas_fwd(xg: jax.Array, mask: jax.Array, wh: jax.Array, block_b: int = 128):
    T, B, G4 = xg.shape
    H = wh.shape[0]
    block_b = min(block_b, B)
    grid = (B // block_b,)
    mask = mask.astype(xg.dtype)
    h_last, seq = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, block_b, G4), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block_b, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, block_b, H), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H), xg.dtype),
            jax.ShapeDtypeStruct((T, B, H), xg.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, H), xg.dtype),
            pltpu.VMEM((block_b, H), xg.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * B * H * G4,
            bytes_accessed=xg.size * xg.dtype.itemsize + wh.size * wh.dtype.itemsize,
            transcendentals=4 * T * B * H,
        ),
    )(xg, mask, wh)
    return h_last, seq


def _vmem_budget_block_b(T: int, H: int, itemsize: int) -> int:
    """Largest power-of-two batch tile fitting ~13MB VMEM, with Mosaic's x2
    grid-pipelining buffers on every block (including the constant-map wh)."""
    wh_bytes = 2 * H * 4 * H * itemsize
    budget = 13 * 1024 * 1024 - wh_bytes
    per_row = 2 * (T * 4 * H + T * H) * itemsize + 3 * H * itemsize  # xg+seq x2, scratch
    for bb in (256, 128, 64, 32, 16, 8):
        if bb * per_row <= budget:
            return bb
    return 0


def _pallas_block_b(xg: jax.Array, wh: jax.Array) -> int:
    """Batch tile for the Mosaic program, or 0 when it should not dispatch.

    Dispatch policy (measured, KERNELS_r02.json best-of-N): the Mosaic
    kernel only ever TIES XLA's scan (1.55 vs 1.56 ms at H=512) and XLA
    runs 140 TFLOPs (device rate) at the flagship H=2400 where wh (46MB)
    exceeds VMEM anyway. 'auto' therefore keeps XLA; 'on' forces the
    kernel."""
    from vqa_tpu.ops import flags

    T, B, _ = xg.shape
    H = wh.shape[0]
    wh_bytes = H * 4 * H * wh.dtype.itemsize
    if flags._MODE != "on":
        return 0
    if not (pallas_enabled() and wh_bytes <= MAX_VMEM_WH_BYTES):
        return 0
    bb = _vmem_budget_block_b(T, H, xg.dtype.itemsize)
    bb = min(bb, B)  # small batches take one grid cell, not a fallback
    return bb if (bb and B % bb == 0) else 0


@jax.custom_vjp
def _lstm_seq_pallas(xg: jax.Array, mask: jax.Array, wh: jax.Array):
    """Pallas forward; backward = vjp of the jnp reference with recompute
    (rematerialized recurrence — same memory profile as jax.checkpoint)."""
    return _pallas_fwd(xg, mask, wh, block_b=_pallas_block_b(xg, wh))


def _fwd(xg, mask, wh):
    return _lstm_seq_pallas(xg, mask, wh), (xg, mask, wh)


def _bwd(residuals, g):
    xg, mask, wh = residuals
    _, vjp = jax.vjp(lstm_seq_reference, xg, mask, wh)
    return vjp(g)


_lstm_seq_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# hand-written "big-matmul" backward (train path option)
#
# XLA's native scan AD runs TWO sequential GEMMs per backward step — the
# dh propagation [B,4H]x[4H,H] AND the weight-grad outer product
# [H,B]x[B,4H] accumulated into a [H,4H] carry that round-trips HBM every
# step (46MB at H=2400). This variant keeps ONLY dh propagation in the
# reverse scan, stores the per-step pre-activation gate grads, and computes
# BOTH weight-side grads afterwards as single full-MXU-rate GEMMs:
#     dwh = h_prev[T,B,H] (x) dgates[T,B,4H]   (one [H, T*B]x[T*B, 4H])
#     dxg = dgates                              (identity)
# Forward saves the gate activations (i,f,g,o,tanh(c)) so the backward
# recomputes NO matmuls (the remat trap, see lstm_seq docstring).
# PROFILE_r02.json located the train step's headroom exactly here
# (bwd:fwd = 2.7 vs the ideal 2.0).
# --------------------------------------------------------------------------



@jax.custom_vjp
def _lstm_seq_bigmatmul(xg: jax.Array, mask: jax.Array, wh: jax.Array):
    return lstm_seq_reference(xg, mask, wh)


def _bm_fwd(xg, mask, wh):
    hs = wh.shape[0]
    batch = xg.shape[1]
    zero = jnp.zeros((batch, hs), dtype=xg.dtype)

    def step(carry, inp):
        h, c = carry
        xg_t, m = inp
        gates = xg_t + jnp.dot(h, wh, preferred_element_type=xg.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        new_c = f * c + i * g
        tc = jnp.tanh(new_c)
        new_h = o * tc
        h2 = jnp.where(m, new_h, h)
        c2 = jnp.where(m, new_c, c)
        return (h2, c2), (new_h * m, h2, c2, i, f, g, o, tc)

    (h_last, _), ys = jax.lax.scan(step, (zero, zero), (xg, mask))
    seq, h_carry, c_carry, i, f, g, o, tc = ys
    return (h_last, seq), (mask, wh, h_carry, c_carry, i, f, g, o, tc)


def _bm_bwd(residuals, grads):
    mask, wh, h_carry, c_carry, i, f, g, o, tc = residuals
    dh_last, dseq = grads
    hs = wh.shape[0]
    batch = h_carry.shape[1]
    dt = h_carry.dtype
    zero = jnp.zeros((batch, hs), dtype=dt)
    # step t consumed carry (h_{t-1}, c_{t-1}): shift the stored carries
    h_prev = jnp.concatenate([zero[None], h_carry[:-1]])
    c_prev = jnp.concatenate([zero[None], c_carry[:-1]])
    wh_t = wh.T

    def step(carry, inp):
        dh, dc = carry
        dy, m, cp, i_t, f_t, g_t, o_t, tc_t = inp
        dnew_h = m * (dh + dy)           # y_t = new_h*m; h2 = m?new_h:h
        dnew_c = m * dc + dnew_h * o_t * (1.0 - tc_t * tc_t)
        dgi = (dnew_c * g_t) * i_t * (1.0 - i_t)
        dgf = (dnew_c * cp) * f_t * (1.0 - f_t)
        dgg = (dnew_c * i_t) * (1.0 - g_t * g_t)
        dgo = (dnew_h * tc_t) * o_t * (1.0 - o_t)
        dgates = jnp.concatenate([dgi, dgf, dgg, dgo], axis=-1)
        dh_prev = (1.0 - m) * dh + jnp.dot(
            dgates, wh_t, preferred_element_type=dt
        )
        dc_prev = (1.0 - m) * dc + dnew_c * f_t
        return (dh_prev, dc_prev), dgates

    (dh0, _), dgates = jax.lax.scan(
        step, (dh_last.astype(dt), zero),
        (dseq, mask, c_prev, i, f, g, o, tc),
        reverse=True,
    )
    del dh0
    # both weight-side grads as ONE full-rate GEMM each (no per-step
    # [H,4H] accumulator round-tripping HBM inside the scan)
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev, dgates, preferred_element_type=jnp.float32
    ).astype(wh.dtype)
    return dgates, jnp.zeros_like(mask), dwh


_lstm_seq_bigmatmul.defvjp(_bm_fwd, _bm_bwd)


def lstm_seq(xg: jax.Array, mask: jax.Array, wh: jax.Array, train: bool = False):
    """Dispatch: Pallas on TPU when wh + tile fit VMEM, else jnp scan.

    Only the Pallas path carries a custom_vjp (its backward recomputes via
    the reference). The XLA-scan path uses NATIVE autodiff so the backward
    reuses stored scan residuals — wrapping it in the remat vjp costs a full
    extra forward, measured ~20% of the flagship (H=2400) train step.

    ``train=True`` + ``flags.rnn_bwd() == 'bigmatmul'`` (the default) swaps
    in the hand-written big-matmul backward (see above); the eval path never
    takes the custom_vjp wrapper (it is a fusion barrier even
    un-differentiated — measured ~15% eval, perf ledger). Forced-kernel
    mode (``engine.pallas: on``) takes precedence so a kernel A/B measures
    the kernel, not the bigmatmul XLA path."""
    from vqa_tpu.ops import flags

    if _pallas_block_b(xg, wh):
        return _lstm_seq_pallas(xg, mask, wh)
    if train and flags.rnn_bwd() == "bigmatmul":
        return _lstm_seq_bigmatmul(xg, mask, wh)
    return lstm_seq_reference(xg, mask, wh)
