"""GRU sequence recurrence (SURVEY.md C8 — the skip-thoughts encoder cell).

gru_seq(gx [T, B, 3H], mask [T, B, 1], wh [H, 3H], bh [3H]) ->
(h_last [B, H], seq [T, B, H])

Gate order r, z, n (torch convention; the theano skip-thoughts packing maps
onto it — importers.skipthoughts_from_theano). The input-side projection gx
(= x @ wx + bx) is hoisted into one big GEMM by models/seq2vec.GRULayer.

Train-path backward mirrors ops/lstm.py's big-matmul variant
(flags.rnn_bwd): only dh-propagation stays sequential; dwh/dbh/dgx are
computed from the stored per-step pre-activation grads as single
full-MXU-rate reductions. Forward saves gate activations so the backward
recomputes no matmuls. Gradients are bit-identical to native scan AD
(tests/test_ops.py grad-parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_seq_reference(gx: jax.Array, mask: jax.Array, wh: jax.Array, bh: jax.Array):
    hs = wh.shape[0]
    batch = gx.shape[1]
    init = jnp.zeros((batch, hs), dtype=gx.dtype)
    bh_c = bh.astype(gx.dtype)

    def step(h, inp):
        gx_t, m = inp
        gh = jnp.dot(h, wh, preferred_element_type=gx.dtype) + bh_c
        rx, zx, nx = jnp.split(gx_t, 3, axis=-1)
        rh, zh, nh = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(rx + rh)
        z = jax.nn.sigmoid(zx + zh)
        n = jnp.tanh(nx + r * nh)
        new_h = (1.0 - z) * n + z * h
        h = jnp.where(m, new_h, h)
        return h, new_h * m

    return jax.lax.scan(step, init, (gx, mask))


@jax.custom_vjp
def _gru_seq_bigmatmul(gx: jax.Array, mask: jax.Array, wh: jax.Array, bh: jax.Array):
    return gru_seq_reference(gx, mask, wh, bh)


def _bm_fwd(gx, mask, wh, bh):
    hs = wh.shape[0]
    batch = gx.shape[1]
    init = jnp.zeros((batch, hs), dtype=gx.dtype)
    bh_c = bh.astype(gx.dtype)

    def step(h, inp):
        gx_t, m = inp
        gh = jnp.dot(h, wh, preferred_element_type=gx.dtype) + bh_c
        rx, zx, nx = jnp.split(gx_t, 3, axis=-1)
        rh, zh, nh = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(rx + rh)
        z = jax.nn.sigmoid(zx + zh)
        n = jnp.tanh(nx + r * nh)
        new_h = (1.0 - z) * n + z * h
        h2 = jnp.where(m, new_h, h)
        return h2, (new_h * m, h2, r, z, n, nh)

    h_last, ys = jax.lax.scan(step, init, (gx, mask))
    seq, h_carry, r, z, n, nh = ys
    return (h_last, seq), (mask, wh, bh, h_carry, r, z, n, nh)


def _bm_bwd(residuals, grads):
    mask, wh, bh, h_carry, r, z, n, nh = residuals
    dh_last, dseq = grads
    hs = wh.shape[0]
    batch = h_carry.shape[1]
    dt = h_carry.dtype
    zero = jnp.zeros((batch, hs), dtype=dt)
    h_prev = jnp.concatenate([zero[None], h_carry[:-1]])
    wh_t = wh.T

    def step(dh, inp):
        dy, m, hp, r_t, z_t, n_t, nh_t = inp
        dnew_h = m * (dh + dy)
        dz = dnew_h * (hp - n_t)
        dn = dnew_h * (1.0 - z_t)
        dpre_n = dn * (1.0 - n_t * n_t)
        dr = dpre_n * nh_t
        dnh = dpre_n * r_t
        dpre_r = dr * r_t * (1.0 - r_t)
        dpre_z = dz * z_t * (1.0 - z_t)
        dgh = jnp.concatenate([dpre_r, dpre_z, dnh], axis=-1)
        dh_prev = (
            (1.0 - m) * dh
            + dnew_h * z_t
            + jnp.dot(dgh, wh_t, preferred_element_type=dt)
        )
        dgx_t = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
        return dh_prev, (dgx_t, dgh)

    _, (dgx, dgh) = jax.lax.scan(
        step, dh_last.astype(dt),
        (dseq, mask, h_prev, r, z, n, nh),
        reverse=True,
    )
    dwh = jnp.einsum(
        "tbh,tbg->hg", h_prev, dgh, preferred_element_type=jnp.float32
    ).astype(wh.dtype)
    # bh arrives as the RAW param (GRULayer casts it inside the cell), so
    # its cotangent must match bh's dtype, not the compute dtype — an
    # .astype(wh.dtype) here would silently round the bias grad to bf16 on
    # the bf16 path
    dbh = dgh.astype(jnp.float32).sum(axis=(0, 1)).astype(bh.dtype)
    return dgx, jnp.zeros_like(mask), dwh, dbh


_gru_seq_bigmatmul.defvjp(_bm_fwd, _bm_bwd)


def gru_seq(
    gx: jax.Array, mask: jax.Array, wh: jax.Array, bh: jax.Array,
    train: bool = False,
):
    """Dispatch: big-matmul backward on the train path (flags.rnn_bwd,
    default), native scan AD otherwise. The eval path never takes the
    custom_vjp wrapper (fusion barrier — perf ledger)."""
    from vqa_tpu.ops import flags

    if train and flags.rnn_bwd() == "bigmatmul":
        return _gru_seq_bigmatmul(gx, mask, wh, bh)
    return gru_seq_reference(gx, mask, wh, bh)
