"""Question encoders (SURVEY.md C8).

Embedding + multi-layer LSTM/GRU over padded token ids via a time-major
``lax.scan`` (flax ``nn.scan``), with masked carry updates so the final carry
*is* the last-valid-timestep state for right-padded batches — the TPU-native
replacement for cuDNN's variable-length RNN path (no gather, no dynamic
shapes, fully fused under jit).

Gate layout matches the torch cuDNN convention (i, f, g, o for LSTM; r, z, n
for GRU) so torch-CPU oracle tests can check numerics weight-for-weight
(SURVEY.md section 7 "cuDNN-LSTM vs scan-LSTM numerics").

The reference lineage also supports pretrained skip-thoughts encoders; those
weights are unobtainable offline, so ``arch: skipthoughts`` maps to the same
LSTM with the skip-thoughts dimensions (620 emb / 2400 hidden) trained from
scratch — divergence documented in SURVEY.md section 7 "Hard parts".
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMCell(nn.Module):
    """Fused-gate LSTM cell: one [D, 4H] and one [H, 4H] matmul per step."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array, jax.Array], x: jax.Array):
        h, c = carry
        hs = self.hidden_size
        wx = self.param("wx", nn.initializers.lecun_normal(), (x.shape[-1], 4 * hs))
        wh = self.param("wh", nn.initializers.orthogonal(), (hs, 4 * hs))
        b = self.param("b", nn.initializers.zeros, (4 * hs,))
        gates = (
            jnp.dot(x, wx.astype(self.dtype), preferred_element_type=self.dtype)
            + jnp.dot(h, wh.astype(self.dtype), preferred_element_type=self.dtype)
            + b.astype(self.dtype)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return (new_h, new_c), new_h


class GRUCell(nn.Module):
    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry: jax.Array, x: jax.Array):
        h = carry
        hs = self.hidden_size
        wx = self.param("wx", nn.initializers.lecun_normal(), (x.shape[-1], 3 * hs))
        wh = self.param("wh", nn.initializers.orthogonal(), (hs, 3 * hs))
        bx = self.param("bx", nn.initializers.zeros, (3 * hs,))
        bh = self.param("bh", nn.initializers.zeros, (3 * hs,))
        gx = jnp.dot(x, wx.astype(self.dtype), preferred_element_type=self.dtype) + bx.astype(self.dtype)
        gh = jnp.dot(h, wh.astype(self.dtype), preferred_element_type=self.dtype) + bh.astype(self.dtype)
        rx, zx, nx = jnp.split(gx, 3, axis=-1)
        rh, zh, nh = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(rx + rh)
        z = jax.nn.sigmoid(zx + zh)
        n = jnp.tanh(nx + r * nh)
        return (1.0 - z) * n + z * h, (1.0 - z) * n + z * h


def _masked_scan_lstm(cell: LSTMCell, emb: jax.Array, mask: jax.Array):
    """Time-major masked scan. Carry freezes once mask goes 0 (right pad)."""
    batch, _ = emb.shape[1], emb.shape[0]
    hs = cell.hidden_size
    init = (
        jnp.zeros((batch, hs), dtype=cell.dtype),
        jnp.zeros((batch, hs), dtype=cell.dtype),
    )

    scan = nn.scan(
        _MaskedStep,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=0,
        out_axes=0,
    )(cell)
    (h_last, _), seq = scan(init, (emb, mask))
    return h_last, seq


class _MaskedStep(nn.Module):
    cell: nn.Module

    @nn.compact
    def __call__(self, carry, xs):
        x, m = xs  # x: [B, D], m: [B, 1]
        new_carry, y = self.cell(carry, x)
        if isinstance(carry, tuple):
            kept = tuple(jnp.where(m, n, o) for n, o in zip(new_carry, carry))
        else:
            kept = jnp.where(m, new_carry, carry)
        return kept, y * m


class SeqEncoder(nn.Module):
    """tokens [B, T] int32, lengths [B] -> sentence vector [B, H]
    (or hidden sequence [B, T, H] when return_sequence)."""

    vocab_size: int
    emb_size: int = 620
    hidden_size: int = 2400
    num_layers: int = 1
    dropout: float = 0.0
    cell: str = "lstm"  # 'lstm' | 'gru'
    return_sequence: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, lengths: Optional[jax.Array] = None, train: bool = False):
        if lengths is None:
            lengths = (tokens != 0).sum(axis=-1)
        emb = nn.Embed(self.vocab_size, self.emb_size, dtype=self.dtype, name="embed")(tokens)
        emb = nn.Dropout(self.dropout, deterministic=not train)(emb)
        x = jnp.swapaxes(emb, 0, 1)  # [T, B, E]
        t_idx = jnp.arange(x.shape[0], dtype=jnp.int32)
        mask = (t_idx[:, None] < lengths[None, :]).astype(self.dtype)[..., None]  # [T,B,1]

        h_last = None
        for layer in range(self.num_layers):
            if self.cell == "lstm":
                cell = LSTMCell(self.hidden_size, dtype=self.dtype, name=f"lstm_{layer}")
                h_last, x = _masked_scan_lstm(cell, x, mask)
            elif self.cell == "gru":
                cell = GRUCell(self.hidden_size, dtype=self.dtype, name=f"gru_{layer}")
                init = jnp.zeros((x.shape[1], self.hidden_size), dtype=self.dtype)
                scan = nn.scan(
                    _MaskedStep,
                    variable_broadcast="params",
                    split_rngs={"params": False},
                    in_axes=0,
                    out_axes=0,
                )(cell)
                h_last, x = scan(init, (x, mask))
            else:
                raise ValueError(f"unknown cell {self.cell!r}")
            if layer + 1 < self.num_layers:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if self.return_sequence:
            return jnp.swapaxes(x, 0, 1)  # [B, T, H], padded steps zeroed
        return h_last


def factory(vocab_size: int, opt: Dict[str, Any], dtype=jnp.float32) -> SeqEncoder:
    """Build a question encoder from the model.seq2vec config dict."""
    arch = opt.get("arch", "lstm")
    if arch == "skipthoughts":
        # offline stand-in: skip-thoughts dims, trained from scratch (see module doc)
        return SeqEncoder(
            vocab_size=vocab_size,
            emb_size=opt.get("emb_size", 620),
            hidden_size=opt.get("hidden_size", 2400),
            num_layers=1,
            dropout=opt.get("dropout", 0.0),
            cell="gru",
            return_sequence=opt.get("return_sequence", False),
            dtype=dtype,
        )
    if arch in ("lstm", "gru"):
        return SeqEncoder(
            vocab_size=vocab_size,
            emb_size=opt.get("emb_size", 620),
            hidden_size=opt.get("hidden_size", 1024),
            num_layers=opt.get("num_layers", 1),
            dropout=opt.get("dropout", 0.0),
            cell=arch,
            return_sequence=opt.get("return_sequence", False),
            dtype=dtype,
        )
    raise KeyError(f"unknown seq2vec arch {arch!r}")
