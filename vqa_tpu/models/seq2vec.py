"""Question encoders (SURVEY.md C8).

Embedding + multi-layer LSTM/GRU over padded token ids — the TPU-native
replacement for cuDNN's variable-length RNN path:

  * the input-side gate projection for ALL timesteps is hoisted out of the
    recurrence into one [B*T, E] x [E, 4H] GEMM (MXU-shaped; the same
    batching trick cuDNN applies), so the ``lax.scan`` body is just the
    recurrent [B, H] x [H, 4H] matmul + elementwise gates;
  * masked carry updates make the final carry the last-valid-timestep state
    for right-padded batches — no gather, no dynamic shapes;
  * the scan body can be swapped for the fused Pallas LSTM-cell kernel
    (vqa_tpu.ops.lstm) behind the same parameters.

Gate layout matches the torch cuDNN convention (i, f, g, o for LSTM;
r, z, n for GRU) so torch-CPU oracle tests check numerics weight-for-weight
(SURVEY.md section 7 "cuDNN-LSTM vs scan-LSTM numerics").

The reference lineage also supports pretrained skip-thoughts encoders; those
weights are unobtainable offline, so ``arch: skipthoughts`` maps to the same
encoder with the skip-thoughts dimensions (620 emb / 2400 hidden GRU) trained
from scratch — divergence documented in SURVEY.md section 7 "Hard parts".
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMLayer(nn.Module):
    """Scan LSTM over a full (time-major) sequence with hoisted x-projection.

    x [T, B, E], mask [T, B, 1] -> (h_last [B, H], seq [T, B, H])
    """

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool = False):
        hs = self.hidden_size
        wx = self.param("wx", nn.initializers.lecun_normal(), (x.shape[-1], 4 * hs))
        wh = self.param("wh", nn.initializers.orthogonal(), (hs, 4 * hs))
        b = self.param("b", nn.initializers.zeros, (4 * hs,))
        wx = wx.astype(self.dtype)
        wh = wh.astype(self.dtype)

        # input-side projection for all T steps in one GEMM
        xg = (
            jnp.einsum("tbe,eg->tbg", x, wx, preferred_element_type=self.dtype)
            + b.astype(self.dtype)
        )
        # recurrence: fused Pallas kernel on TPU (VMEM-resident wh), jnp scan
        # reference elsewhere — same math either way (vqa_tpu.ops.lstm);
        # train selects the backward implementation (ops.flags.set_rnn_bwd)
        from vqa_tpu.ops.lstm import lstm_seq

        return lstm_seq(xg, mask, wh, train=train)


class GRULayer(nn.Module):
    """Scan GRU with hoisted x-projection (gate order r, z, n like torch)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, train: bool = False):
        hs = self.hidden_size
        wx = self.param("wx", nn.initializers.lecun_normal(), (x.shape[-1], 3 * hs))
        wh = self.param("wh", nn.initializers.orthogonal(), (hs, 3 * hs))
        bx = self.param("bx", nn.initializers.zeros, (3 * hs,))
        bh = self.param("bh", nn.initializers.zeros, (3 * hs,))
        wx = wx.astype(self.dtype)
        wh = wh.astype(self.dtype)

        gx = (
            jnp.einsum("tbe,eg->tbg", x, wx, preferred_element_type=self.dtype)
            + bx.astype(self.dtype)
        )
        # recurrence in vqa_tpu.ops.gru; train selects the backward
        # implementation (ops.flags.rnn_bwd, as in LSTMLayer)
        from vqa_tpu.ops.gru import gru_seq

        return gru_seq(gx, mask, wh, bh, train=train)


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
        emb = nn.Embed(self.vocab_size, self.emb_size, dtype=self.dtype, name="embed")(tokens)
        emb = nn.Dropout(self.dropout, deterministic=not train)(emb)
        x = jnp.swapaxes(emb, 0, 1)  # [T, B, E]
        # mask from token ids (0 is strictly <pad>): correct for BOTH padding
        # sides — with left padding the carry stays zero through the pad
        # prefix and the final carry is still the last real step
        mask = (tokens != 0).astype(self.dtype).T[..., None]  # [T, B, 1]

        h_last = None
        for layer in range(self.num_layers):
            if self.cell == "lstm":
                h_last, x = LSTMLayer(self.hidden_size, self.dtype, name=f"lstm_{layer}")(
                    x, mask, train=train
                )
            elif self.cell == "gru":
                h_last, x = GRULayer(self.hidden_size, self.dtype, name=f"gru_{layer}")(
                    x, mask, train=train
                )
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
