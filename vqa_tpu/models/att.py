"""Question-guided glimpse attention + attention-family models (SURVEY.md C10).

The glimpse head fuses the (broadcast) question vector with every region,
projects to G glimpse logits, softmaxes over regions, and takes G weighted
sums — one fused XLA graph of batched matmuls (MXU) + softmax; the Pallas
fused variant (vqa_tpu.ops.attention) slots in behind the same math.

Model forward contract (SURVEY.md 3.3):
  model(visual [B, R, Dv], question int[B, T]) -> logits [B, nans]
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqa_tpu.models.classifier import Classifier
from vqa_tpu.models.fusion import _ACT, l2_normalize
from vqa_tpu.models.seq2vec import SeqEncoder


class _GlimpseTail(nn.Module):
    """Logits Dense + softmax-over-regions + weighted sums, dispatched to the
    fused Mosaic program (ops.attention.glimpse_head) behind the same params
    as an nn.Dense — the param tree stays {kernel, bias} so checkpoints and
    oracles are layout-identical to the unfused head."""

    nb_glimpses: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, joint: jax.Array, v: jax.Array):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (joint.shape[-1], self.nb_glimpses)
        )
        b = self.param("bias", nn.initializers.zeros, (self.nb_glimpses,))
        from vqa_tpu.ops.attention import glimpse_head

        return glimpse_head(joint, w.astype(self.dtype), b.astype(self.dtype), v)


class GlimpseAttention(nn.Module):
    """q [B, Dq], v [B, R, Dv] -> (attended [B, G*Dv], alpha [B, R, G])."""

    fusion: nn.Module          # scoring fusion, applied per region
    nb_glimpses: int = 1
    dim_h: Optional[int] = None  # optional hidden projection before logits
    activation: str = "tanh"
    dropout_mm: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, v: jax.Array, train: bool = False):
        joint = self.fusion(q[:, None, :], v, train=train)   # [B, R, Dz]
        if isinstance(joint, tuple):  # MFB-style fusions return (pooled, pre_pool)
            joint = joint[0]
        joint = nn.Dropout(self.dropout_mm, deterministic=not train)(joint)
        if self.dim_h is not None:
            joint = _ACT[self.activation](
                nn.Dense(self.dim_h, dtype=self.dtype, name="hidden")(joint)
            )
        # fused logits+softmax+weighted-sum tail (vqa_tpu.ops.attention);
        # alpha is only materialized when a caller consumes it (XLA DCE)
        attended, logits = _GlimpseTail(
            self.nb_glimpses, dtype=self.dtype, name="glimpse_logits"
        )(joint, v.astype(self.dtype))
        alpha = jax.nn.softmax(logits, axis=1)
        return attended.reshape(attended.shape[0], -1), alpha


class AttModel(nn.Module):
    """Shared assembly for the attention family (Concat/MLB/Mutan-Att)."""

    encoder: SeqEncoder
    attention: GlimpseAttention
    final_fusion: nn.Module
    classifier: Classifier
    l2norm_visual: bool = False

    def __call__(
        self,
        visual: jax.Array,
        question: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
        return_attention: bool = False,
    ):
        v = visual.astype(self.encoder.dtype)
        if self.l2norm_visual:
            v = l2_normalize(v)
        q = self.encoder(question, lengths, train=train)
        v_att, alpha = self.attention(q, v, train=train)
        z = self.final_fusion(q, v_att, train=train)
        if isinstance(z, tuple):
            z = z[0]
        logits = self.classifier(z, train=train)
        if return_attention:
            return logits, alpha
        return logits
