"""MFB/MFH with co-attention (SURVEY.md C12; graded config #4).

Follows the published MFB architecture (Yu et al., arXiv 1708.01471 —
PAPERS.md): the question LSTM returns the full hidden sequence; a question
self-attention pools it over timesteps (masked softmax over valid tokens);
a question-guided MFB attention pools image regions over multiple glimpses;
the final MFB (or cascaded-MFH) fusion feeds the classifier.

All attention math is batched matmuls + masked softmax — MXU-shaped; the
sum-pool/signed-sqrt/L2 chain fuses under XLA (Pallas variant in
vqa_tpu.ops.mfb_pool).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vqa_tpu.config import ModelOptions
from vqa_tpu.models.classifier import Classifier
from vqa_tpu.models.att import GlimpseAttention
from vqa_tpu.models.fusion import MFBFusion, MFHFusion, l2_normalize
from vqa_tpu.models.seq2vec import SeqEncoder


class QuestionSelfAttention(nn.Module):
    """seq [B, T, H], mask [B, T] bool -> [B, glimpses*H] (masked softmax
    over T; the mask comes from token ids so either padding side works)."""

    glimpses: int = 2
    dim_h: int = 512
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, seq: jax.Array, mask: jax.Array, train: bool = False):
        x = nn.Dropout(self.dropout, deterministic=not train)(seq)
        h = jax.nn.relu(nn.Dense(self.dim_h, dtype=self.dtype, name="hidden")(x))
        logits = nn.Dense(self.glimpses, dtype=self.dtype, name="logits")(h)  # [B,T,G]
        logits = jnp.where(mask[..., None], logits, jnp.finfo(logits.dtype).min)
        alpha = jax.nn.softmax(logits, axis=1)
        pooled = jnp.einsum("btg,bth->bgh", alpha, seq)
        return pooled.reshape(pooled.shape[0], -1)


class MFBCoAttModel(nn.Module):
    encoder: SeqEncoder
    q_attention: QuestionSelfAttention
    v_attention: GlimpseAttention
    final_fusion: nn.Module
    classifier: Classifier
    l2norm_visual: bool = True

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
        seq = self.encoder(question, lengths, train=train)     # [B, T, H]
        q = self.q_attention(seq, question != 0, train=train)  # [B, Gq*H]
        v_att, alpha = self.v_attention(q, v, train=train)     # [B, Gv*Dv]
        z = self.final_fusion(q, v_att, train=train)
        if isinstance(z, tuple):
            z = z[0]
        logits = self.classifier(z, train=train)
        if return_attention:
            return logits, alpha
        return logits

    @classmethod
    def build(cls, opt: ModelOptions, num_words: int, num_answers: int, dtype):
        from vqa_tpu.models import seq2vec as seq2vec_lib

        seq_cfg = dict(opt.seq2vec)
        seq_cfg["return_sequence"] = True
        encoder = seq2vec_lib.factory(num_words, seq_cfg, dtype=dtype)
        att = opt.attention or {}
        fus = opt.fusion or {}
        classif = opt.classif or {}

        q_attention = QuestionSelfAttention(
            glimpses=att.get("question_glimpses", 2),
            dim_h=att.get("dim_h", 512),
            dropout=att.get("dropout", 0.1),
            dtype=dtype,
        )
        att_fusion = MFBFusion(
            pool_factor=fus.get("pool_factor", 5),
            dim_mm=att.get("dim_mm", fus.get("dim_mm", 1000)),
            dropout_pre=fus.get("dropout_pre", 0.1),
            dtype=dtype,
        )
        v_attention = GlimpseAttention(
            fusion=att_fusion,
            nb_glimpses=att.get("nb_glimpses", 2),
            dim_h=att.get("dim_h", 512),
            activation="relu",
            dropout_mm=att.get("dropout", 0.1),
            dtype=dtype,
        )
        fusion_kwargs = dict(
            pool_factor=fus.get("pool_factor", 5),
            dim_mm=fus.get("dim_mm", 1000),
            dropout_pre=fus.get("dropout_pre", 0.1),
            dtype=dtype,
        )
        if opt.arch == "MFHCoAtt" or fus.get("arch") == "mfh":
            final = MFHFusion(mfh_order=fus.get("mfh_order", 2), **fusion_kwargs)
        else:
            final = MFBFusion(**fusion_kwargs)
        classifier = Classifier(
            num_answers=num_answers,
            dim_h=classif.get("dim_h"),
            activation=classif.get("activation", "relu"),
            dropout=classif.get("dropout", 0.1),
            dtype=dtype,
        )
        return cls(
            encoder=encoder,
            q_attention=q_attention,
            v_attention=v_attention,
            final_fusion=final,
            classifier=classifier,
            l2norm_visual=opt.extra.get("l2norm_visual", True),
        )
