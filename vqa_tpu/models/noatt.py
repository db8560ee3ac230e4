"""No-attention baselines (SURVEY.md C11).

q vector + a single global image feature (pooled 2048-d, coco.mode='noatt')
-> fusion -> classifier.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax

from vqa_tpu.models.classifier import Classifier
from vqa_tpu.models.fusion import l2_normalize
from vqa_tpu.models.seq2vec import SeqEncoder


class NoAttModel(nn.Module):
    encoder: SeqEncoder
    fusion: nn.Module
    classifier: Classifier
    l2norm_visual: bool = False

    def __call__(
        self,
        visual: jax.Array,
        question: jax.Array,
        lengths: Optional[jax.Array] = None,
        train: bool = False,
    ):
        v = visual.astype(self.encoder.dtype)
        if v.ndim == 3:  # region features given: mean-pool to a global vector
            v = v.mean(axis=1)
        if self.l2norm_visual:
            v = l2_normalize(v)
        q = self.encoder(question, lengths, train=train)
        z = self.fusion(q, v, train=train)
        if isinstance(z, tuple):
            z = z[0]
        return self.classifier(z, train=train)
