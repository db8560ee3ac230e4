"""Answer classifier head (SURVEY.md C14): [dropout, hidden?] -> nans logits."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from vqa_tpu.models.fusion import _ACT


class Classifier(nn.Module):
    num_answers: int
    dim_h: Optional[int] = None
    activation: str = "tanh"
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        z = nn.Dropout(self.dropout, deterministic=not train)(z)
        if self.dim_h is not None:
            z = _ACT[self.activation](nn.Dense(self.dim_h, dtype=self.dtype, name="hidden")(z))
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
        return nn.Dense(self.num_answers, dtype=self.dtype, name="logits")(z)
