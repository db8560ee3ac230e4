"""Top-k answer decoding shared by the live Predictor and the AOT
ExportedPredictor (SURVEY.md C23 serving surface).

Model-free on purpose: the AOT load path (vqa_tpu/export.py) must not pull
in flax or the model zoo, so the one copy of the softmax -> argsort ->
(answer, prob) contract lives here rather than in predictor.py.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def topk_answers(
    logits, aid_to_ans: Sequence[str], topk: int
) -> List[List[Tuple[str, float]]]:
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    out = []
    for row in probs:
        top = np.argsort(-row)[:topk]
        out.append([(aid_to_ans[a], float(row[a])) for a in top])
    return out
