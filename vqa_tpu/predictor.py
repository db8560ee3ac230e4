"""Inference convenience API (serving-side complement to SURVEY.md C23).

    from vqa_tpu.predictor import Predictor
    p = Predictor.from_run("logs/vqa2/mutan_att", "options/vqa2/mutan_att.yaml",
                           resume="best")
    answers = p.answer("What color is the cat?", "COCO_val2014_000000000042")
    # -> [(answer, prob), ...] top-k

Batched: ``p.answer_batch(questions, image_names)`` runs one jitted forward
for the whole batch. The demo CLI (cli/visu.py) is a thin wrapper over this.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.config import Options, load_options
from vqa_tpu.datasets import factory as dataset_factory
from vqa_tpu.datasets.processed import encode_question_batch
from vqa_tpu.datasets.tokenizer import get_tokenizer
from vqa_tpu.engine.checkpoint import CheckpointManager
from vqa_tpu.engine.optim import factory as optim_factory
from vqa_tpu.engine.steps import create_state
from vqa_tpu.models import factory as model_factory


class Predictor:
    def __init__(self, model, params, dataset, opt: Options):
        self.model = model
        self.params = params
        self.dataset = dataset
        self.opt = opt
        self._tok = get_tokenizer(opt.vqa.nlp)
        self._forward = jax.jit(
            lambda p, v, q, l: model.apply({"params": p}, v, q, l)
        )

    @classmethod
    def from_run(
        cls,
        dir_logs: str,
        path_opt: Optional[str] = None,
        resume: Optional[str] = "best",
        overrides: Optional[List[str]] = None,
    ) -> "Predictor":
        """Load from a run dir. With no ``path_opt``, the run's own provenance
        dump (options.yaml, written by the CLI) reproduces the exact config.
        ``resume=None`` skips the checkpoint restore and serves the init
        params — the path for a converted reference checkpoint loaded via
        ``model.pretrained_params`` (tools/import_torch.py --kind model),
        which has no Orbax run behind it."""
        import os

        if path_opt is None:
            path_opt = os.path.join(dir_logs, "options.yaml")
        opt = load_options(path_opt, overrides, default_path=None)
        val_set = dataset_factory("val", opt)
        model = model_factory(
            opt.model, val_set.num_words, val_set.num_answers, dtype=opt.engine.dtype
        )
        from vqa_tpu.cli.train import init_params

        params = init_params(model, val_set, opt, load_pretrained=resume is None)
        if resume is not None:
            state = create_state(model, params, optim_factory(opt.optim, 1))
            ckpt = CheckpointManager(os.path.join(dir_logs, "ckpt"))
            state, _ = ckpt.restore(state, resume)
            params = state.params
        return cls(model, params, val_set, opt)

    def encode_questions(self, questions: Sequence[str]):
        rows, lengths = encode_question_batch(
            questions,
            self._tok,
            self.dataset.vocabs.word_to_wid,
            self.opt.vqa.maxlength,
            self.opt.vqa.pad,
        )
        return jnp.asarray(rows), jnp.asarray(lengths)

    def answer_batch(
        self, questions: Sequence[str], image_names: Sequence[str], topk: int = 5
    ) -> List[List[Tuple[str, float]]]:
        from vqa_tpu.utils.decode import topk_answers

        visual = self.dataset.features.get(
            self.dataset.features.index_of(list(image_names))
        )
        q, lengths = self.encode_questions(questions)
        logits = self._forward(self.params, jnp.asarray(visual), q, lengths)
        return topk_answers(logits, self.dataset.vocabs.aid_to_ans, topk)

    def answer(self, question: str, image_name: str, topk: int = 5):
        return self.answer_batch([question], [image_name], topk)[0]
