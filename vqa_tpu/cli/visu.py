"""Qualitative demo / attention visualization (SURVEY.md C23).

  python -m vqa_tpu.cli.visu --path_opt options/vqa2/mutan_att.yaml \
      --resume best --image COCO_val2014_000000000042 \
      --question "What color is the cat?" [--out attention.png]

Loads the checkpointed model, encodes the free-form question with the run's
vocab, runs one forward with return_attention, prints the top-5 answers and
writes a per-region attention heatmap (matplotlib).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu import datasets as datasets_lib
from vqa_tpu import models as models_lib
from vqa_tpu.cli.train import init_params, options_from_args
from vqa_tpu.datasets.processed import encode_question
from vqa_tpu.datasets.tokenizer import get_tokenizer
from vqa_tpu.engine.checkpoint import CheckpointManager
from vqa_tpu.engine.optim import factory as optim_factory
from vqa_tpu.engine.steps import create_state


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path_opt", required=True)
    p.add_argument("--dir_logs", default=None)
    p.add_argument("--resume", default="best")
    p.add_argument("--image", required=True, help="image name in the feature store")
    p.add_argument("--question", required=True)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--out", default=None, help="attention heatmap png path")
    p.add_argument("--opt", action="append", default=[], metavar="KEY=VAL")
    # accepted for parity with train.py argparse plumbing
    p.add_argument("--evaluate", action="store_true", help=argparse.SUPPRESS)
    args = p.parse_args(argv)
    args.lr = args.batch_size = args.epochs = args.print_freq = None
    args.seed = args.profile_dir = None

    opt = options_from_args(args)
    val_set = datasets_lib.factory("val", opt)
    model = models_lib.factory(
        opt.model, val_set.num_words, val_set.num_answers, dtype=opt.engine.dtype
    )
    params = init_params(model, val_set, opt)
    state = create_state(model, params, optim_factory(opt.optim, 1))
    ckpt = CheckpointManager(os.path.join(opt.logs.dir_logs, "ckpt"))
    state, epoch = ckpt.restore(state, args.resume)
    print(f"loaded {args.resume} checkpoint (epoch {epoch})")

    tok = get_tokenizer(opt.vqa.nlp)
    row, length = encode_question(
        tok(args.question), val_set.vocabs.word_to_wid, opt.vqa.maxlength, opt.vqa.pad
    )
    visual = val_set.features.get(val_set.features.index_of([args.image]))
    question = jnp.asarray(row[None, :])
    lengths = jnp.asarray([length], jnp.int32)

    try:
        out = model.apply(
            {"params": state.params}, jnp.asarray(visual), question, lengths,
            return_attention=True,
        )
    except TypeError:  # archs without an attention map (noatt, CoR)
        out = model.apply({"params": state.params}, jnp.asarray(visual), question, lengths)
    logits, alpha = out if isinstance(out, tuple) else (out, None)
    probs = jax.nn.softmax(logits[0])
    top = np.argsort(-np.asarray(probs))[: args.topk]
    print(f"Q: {args.question}")
    for aid in top:
        print(f"  {val_set.vocabs.aid_to_ans[aid]:20s} {float(probs[aid]):.3f}")

    if alpha is not None and args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        a = np.asarray(alpha[0])  # [R, G]
        fig, axes = plt.subplots(1, a.shape[1], figsize=(4 * a.shape[1], 3))
        axes = np.atleast_1d(axes)
        for g, ax in enumerate(axes):
            side = int(np.sqrt(a.shape[0]))
            if side * side == a.shape[0]:  # grid features -> heatmap
                ax.imshow(a[:, g].reshape(side, side), cmap="viridis")
            else:  # region features -> bar chart
                ax.bar(np.arange(a.shape[0]), a[:, g])
            ax.set_title(f"glimpse {g}")
        fig.suptitle(args.question)
        fig.savefig(args.out, bbox_inches="tight", dpi=100)
        print(f"attention map -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
