"""Qualitative demo / attention visualization (SURVEY.md C23).

  python -m vqa_tpu.cli.visu --dir_logs logs/vqa2/mutan_att \
      --image COCO_val2014_000000000042 \
      --question "What color is the cat?" [--out attention.png]

Loads the run via the Predictor API (config comes from the run dir's
provenance dump unless --path_opt overrides), prints the top-k answers, and
writes a per-region attention heatmap (matplotlib).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from vqa_tpu.predictor import Predictor


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir_logs", required=True, help="run dir (holds options.yaml + ckpt/)")
    p.add_argument("--path_opt", default=None, help="optional config override path")
    p.add_argument("--resume", default="best")
    p.add_argument("--image", required=True, help="image name in the feature store")
    p.add_argument("--question", required=True)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--out", default=None, help="attention heatmap png path")
    p.add_argument("--opt", action="append", default=[], metavar="KEY=VAL")
    p.add_argument("--platform", default=None, metavar="cpu|tpu|...",
                   help="force the jax backend (config API; see cli/train.py)")
    args = p.parse_args(argv)
    from vqa_tpu.utils import force_platform

    force_platform(args.platform)

    predictor = Predictor.from_run(
        args.dir_logs, args.path_opt, resume=args.resume, overrides=args.opt
    )
    print(f"Q: {args.question}")
    for answer, prob in predictor.answer(args.question, args.image, topk=args.topk):
        print(f"  {answer:20s} {prob:.3f}")

    if args.out:
        # attention map when the arch exposes one
        visual = predictor.dataset.features.get(
            predictor.dataset.features.index_of([args.image])
        )
        q, lengths = predictor.encode_questions([args.question])
        try:
            _, alpha = predictor.model.apply(
                {"params": predictor.params}, jnp.asarray(visual), q, lengths,
                return_attention=True,
            )
        except TypeError:  # archs without an attention map (the noatt family;
            # att/MFB expose glimpse maps, CoR per-step object maps)
            print("arch has no attention map; skipping --out")
            return 0

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
