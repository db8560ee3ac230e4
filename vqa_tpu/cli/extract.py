"""Offline grid-feature extraction CLI (SURVEY.md C15, call stack 3.5).

  python extract.py --dir_images data/coco/val2014 --dir_out data/coco \
      --arch resnet152 --mode att [--params resnet152.npz] [--batch 32]

Reads images (jpg/png via PIL), runs the jitted ResNet forward in batches,
and writes the same HDF5 + names-json layout the FeatureStore consumes.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.datasets.features import write_features
from vqa_tpu.models import convnets

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def load_image(path: str, size: int = 448) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir_images", required=True)
    p.add_argument("--dir_out", required=True, help="coco dir (writes extract/ inside)")
    p.add_argument("--arch", default="resnet152", choices=sorted(convnets._DEPTHS))
    p.add_argument("--mode", default="att", choices=["att", "noatt"])
    p.add_argument("--params", default=None, help=".npz of flattened param tree")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="compute dtype for the conv forward (params stay f32; "
                        "bfloat16 rides the MXU at full rate)")
    p.add_argument("--platform", default=None, metavar="cpu|tpu|...",
                   help="force the jax backend (config API; see cli/train.py)")
    args = p.parse_args(argv)
    from vqa_tpu.utils import force_platform

    force_platform(args.platform)

    files = sorted(
        f for f in os.listdir(args.dir_images)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if not files:
        print(f"no images under {args.dir_images}", file=sys.stderr)
        return 1

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = convnets.factory(args.arch, dtype=compute_dtype)
    sample = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = model.init(jax.random.key(args.seed), sample)
    if args.params:
        from flax.traverse_util import unflatten_dict

        loaded = np.load(args.params)
        flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in loaded.items()}
        variables = unflatten_dict(flat)
        print(f"loaded params from {args.params}")
    else:
        print("warning: no --params given; extracting with random-init weights")

    # params are a jit ARGUMENT, not a closure: closed-over arrays embed as
    # HLO constants, and a ResNet-152's ~240MB of them blows the remote-
    # compile helper's request cap on this image (the 413 trap, CLAUDE.md)
    @jax.jit
    def forward(variables, batch):
        grid = model.apply(variables, batch)
        # store f32 regardless of compute dtype (the HDF5 store is f32)
        return convnets.grid_features(grid, args.mode).astype(jnp.float32)

    names, feats = [], []
    for start in range(0, len(files), args.batch):
        chunk = files[start : start + args.batch]
        batch = np.stack([load_image(os.path.join(args.dir_images, f), args.size) for f in chunk])
        pad = args.batch - len(chunk)
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:], np.float32)])
        out = np.asarray(forward(variables, jnp.asarray(batch)))[: len(chunk)]
        feats.append(out)
        names.extend(os.path.splitext(f)[0] for f in chunk)
        print(f"\rextracted {len(names)}/{len(files)}", end="", flush=True)
    print()

    path = write_features(args.dir_out, args.arch, args.mode, names, np.concatenate(feats))
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
