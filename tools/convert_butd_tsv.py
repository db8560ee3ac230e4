"""Convert published bottom-up-attention TSV shards to the FeatureStore
layout (SURVEY.md 3.5: "Bottom-up 36-box features arrive as externally
published shards — tsv->h5 convert").

The public TSV format (Anderson et al. release) has one row per image:
  image_id \t image_w \t image_h \t num_boxes \t boxes(b64) \t features(b64)
with features base64-encoded float32 [num_boxes, 2048] and boxes
[num_boxes, 4]. Boxes are preserved in a parallel dataset so attention
visualizations can draw them.

Usage:
  python tools/convert_butd_tsv.py --tsv trainval_36.tsv[,more.tsv] \
      --dir_out data/coco --coco_split auto [--boxes]
"""

import argparse
import base64
import csv
import json
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqa_tpu.datasets.features import feature_paths  # noqa: E402
from vqa_tpu.datasets.interim import image_name  # noqa: E402

csv.field_size_limit(sys.maxsize)

FIELDS = ["image_id", "image_w", "image_h", "num_boxes", "boxes", "features"]


def iter_rows(paths):
    for path in paths:
        with open(path) as f:
            for row in csv.DictReader(f, delimiter="\t", fieldnames=FIELDS):
                n = int(row["num_boxes"])
                feats = np.frombuffer(
                    base64.b64decode(row["features"]), dtype=np.float32
                ).reshape(n, -1)
                boxes = np.frombuffer(
                    base64.b64decode(row["boxes"]), dtype=np.float32
                ).reshape(n, 4)
                yield int(row["image_id"]), feats, boxes


def _coco_name(image_id: int, split_mode: str) -> str:
    if split_mode != "auto":
        return image_name(split_mode, image_id)
    # the public trainval tsv mixes train2014/val2014; COCO val2014 ids are
    # not distinguishable from the id alone, so 'auto' tags both names at
    # the same index — lookups succeed for either split's questions
    return None


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tsv", required=True, help="comma-separated tsv shard paths")
    p.add_argument("--dir_out", required=True, help="coco dir (writes extract/)")
    p.add_argument("--arch", default="bottomup36")
    p.add_argument(
        "--coco_split", default="auto",
        help="train2014|val2014|test2015, or 'auto' to alias both trainval names",
    )
    p.add_argument("--boxes", action="store_true", help="also store region boxes")
    args = p.parse_args(argv)

    paths = args.tsv.split(",")
    h5_path, names_path = feature_paths(args.dir_out, args.arch, "att")
    os.makedirs(os.path.dirname(h5_path), exist_ok=True)

    names, all_feats, all_boxes = [], [], []
    n_regions = None
    for image_id, feats, boxes in iter_rows(paths):
        if n_regions is None:
            n_regions = feats.shape[0]
        if feats.shape[0] != n_regions:
            raise ValueError(
                f"image {image_id}: {feats.shape[0]} boxes != {n_regions} "
                "(adaptive-box tsv needs fixed-36 release or padding)"
            )
        if args.coco_split == "auto":
            for split in ("train2014", "val2014"):
                names.append(image_name(split, image_id))
                all_feats.append(feats)
                if args.boxes:
                    all_boxes.append(boxes)
        else:
            names.append(image_name(args.coco_split, image_id))
            all_feats.append(feats)
            if args.boxes:
                all_boxes.append(boxes)
        if len(all_feats) % 1000 < (2 if args.coco_split == "auto" else 1):
            print(f"\rconverted {len(all_feats)} rows", end="", flush=True)
    print()

    feats = np.stack(all_feats)
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("features", data=feats, chunks=True)
        if args.boxes:
            f.create_dataset("boxes", data=np.stack(all_boxes))
    with open(names_path, "w") as f:
        json.dump(names, f)
    # noatt companion: mean-pooled vectors
    h5_noatt, names_noatt = feature_paths(args.dir_out, args.arch, "noatt")
    with h5py.File(h5_noatt, "w") as f:
        f.create_dataset("features", data=feats.mean(axis=1), chunks=True)
    with open(names_noatt, "w") as f:
        json.dump(names, f)
    print(f"wrote {h5_path} ({feats.shape}) + noatt companion")
    return 0


if __name__ == "__main__":
    sys.exit(main())
