"""Synthetic VQA-v2-format fixture generator (SURVEY.md section 4, C3).

No network access exists in the build environment, so every downstream stage
(prep, pipeline, training, scoring, bench) runs against fabricated data in the
exact raw VQA v2 schema: questions/annotations json + a bottom-up-style
36x2048 feature HDF5 table. Deterministic per (seed, sizes).

The generated data carries real signal: each image is assigned attribute
latents (color, count, object, presence) and its feature vector encodes them
in fixed dimensions, so models can actually learn and accuracy/loss-decrease
tests are meaningful.

CLI:
  python -m vqa_tpu.datasets.fixtures --dir /tmp/fix --n_images 64 --n_questions 256
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np

from vqa_tpu.datasets.features import write_features
from vqa_tpu.datasets.interim import (
    RAW_FILES_BY_DATASET,
    coco_split_for,
    image_name,
)

NOUNS = ["cat", "dog", "car", "tree", "ball", "shirt", "house", "bird"]
COLORS = ["red", "blue", "green", "yellow", "black", "white"]
COUNTS = ["1", "2", "3", "4", "5"]
YESNO = ["yes", "no"]
ALL_ANSWERS = COLORS + COUNTS + YESNO + NOUNS

N_REGIONS = 36
DIM_FEAT = 2048


def _image_latents(rng: np.random.Generator) -> Dict[str, str]:
    return {
        "color": COLORS[rng.integers(len(COLORS))],
        "count": COUNTS[rng.integers(len(COUNTS))],
        "noun": NOUNS[rng.integers(len(NOUNS))],
        "present": YESNO[rng.integers(len(YESNO))],
    }


def _features_for(latents: Dict[str, str], rng: np.random.Generator) -> np.ndarray:
    """36x2048 features with latents linearly decodable from fixed dims."""
    feat = rng.standard_normal((N_REGIONS, DIM_FEAT)).astype(np.float32)
    # one-hot signal blocks, strong enough to dominate the noise
    offs = 0
    for key, space in (
        ("color", COLORS),
        ("count", COUNTS),
        ("noun", NOUNS),
        ("present", YESNO),
    ):
        idx = offs + space.index(latents[key])
        feat[:, idx] += 4.0
        offs += len(space)
    return feat


def _question_for(latents: Dict[str, str], kind: int) -> tuple:
    noun = latents["noun"]
    if kind == 0:
        return f"What color is the {noun}?", latents["color"]
    if kind == 1:
        return f"How many {noun}s are there?", latents["count"]
    if kind == 2:
        return f"Is there a {noun} in the picture?", latents["present"]
    return f"What object is in the picture?", noun


def generate(
    dir_out: str,
    n_images: int = 64,
    n_questions: int = 256,
    seed: int = 0,
    splits: tuple = ("train", "val", "test", "testdev"),
    dataset: str = "VQA2",
) -> None:
    rng = np.random.default_rng(seed)
    subdir = {"VQA2": "vqa2", "VQA": "vqa1", "COCOQA": "cocoqa", "TDIUC": "tdiuc"}[dataset]
    dir_raw = os.path.join(dir_out, subdir, "raw")
    os.makedirs(dir_raw, exist_ok=True)
    if dataset == "COCOQA":
        splits = tuple(s for s in splits if s in ("train", "val"))
    elif dataset != "VQA2":
        splits = tuple(s for s in splits if s in RAW_FILES_BY_DATASET[dataset])

    all_names: List[str] = []
    all_feats: List[np.ndarray] = []
    next_qid = 1

    for split_i, split in enumerate(splits):
        coco = coco_split_for(split)
        image_ids = [split_i * 10_000 + k for k in range(n_images)]
        latents = {}
        for iid in image_ids:
            lat = _image_latents(rng)
            latents[iid] = lat
            all_names.append(image_name(coco, iid))
            all_feats.append(_features_for(lat, rng))

        questions, annotations = [], []
        for _ in range(n_questions):
            iid = image_ids[rng.integers(n_images)]
            kind = int(rng.integers(4))
            text, answer = _question_for(latents[iid], kind)
            qid = next_qid
            next_qid += 1
            questions.append({"image_id": iid, "question": text, "question_id": qid})
            # 10 annotators: mostly consensus, a couple of noisy answers
            anns = [answer] * int(rng.integers(8, 11))
            while len(anns) < 10:
                anns.append(ALL_ANSWERS[rng.integers(len(ALL_ANSWERS))])
            annotations.append(
                {
                    "image_id": iid,
                    "question_id": qid,
                    "question_type": "synthetic",
                    "answer_type": "other",
                    "multiple_choice_answer": answer,
                    "answers": [
                        {"answer": a, "answer_confidence": "yes", "answer_id": j + 1}
                        for j, a in enumerate(anns)
                    ],
                }
            )

        if dataset == "COCOQA":
            base = os.path.join(dir_raw, "train" if split == "train" else "test")
            os.makedirs(base, exist_ok=True)
            with open(os.path.join(base, "questions.txt"), "w") as f:
                f.write("\n".join(q["question"] for q in questions) + "\n")
            with open(os.path.join(base, "answers.txt"), "w") as f:
                f.write("\n".join(a["multiple_choice_answer"] for a in annotations) + "\n")
            with open(os.path.join(base, "img_ids.txt"), "w") as f:
                f.write("\n".join(str(q["image_id"]) for q in questions) + "\n")
            with open(os.path.join(base, "types.txt"), "w") as f:
                f.write("\n".join("0" for _ in questions) + "\n")
        else:
            qfile, afile = RAW_FILES_BY_DATASET[dataset][split]
            with open(os.path.join(dir_raw, qfile), "w") as f:
                json.dump({"questions": questions}, f)
            if afile is not None:
                with open(os.path.join(dir_raw, afile), "w") as f:
                    json.dump({"annotations": annotations}, f)

    coco_dir = os.path.join(dir_out, "coco")
    feats = np.stack(all_feats)
    write_features(coco_dir, "bottomup36", "att", all_names, feats)
    write_features(coco_dir, "bottomup36", "noatt", all_names, feats.mean(axis=1))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir", required=True)
    p.add_argument("--n_images", type=int, default=64)
    p.add_argument("--n_questions", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset", default="VQA2", choices=["VQA2", "VQA", "COCOQA", "TDIUC"])
    args = p.parse_args(argv)
    generate(args.dir, args.n_images, args.n_questions, args.seed, dataset=args.dataset)
    print(f"fixture written to {args.dir}")


if __name__ == "__main__":
    main()
