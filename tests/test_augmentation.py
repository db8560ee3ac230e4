"""Visual-Genome-style train augmentation (SURVEY.md C24)."""

import json
import os

from vqa_tpu.config import load_options
from vqa_tpu.datasets import factory
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.datasets.interim import image_name

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_vg_augmentation_extends_train_only(tmp_path):
    generate(str(tmp_path), n_images=8, n_questions=40, seed=13)
    # augmentation pairs reference images already in the feature store
    vg = [
        {
            "image_name": image_name("train2014", iid),
            "question": "What object is in the picture?",
            "answer": "cat",
        }
        for iid in range(8)
    ]
    aug_dir = os.path.join(str(tmp_path), "vg")
    os.makedirs(aug_dir)
    with open(os.path.join(aug_dir, "vg_qa.json"), "w") as f:
        json.dump(vg, f)

    base_opt = [
        f"vqa.dir={tmp_path}/vqa2",
        f"coco.dir={tmp_path}/coco",
        "vqa.nans=20",
    ]
    opt_plain = load_options(os.path.join(REPO, "options/vqa2/concat_att.yaml"), base_opt)
    plain_train = factory("train", opt_plain)
    plain_val = factory("val", opt_plain)

    # same knobs as plain: the augment flag alone must key a fresh prep dir
    opt_aug = load_options(
        os.path.join(REPO, "options/vqa2/concat_att.yaml"),
        base_opt + [f"vqa.augment_dir={aug_dir}"],
    )
    aug_train = factory("train", opt_aug)
    aug_val = factory("val", opt_aug)

    assert len(aug_train) > len(plain_train)
    assert len(aug_val) == len(plain_val)  # eval split untouched
    # augmented rows carry the synthetic qid range and valid feature lookups
    assert (aug_train.split.question_ids >= 10_000_000).sum() == 8
