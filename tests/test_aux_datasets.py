"""Aux dataset adapters: VQA v1 + COCO-QA behind the same factory
(SURVEY.md C24)."""

import numpy as np
import pytest

from vqa_tpu.config import load_options
from vqa_tpu.datasets import factory
from vqa_tpu.datasets.fixtures import generate

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OPT = os.path.join(REPO, "options/vqa2/concat_att.yaml")


@pytest.mark.parametrize(
    "dataset,subdir", [("VQA", "vqa1"), ("COCOQA", "cocoqa"), ("TDIUC", "tdiuc")]
)
def test_aux_dataset_end_to_end(dataset, subdir, tmp_path):
    generate(str(tmp_path), n_images=8, n_questions=40, seed=5, dataset=dataset)
    opt = load_options(
        OPT,
        overrides=[
            f"vqa.dataset={dataset}",
            f"vqa.dir={tmp_path}/{subdir}",
            f"coco.dir={tmp_path}/coco",
            "vqa.nans=20",
        ],
    )
    train = factory("train", opt)
    val = factory("val", opt)
    assert len(train) > 0 and len(val) > 0
    batch = val.batch(np.arange(4))
    assert batch["visual"].shape == (4, 36, 2048)
    assert batch["question"].shape == (4, 26)
    assert "answer" in batch  # both aux datasets are labeled on their val/test


def test_tdiuc_interim_keeps_question_type(tmp_path):
    """TDIUC annotations carry a 12-category question_type; the interim
    records must preserve it for per-type reporting (SURVEY.md C24)."""
    from vqa_tpu.datasets.interim import build_interim

    generate(str(tmp_path), n_images=4, n_questions=12, seed=9, dataset="TDIUC")
    examples = build_interim(str(tmp_path / "tdiuc" / "raw"), "train", dataset="TDIUC")
    assert examples and all("question_type" in ex for ex in examples)


def test_unknown_dataset_rejected(tmp_path):
    opt = load_options(
        OPT, overrides=["vqa.dataset=CLEVR", f"vqa.dir={tmp_path}", f"coco.dir={tmp_path}"]
    )
    with pytest.raises(NotImplementedError):
        factory("train", opt)
