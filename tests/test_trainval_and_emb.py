"""Graded config #5 plumbing: trainval merged prep (SURVEY.md C4) and the
pretrained-embedding hook (C8)."""

import os

import numpy as np

from vqa_tpu.config import load_options
from vqa_tpu.datasets import factory
from vqa_tpu.datasets.fixtures import generate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_trainval_merges_train_and_val(tmp_path):
    generate(str(tmp_path), n_images=8, n_questions=40, seed=9)
    opt = load_options(
        os.path.join(REPO, "options/vqa2/cor.yaml"),
        overrides=[
            f"vqa.dir={tmp_path}/vqa2",
            f"coco.dir={tmp_path}/coco",
            "vqa.nans=20",
        ],
    )
    assert opt.vqa.trainsplit == "trainval"
    trainval = factory("trainval", opt)
    val = factory("val", opt)
    # merged split covers both raw splits' questions (minus OOV-answer drops)
    assert len(trainval) > len(val)
    assert trainval.sampling  # samplingans applies to the merged train split
    # val keeps every row for evaluation
    assert len(val) == 40


def test_pretrained_embedding_hook(tmp_path):
    from vqa_tpu.cli.train import init_params
    from vqa_tpu.models import factory as model_factory

    generate(str(tmp_path), n_images=8, n_questions=40, seed=10)
    opt = load_options(
        os.path.join(REPO, "options/vqa2/concat_att.yaml"),
        overrides=[
            f"vqa.dir={tmp_path}/vqa2",
            f"coco.dir={tmp_path}/coco",
            "vqa.nans=20",
            "model.seq2vec.emb_size=16",
            "model.seq2vec.hidden_size=24",
        ],
    )
    val = factory("val", opt)
    table = np.arange(val.num_words * 16, dtype=np.float32).reshape(val.num_words, 16)
    path = os.path.join(str(tmp_path), "emb.npz")
    np.savez(path, embedding=table)
    opt.model.seq2vec["pretrained_emb"] = path

    model = model_factory(opt.model, val.num_words, val.num_answers)
    params = init_params(model, val, opt)
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["embed"]["embedding"]), table
    )
