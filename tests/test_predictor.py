"""Predictor API over a trained run (inference convenience layer)."""

import os

import pytest

from vqa_tpu.cli.train import main
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.predictor import Predictor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("predfix"))
    generate(d, n_images=12, n_questions=64, seed=21)
    logs = os.path.join(d, "logs")
    overrides = [
        "--opt", f"vqa.dir={d}/vqa2", "--opt", f"coco.dir={d}/coco",
        "--opt", "vqa.nans=25",
        "--opt", "model.seq2vec.emb_size=16", "--opt", "model.seq2vec.hidden_size=24",
        "--opt", "model.attention.dim_h=16", "--opt", "model.classif.dim_h=16",
    ]
    rc = main([
        "--path_opt", os.path.join(REPO, "options/vqa2/concat_att.yaml"),
        "--dir_logs", logs, "--epochs", "1", "--batch_size", "16",
        "--print_freq", "0", *overrides,
    ])
    assert rc == 0
    return d, logs, [o for o in overrides if o != "--opt"]


def test_predictor_answers(run):
    d, logs, overrides = run
    # no path_opt: the run dir's provenance dump reproduces the exact config
    p = Predictor.from_run(logs, resume="best")
    image = p.dataset.split.image_names[0]
    answers = p.answer("What color is the cat?", image, topk=3)
    assert len(answers) == 3
    assert all(isinstance(a, str) and 0.0 <= prob <= 1.0 for a, prob in answers)
    # batched path agrees with single (same answers; probs to float tolerance —
    # different batch shapes reduce in different orders)
    batched = p.answer_batch(["What color is the cat?"] * 2, [image] * 2, topk=3)
    assert batched[0] == batched[1]
    assert [a for a, _ in batched[0]] == [a for a, _ in answers]
    for (_, p1), (_, p2) in zip(batched[0], answers):
        assert abs(p1 - p2) < 1e-5


def test_predictor_serves_imported_checkpoint(run, tmp_path):
    """resume=None serves init params — i.e. a converted reference checkpoint
    grafted via model.pretrained_params, no Orbax run dir needed."""
    import yaml

    from vqa_tpu.importers import save_tree_npz

    d, logs, overrides = run
    # harvest the trained run's params as the stand-in "converted" npz
    trained = Predictor.from_run(logs, resume="best")
    npz = tmp_path / "imported.npz"
    save_tree_npz(str(npz), trained.params)

    # a fresh "run dir" holding only an options.yaml that points at the npz
    serve_dir = tmp_path / "serve"
    serve_dir.mkdir()
    with open(os.path.join(logs, "options.yaml")) as f:
        opts = yaml.safe_load(f)
    opts.setdefault("model", {})["pretrained_params"] = str(npz)
    with open(serve_dir / "options.yaml", "w") as f:
        yaml.safe_dump(opts, f)

    p = Predictor.from_run(str(serve_dir), resume=None)
    image = p.dataset.split.image_names[0]
    assert p.answer("What color is the cat?", image, topk=3) == trained.answer(
        "What color is the cat?", image, topk=3
    )
