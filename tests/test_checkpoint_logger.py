"""Checkpoint bit-exact round-trip (SURVEY.md C20) + experiment logger (C21)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.engine.checkpoint import CheckpointManager
from vqa_tpu.engine.logger import Experiment


def _tiny_state():
    import optax
    from flax.training import train_state

    params = {
        "dense": {"kernel": jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 7.0,
                  "bias": jnp.ones((4,), jnp.float32)},
    }
    return train_state.TrainState.create(
        apply_fn=lambda *a, **k: None, params=params, tx=optax.adam(1e-3)
    )


def test_checkpoint_bit_exact_roundtrip(tmp_path):
    state = _tiny_state()
    state = state.apply_gradients(grads=jax.tree.map(jnp.ones_like, state.params))
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(jax.device_get(state), epoch=0, acc=0.5)
    restored, epoch = ckpt.restore(state, "latest")
    assert epoch == 0
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_best_latest_and_save_all_from(tmp_path):
    state = jax.device_get(_tiny_state())
    ckpt = CheckpointManager(str(tmp_path), save_all_from=2)
    assert ckpt.save(state, 0, acc=0.3) is True     # first is best
    assert ckpt.save(state, 1, acc=0.5) is True     # new best
    assert ckpt.save(state, 2, acc=0.1) is False
    assert ckpt.save(state, 3, acc=0.2) is False
    info = ckpt.info()
    assert info["best"] == 1 and info["latest"] == 3 and info["best_acc"] == 0.5
    kept = sorted(d for d in os.listdir(str(tmp_path)) if d.startswith("epoch_"))
    # epoch 0 pruned; 1=best kept; 2,3 kept by save_all_from
    assert kept == ["epoch_0001", "epoch_0002", "epoch_0003"]
    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(tmp_path / "empty")).resolve("best")


def test_experiment_logger_layout(tmp_path):
    exp = Experiment(str(tmp_path))
    exp.log_step(0, "train", 5, {"loss": 1.5})
    exp.log_epoch(0, "train", {"loss": 1.2, "acc1": 0.4})
    exp.log_epoch(0, "val", {"acc1": 0.3})
    path = exp.write_results([{"question_id": 1, "answer": "yes"}], 0, "val")
    exp.close()

    assert os.path.basename(path) == "vqa_OpenEnded_val_epoch0_results.json"
    with open(path) as f:
        assert json.load(f) == [{"question_id": 1, "answer": "yes"}]
    history = Experiment(str(tmp_path), resume=True).history("train")
    assert len(history) == 1 and history[0]["loss"] == 1.2
    steps = open(os.path.join(str(tmp_path), "steps.jsonl")).read().strip().splitlines()
    assert json.loads(steps[0])["step"] == 5


def test_experiment_logger_never_truncates(tmp_path):
    """ADVICE r1: re-running without --resume must not wipe metric history."""
    exp = Experiment(str(tmp_path))
    exp.log_epoch(0, "train", {"loss": 1.0})
    exp.close()
    # second run, no resume flag (e.g. accidental restart / fresh eval)
    exp2 = Experiment(str(tmp_path), resume=False)
    exp2.log_epoch(0, "val", {"acc1": 0.5})
    exp2.close()
    reader = Experiment(str(tmp_path), resume=True)
    assert len(reader.history("train")) == 1  # old history survives
    assert len(reader.history("val")) == 1
    raw = open(os.path.join(str(tmp_path), "metrics.jsonl")).read()
    assert '"run_start"' in raw  # restart marked
    reader.close()


def test_plot_logs_tool(tmp_path):
    """tools/plot_logs.py renders curves.png from a run dir's metrics."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tools.plot_logs import main as plot_main

    exp = Experiment(str(tmp_path))
    for epoch in range(3):
        exp.log_epoch(epoch, "train", {"loss": 2.0 - 0.3 * epoch})
        exp.log_epoch(epoch, "val", {"acc1": 0.2 + 0.1 * epoch,
                                     "acc5": 0.5 + 0.1 * epoch})
    exp.close()
    assert plot_main(["--dir_logs", str(tmp_path)]) == 0
    assert os.path.getsize(os.path.join(str(tmp_path), "curves.png")) > 1000
    # empty dir fails loudly
    assert plot_main(["--dir_logs", str(tmp_path / "nope")]) == 1
