"""Failure-injection tests for checkpoint/resume (SURVEY.md section 5.3:
"failure detection / elastic recovery" — the reference's contract is that a
crash is recoverable by ``--resume latest``; these tests inject crashes at
every point of the save sequence and assert the resume point survives)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.engine.checkpoint import CheckpointManager


def _state(value: float):
    import optax
    from flax.training import train_state

    params = {"dense": {"kernel": jnp.full((3, 4), value, jnp.float32)}}
    return jax.device_get(
        train_state.TrainState.create(
            apply_fn=lambda *a, **k: None, params=params, tx=optax.adam(1e-3)
        )
    )


def _kernel(state) -> np.ndarray:
    return np.asarray(state.params["dense"]["kernel"])


def test_crash_during_orbax_save_keeps_previous_resume_point(tmp_path, monkeypatch):
    """A crash mid-save (partial epoch dir, info.json untouched) must leave
    ``--resume latest`` working on the previous epoch."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(_state(1.0), epoch=0, acc=0.5)

    real_save = ckpt._ckptr.save

    def crashing_save(path, state):
        # simulate dying after the target dir exists but before Orbax
        # finalizes it: leave an uncommitted partial directory behind
        os.makedirs(str(path) + ".orbax-checkpoint-tmp-123", exist_ok=True)
        raise RuntimeError("injected crash")

    monkeypatch.setattr(ckpt._ckptr, "save", crashing_save)
    with pytest.raises(RuntimeError, match="injected crash"):
        ckpt.save(_state(2.0), epoch=1, acc=0.9)

    # fresh process after the crash
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.info()["latest"] == 0
    restored, epoch = mgr.restore(_state(0.0), "latest")
    assert epoch == 0
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 1.0))

    # and the interrupted epoch can be re-saved cleanly afterwards
    monkeypatch.setattr(ckpt._ckptr, "save", real_save)
    mgr.save(_state(2.0), epoch=1, acc=0.9)
    restored, epoch = mgr.restore(_state(0.0), "latest")
    assert epoch == 1
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 2.0))


def test_crash_between_ckpt_write_and_info_update(tmp_path, monkeypatch):
    """Checkpoint dir fully written but the process dies before the info
    record updates: info.json still points at the prior epoch (whose dir is
    intact — pruning runs only after the info write), resume uses it, and
    re-saving the newer epoch overwrites the orphan dir cleanly."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(_state(1.0), epoch=0, acc=0.5)

    def crashing_write(info):
        raise RuntimeError("injected crash before info update")

    monkeypatch.setattr(ckpt, "_write_info", crashing_write)
    with pytest.raises(RuntimeError, match="injected crash"):
        ckpt.save(_state(2.0), epoch=1, acc=0.6)
    assert os.path.isdir(os.path.join(str(tmp_path), "epoch_0001"))  # orphan

    mgr = CheckpointManager(str(tmp_path))
    restored, epoch = mgr.restore(_state(0.0), "latest")
    assert epoch == 0
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 1.0))
    # continue training: epoch 1 re-saves over the orphan directory
    assert mgr.save(_state(3.0), epoch=1, acc=0.7) is True
    restored, epoch = mgr.restore(_state(0.0), "best")
    assert epoch == 1
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 3.0))


def test_stale_info_tmp_is_ignored(tmp_path):
    """A crash mid info-write leaves info.json.tmp; the committed info.json
    stays authoritative (os.replace atomicity)."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(_state(1.0), epoch=0, acc=0.5)
    with open(os.path.join(str(tmp_path), "info.json.tmp"), "w") as f:
        f.write('{"latest": 99, "corrupt')  # truncated garbage
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.info()["latest"] == 0
    _, epoch = mgr.restore(_state(0.0), "latest")
    assert epoch == 0


def test_resume_missing_epoch_fails_loudly(tmp_path):
    """Asking for an epoch whose directory was lost (disk cleanup) raises a
    clear error instead of silently reinitializing."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(_state(1.0), epoch=0, acc=0.5)
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path), "epoch_0000"))
    with pytest.raises(Exception):
        ckpt.restore(_state(0.0), "latest")


def test_step_checkpoint_save_prunes_previous_and_survives_crash(tmp_path, monkeypatch):
    """Mid-epoch step checkpoints (engine.checkpoint_steps): exactly one
    lives at a time, and a crash during the NEXT step save must leave the
    previous one restorable (info flips only after the new dir finalizes)."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_step(_state(1.0), epoch=0, next_step=2)
    assert ckpt.step_info() == (0, 2)
    ckpt.save_step(_state(2.0), epoch=0, next_step=4)
    assert ckpt.step_info() == (0, 4)
    # superseded dir pruned, new one present
    assert not os.path.exists(os.path.join(str(tmp_path), "inepoch_0000_00000002"))
    assert os.path.isdir(os.path.join(str(tmp_path), "inepoch_0000_00000004"))

    def crashing_save(path, state):
        os.makedirs(str(path) + ".orbax-checkpoint-tmp-9", exist_ok=True)
        raise RuntimeError("injected crash")

    monkeypatch.setattr(ckpt._ckptr, "save", crashing_save)
    with pytest.raises(RuntimeError, match="injected crash"):
        ckpt.save_step(_state(3.0), epoch=0, next_step=6)

    mgr = CheckpointManager(str(tmp_path))
    assert mgr.step_info() == (0, 4)
    restored, epoch, next_step = mgr.restore_step(_state(0.0))
    assert (epoch, next_step) == (0, 4)
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 2.0))


def test_clear_step_removes_point_and_dir(tmp_path):
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.clear_step()  # no-op without a live point
    ckpt.save_step(_state(1.0), epoch=1, next_step=8)
    ckpt.clear_step()
    assert ckpt.step_info() is None
    assert not [d for d in os.listdir(str(tmp_path)) if d.startswith("inepoch_")]
    with pytest.raises(FileNotFoundError):
        ckpt.restore_step(_state(0.0))


def test_step_checkpoint_does_not_disturb_epoch_bookkeeping(tmp_path):
    """Epoch saves, best/latest pointers, and pruning ignore the step
    checkpoint; the step dir never shows up in the epochs list."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(_state(1.0), epoch=0, acc=0.5)
    ckpt.save_step(_state(1.5), epoch=1, next_step=2)
    ckpt.save(_state(2.0), epoch=1, acc=0.9)
    ckpt.clear_step()
    info = ckpt.info()
    assert info["latest"] == 1 and info["best"] == 1
    assert info["epochs"] == [0, 1] or set(info["epochs"]) <= {0, 1}
    restored, epoch = ckpt.restore(_state(0.0), "best")
    assert epoch == 1
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 2.0))


def test_info_survives_json_roundtrip_with_resume_retrain(tmp_path):
    """Crash after epoch N, resume, retrain same epoch: the epochs list must
    not duplicate and pruning must not delete the live resume point."""
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(_state(1.0), epoch=0, acc=0.5)
    ckpt.save(_state(2.0), epoch=1, acc=0.6)
    # resumed run re-trains epoch 1
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(_state(2.5), epoch=1, acc=0.65)
    info = mgr.info()
    assert info["epochs"].count(1) == 1
    assert info["latest"] == 1 and info["best"] == 1
    restored, _ = mgr.restore(_state(0.0), "best")
    np.testing.assert_array_equal(_kernel(restored), np.full((3, 4), 2.5))
    # info.json is valid json on disk (no partial write artifacts)
    with open(os.path.join(str(tmp_path), "info.json")) as f:
        json.load(f)
