"""Checkpoint / resume (SURVEY.md C20, section 5.3/5.4).

Orbax-backed per-epoch saves with the reference's CLI semantics:
``best`` / ``latest`` pointers, ``--resume {best,latest,<epoch>}``,
``--save_all_from`` to keep everything from an epoch onward. Writes are
atomic (Orbax's finalized directories + tmp-rename for the info record), so
a crash mid-save never corrupts the resume point.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple, Union

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_all_from: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_all_from = save_all_from
        self._ckptr = ocp.StandardCheckpointer()

    # -- info record ---------------------------------------------------------

    @property
    def _info_path(self) -> str:
        return os.path.join(self.directory, "info.json")

    def info(self) -> Dict[str, Any]:
        if not os.path.exists(self._info_path):
            return {"latest": None, "best": None, "best_acc": None, "epochs": []}
        with open(self._info_path) as f:
            return json.load(f)

    def _write_info(self, info: Dict[str, Any]) -> None:
        tmp = self._info_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f)
        os.replace(tmp, self._info_path)

    def _epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.directory, f"epoch_{epoch:04d}")

    def _step_dir(self, epoch: int, step: int) -> str:
        return os.path.join(self.directory, f"inepoch_{epoch:04d}_{step:08d}")

    # -- save / restore ------------------------------------------------------

    def save(self, state, epoch: int, acc: Optional[float] = None) -> bool:
        """Save state for ``epoch``; returns True if this is the new best.

        Multi-process (parallel/distributed.py): pass the GLOBAL jax arrays,
        not a device_get'd numpy tree — Orbax coordinates a replicated-array
        save natively (primary writes, every process participates in the
        barriers), while numpy trees make its internal collectives diverge
        (measured: gloo payload mismatch crash). The info record and pruning
        are this class's own bookkeeping and run on process 0 only."""
        primary = jax.process_index() == 0
        path = self._epoch_dir(epoch)
        if primary and os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()

        info = self.info()
        info["latest"] = epoch
        epochs = info.setdefault("epochs", [])
        if epoch not in epochs:  # re-saving an epoch (resume+retrain) is not a dup
            epochs.append(epoch)
        is_best = acc is not None and (
            info["best_acc"] is None or acc > info["best_acc"]
        )
        if is_best:
            info["best"] = epoch
            info["best_acc"] = acc
        if primary:
            self._write_info(info)
            self._prune(info)
        return is_best

    def _prune(self, info: Dict[str, Any]) -> None:
        keep = {info.get("latest"), info.get("best")}
        for epoch in list(info.get("epochs", [])):
            if epoch in keep:
                continue
            if self.save_all_from is not None and epoch >= self.save_all_from:
                continue
            path = self._epoch_dir(epoch)
            if os.path.exists(path):
                shutil.rmtree(path)
            info["epochs"].remove(epoch)
        self._write_info(info)

    # -- mid-epoch preemption points (engine.checkpoint_steps) ----------------

    def save_step(self, state, epoch: int, next_step: int) -> None:
        """Save a mid-epoch preemption point: ``next_step`` batches of
        ``epoch`` are done, resume starts at batch index ``next_step``.

        Exactly one step checkpoint exists at a time. Crash-safe ordering
        mirrors ``save``: finalize the new dir, flip the info record, only
        then delete the superseded dir — a crash at any point leaves
        info.json pointing at a finalized directory."""
        primary = jax.process_index() == 0
        prev = self.info().get("step_latest")
        path = self._step_dir(epoch, next_step)
        if primary and os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        info = self.info()
        info["step_latest"] = [epoch, next_step]
        if primary:
            self._write_info(info)
            if prev is not None and list(prev) != [epoch, next_step]:
                old = self._step_dir(*prev)
                if os.path.exists(old):
                    shutil.rmtree(old)

    def clear_step(self) -> None:
        """Drop the step checkpoint once its epoch's full save supersedes it
        (info first, then the dir — same crash-safe order as save_step)."""
        info = self.info()
        prev = info.get("step_latest")
        if prev is None:
            return
        info["step_latest"] = None
        if jax.process_index() == 0:
            self._write_info(info)
            old = self._step_dir(*prev)
            if os.path.exists(old):
                shutil.rmtree(old)

    def step_info(self) -> Optional[Tuple[int, int]]:
        """(epoch, next_step) of the live mid-epoch checkpoint, if any."""
        v = self.info().get("step_latest")
        return (int(v[0]), int(v[1])) if v else None

    def restore_step(self, state_template) -> Tuple[Any, int, int]:
        """Restore the mid-epoch checkpoint; returns (state, epoch, next_step)."""
        latest = self.step_info()
        if latest is None:
            raise FileNotFoundError(
                f"no mid-epoch checkpoint recorded under {self.directory}"
            )
        epoch, next_step = latest
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        state = self._ckptr.restore(self._step_dir(epoch, next_step), abstract)
        return state, epoch, next_step

    def resolve(self, which: Union[str, int]) -> int:
        info = self.info()
        if which in ("best", "latest"):
            epoch = info.get(which)
            if epoch is None:
                raise FileNotFoundError(
                    f"no {which!r} checkpoint recorded under {self.directory}"
                )
            return epoch
        return int(which)

    def restore(self, state_template, which: Union[str, int] = "latest") -> Tuple[Any, int]:
        """Restore into the structure of ``state_template``; returns (state, epoch)."""
        epoch = self.resolve(which)
        path = self._epoch_dir(epoch)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        try:
            state = self._ckptr.restore(path, abstract)
        except Exception as e:
            # param-tree mismatches are most commonly a config drift between
            # the run dir and the restoring process; the known historical one
            # is core_bias (b_core_q/b_core_v added to MUTAN fusions,
            # default true) — pre-change run dirs need core_bias=false
            if "b_core" in str(e) or "core_bias" in str(e):
                raise RuntimeError(
                    f"checkpoint restore failed with a core-bias param-tree "
                    f"mismatch; this run dir predates fusion.core_bias=true "
                    f"(the default) — resume with --opt "
                    f"model.fusion.core_bias=false (and --opt "
                    f"model.attention.core_bias=false for att models)"
                ) from e
            raise
        return state, epoch

    @property
    def best_acc(self) -> Optional[float]:
        return self.info().get("best_acc")
