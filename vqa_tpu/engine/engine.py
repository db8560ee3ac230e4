"""Epoch loops (SURVEY.md C16, call stacks 3.1/3.2).

train():    step loop over the pipeline, jitted train_step, meters + logging
validate(): eval loop -> top-1/top-5 accuracy + OpenEnded results list
test():     eval loop without labels -> OpenEnded results list (C22)

Host<->device traffic per step: one async device_put of the batch (done on
the pipeline's background thread via ``transform``) and one small metrics
fetch. Question ids stay host-side.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.engine.logger import Experiment
from vqa_tpu.engine.meters import MeterBank

DEVICE_KEYS = ("visual", "image_index", "question", "length", "answer", "valid")

# -- preemption (SIGTERM -> checkpoint at the next step boundary) -------------
# Preemptible TPU VMs get SIGTERM with a grace period before eviction; the
# handler only sets a flag (async-signal-safe), and the train loop saves a
# mid-epoch checkpoint at the next step boundary and raises Preempted so the
# CLI can exit cleanly — the run then resumes with --resume latest losing
# zero steps instead of up to checkpoint_steps of work.

import threading as _threading

_PREEMPT = _threading.Event()


class Preempted(Exception):
    """Raised by train() after the preemption checkpoint landed."""

    def __init__(self, epoch: int, next_step: int):
        super().__init__(f"preempted at epoch {epoch}, step {next_step}")
        self.epoch = epoch
        self.next_step = next_step


def request_preemption() -> None:
    """Flag the train loop to checkpoint-and-stop at the next boundary."""
    _PREEMPT.set()


def install_preemption_handler() -> bool:
    """SIGTERM -> request_preemption(). Returns False when not installable
    (signal handlers only work on the main thread). Clears any stale flag."""
    import signal

    if _threading.current_thread() is not _threading.main_thread():
        return False
    _PREEMPT.clear()
    signal.signal(signal.SIGTERM, lambda *_: _PREEMPT.set())
    return True


def make_device_transform(sharding=None, dtype=None, multihost=None):
    """Pipeline transform: put compute keys on device, keep qids on host.

    ``multihost`` (only meaningful when ``jax.process_count() > 1``; see
    parallel/distributed.py ADR) selects how a host's arrays become global:
      'shard'     — this host carries ONLY its input shard (train path:
                    per-host BatchIterator sharding); assembled with
                    make_array_from_process_local_data.
      'replicate' — this host carries the FULL batch (eval path: every host
                    iterates the whole split); each host serves its devices'
                    slices via make_array_from_callback.
    Both are collective-free by construction. device_put onto a multi-
    process sharding is NOT usable here: it issues an assert_equal
    allgather, and this transform runs in the loader's prefetch thread —
    a collective there races the main thread's collectives and crashes
    gloo/ICI with a payload mismatch (measured in the 2-process test)."""

    def _globalize(arr):
        if multihost == "shard":
            return jax.make_array_from_process_local_data(sharding, arr)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    def transform(batch: Dict[str, np.ndarray]):
        device_part = {}
        for key in DEVICE_KEYS:
            if key in batch:
                arr = batch[key]
                if dtype is not None and arr.dtype == np.float32:
                    arr = arr.astype(dtype)
                device_part[key] = arr
        if multihost is not None and jax.process_count() > 1:
            device_part = {
                k: _globalize(np.asarray(v)) for k, v in device_part.items()
            }
        else:
            device_part = (
                jax.device_put(device_part, sharding)
                if sharding is not None
                else jax.device_put(device_part)
            )
        device_part["question_id"] = batch["question_id"]
        if "valid" in batch:
            device_part["valid_host"] = batch["valid"]
        return device_part

    return transform


def _readback_stacked(outs):
    """Stack per-batch eval outputs and bring them to THIS host.

    Single-process: plain stack + device_get (the benched path, unchanged).
    Multi-process (parallel/distributed.py): the outputs are sharded over a
    global mesh, so device_get of non-addressable shards would fail — one
    jitted stack re-replicates everything first (every host fed the full
    batches in 'replicate' mode, so the values are identical everywhere)."""
    if jax.process_count() == 1:
        if jax.default_backend() == "cpu":
            # drain, then ONE jitted stack: the eager per-leaf stacks below
            # are a burst of concurrent sharded executions — exactly the
            # XLA:CPU in-process-collective deadlock surface (r5s25: the
            # suite abort's main thread was blocked INSIDE one of these
            # eager stack dispatches in a circular wait with in-flight
            # eval executions; see _eval_loop). TPU path unchanged below.
            jax.block_until_ready(outs)
            stacked = jax.jit(
                lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
            )(outs)
            return jax.device_get(stacked)
        return jax.device_get(jax.tree.map(lambda *xs: jnp.stack(xs), *outs))
    from jax.sharding import NamedSharding, PartitionSpec as P

    first = jax.tree.leaves(outs[0])[0]
    rep = NamedSharding(first.sharding.mesh, P())
    jax.block_until_ready(outs)  # same CPU deadlock surface as above
    stacked = jax.jit(
        lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts),
        out_shardings=rep,
    )(outs)
    return jax.device_get(stacked)


def _split_batch(batch):
    device_batch = {k: v for k, v in batch.items() if k not in ("question_id", "valid_host")}
    return device_batch, batch["question_id"], batch.get("valid_host")


def train(
    loader,
    state,
    train_step,
    rng: jax.Array,
    exp: Optional[Experiment],
    epoch: int,
    print_freq: int = 10,
    features=None,
    start_step: int = 0,
    checkpoint_every: int = 0,
    step_checkpoint=None,
) -> Tuple[Any, Dict[str, float]]:
    """One training epoch. ``start_step``/``checkpoint_every``/
    ``step_checkpoint`` implement mid-epoch preemption points
    (engine.checkpoint_steps): the epoch stream is a pure function of
    (seed, epoch), so skipping the first ``start_step`` batches after a
    restore replays the interrupted epoch exactly — and dropout folds
    ``state.step``, so the resumed run is bit-identical to an
    uninterrupted one. ``step_checkpoint(state, epoch, next_step)`` is
    called after every ``checkpoint_every`` executed steps (never on the
    last step — the epoch save supersedes it). Logged epoch averages
    cover only the executed steps of a resumed epoch."""
    meters = MeterBank()
    steps_total = loader.steps_per_epoch()
    step_metrics: list = []  # device-side; one stacked transfer at epoch end
    t_data = time.perf_counter()
    for i, batch in enumerate(loader.epoch(epoch)):
        if i < start_step:
            t_data = time.perf_counter()
            continue
        device_batch, _, _ = _split_batch(batch)
        data_time = time.perf_counter() - t_data
        state, metrics = train_step(state, device_batch, rng, features)
        step_metrics.append(metrics)
        if step_checkpoint is not None and _PREEMPT.is_set():
            # SIGTERM landed: save NOW (not at the periodic boundary) and
            # hand control back — the grace period is short
            step_checkpoint(state, epoch, i + 1)
            raise Preempted(epoch, i + 1)
        if (
            checkpoint_every
            and step_checkpoint is not None
            and (i + 1) % checkpoint_every == 0
            and i + 1 < steps_total
        ):
            step_checkpoint(state, epoch, i + 1)
        if print_freq and (i % print_freq == 0 or i + 1 == loader.steps_per_epoch()):
            # metrics fetch syncs; only do it on print steps
            host = {k: float(v) for k, v in metrics.items()}
            batch_time = time.perf_counter() - t_data - data_time
            print(
                f"Epoch [{epoch}][{i}/{loader.steps_per_epoch()}] "
                f"loss {host['loss']:.4f} acc1 {host['acc1']*100:.2f} "
                f"acc5 {host['acc5']*100:.2f} data {data_time:.3f}s",
                flush=True,
            )
            if exp is not None:
                exp.log_step(
                    epoch, "train", i,
                    {**host, "data_time": data_time, "batch_time": batch_time},
                )
        t_data = time.perf_counter()

    if step_metrics:
        stacked = jax.device_get(
            jax.tree.map(lambda *xs: jnp.stack(xs), *step_metrics)
        )
        for k, v in stacked.items():
            meters.update({k: float(np.mean(v))}, n=len(step_metrics))
    avgs = meters.averages()
    if exp is not None:
        exp.log_epoch(epoch, "train", avgs)
    return state, avgs


def _eval_loop(
    loader, state, eval_step, aid_to_ans: List[str], epoch: int, features=None
) -> Tuple[Dict[str, float], List[Dict[str, Any]]]:
    """Dispatch the whole epoch, then ONE device->host readback: per-batch
    syncs serialize eval on dispatch latency (this image's TPU tunnel costs
    ~27ms per sync; real chips pay less but still pay)."""
    total = {"n": 0, "n_labeled": 0, "correct1": 0, "correct5": 0}
    results: List[Dict[str, Any]] = []
    outs: List[Dict[str, jax.Array]] = []
    metas: List[Tuple[np.ndarray, Any]] = []
    # XLA:CPU's in-process collectives can HARD-DEADLOCK under concurrent
    # sharded executions: a rendezvous waits for participants whose work is
    # queued behind pool threads blocked in OTHER executions' rendezvous,
    # and even the dispatching thread can wedge in the circular wait —
    # observed as the intermittent full-suite abort at ~test 270 (r5s25:
    # with the rendezvous termination timeout raised to 1200s the stall ran
    # its full length and the missing participants NEVER arrived — a
    # deadlock, not starvation; a window of 4 still deadlocked). On the CPU
    # backend, serialize eval executions outright (window 0 = block each
    # dispatch; env-overridable for experiments). The TPU path stays
    # sync-free (the tunnel charges ~27ms per sync, and TPU executions
    # don't share a starvable host thread pool).
    cpu_serial = jax.default_backend() == "cpu"
    window = int(os.environ.get("VQA_TPU_CPU_EVAL_INFLIGHT", "0"))
    t0 = time.perf_counter()
    for batch in loader.epoch(epoch):
        device_batch, question_ids, valid_host = _split_batch(batch)
        outs.append(eval_step(state, device_batch, features))
        metas.append((question_ids, valid_host))
        if cpu_serial and len(outs) > window:
            jax.block_until_ready(outs[len(outs) - 1 - window])
    if not outs:
        return {"n": 0, "eval_time": 0.0, "qa_per_sec": 0.0}, []
    # batches can differ in question length (bucketing) but outputs are
    # shape-uniform, so a single stacked transfer covers the epoch
    stacked = _readback_stacked(outs)
    n_seen = 0
    for i, (question_ids, valid_host) in enumerate(metas):
        pred = stacked["pred"][i]
        if valid_host is not None:
            pred = pred[valid_host]
            question_ids = question_ids[valid_host]
        for qid, aid in zip(question_ids.tolist(), pred.tolist()):
            results.append({"question_id": qid, "answer": aid_to_ans[aid]})
        total["n"] += int(stacked["n"][i])
        if "correct1" in stacked:
            total["n_labeled"] += int(stacked["n_labeled"][i])
            total["correct1"] += int(stacked["correct1"][i])
            total["correct5"] += int(stacked["correct5"][i])
        n_seen += len(pred)
    wall = time.perf_counter() - t0
    metrics = {
        "n": total["n"],
        "eval_time": wall,
        "qa_per_sec": n_seen / wall if wall > 0 else 0.0,
    }
    if total["n_labeled"]:
        # acc1/acc5 are reference-comparable: every evaluated example is in
        # the denominator, so rows whose consensus answer is OOV (answer=-1)
        # count as incorrect — matching the lineage's val top-1. The
        # *_labeled variants use only in-vocab rows; both denominators are
        # recorded in metrics.jsonl (n vs n_labeled).
        metrics["n_labeled"] = total["n_labeled"]
        metrics["acc1"] = total["correct1"] / total["n"]
        metrics["acc5"] = total["correct5"] / total["n"]
        metrics["acc1_labeled"] = total["correct1"] / total["n_labeled"]
        metrics["acc5_labeled"] = total["correct5"] / total["n_labeled"]
    return metrics, results


def validate(
    loader, state, eval_step, aid_to_ans: List[str],
    exp: Optional[Experiment], epoch: int, split: str = "val", features=None,
) -> Tuple[float, List[Dict[str, Any]]]:
    metrics, results = _eval_loop(loader, state, eval_step, aid_to_ans, epoch, features)
    if exp is not None:
        exp.log_epoch(epoch, split, metrics)
        exp.write_results(results, epoch, split)
    acc1 = metrics.get("acc1", 0.0)
    print(
        f"Eval [{epoch}] {split}: acc1 {acc1*100:.2f} "
        f"acc5 {metrics.get('acc5', 0.0)*100:.2f} "
        f"({metrics['qa_per_sec']:.0f} QA/s)",
        flush=True,
    )
    return acc1, results


def test(
    loader, state, eval_step, aid_to_ans: List[str],
    exp: Optional[Experiment], epoch: int, split: str = "test", features=None,
) -> List[Dict[str, Any]]:
    metrics, results = _eval_loop(loader, state, eval_step, aid_to_ans, epoch, features)
    if exp is not None:
        exp.log_epoch(epoch, split, metrics)
        exp.write_results(results, epoch, split)
    return results
