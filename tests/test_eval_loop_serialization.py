"""Regression pins for the XLA:CPU collective-deadlock fix (SURVEY.md C16).

r5s25: XLA:CPU's in-process collectives hard-deadlock under CONCURRENT
sharded executions (rendezvous participants of different executions starve
each other's pool threads; even the dispatching thread can wedge inside an
eager dispatch). The fix in engine._eval_loop/_readback_stacked is
structural: on the CPU backend, at most one sharded execution is in flight
during eval — each dispatch is followed by a block (VQA_TPU_CPU_EVAL_INFLIGHT
default 0), and the readback drains then runs ONE jitted stack instead of a
burst of eager per-leaf stacks. These tests pin that contract so a refactor
can't silently regress to unbounded dispatch (the failure is an intermittent
process ABORT ~1-in-2 full-suite runs — far too expensive to rediscover).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vqa_tpu.engine import engine as engine_mod


class _Loader:
    def __init__(self, n_batches, batch=8):
        self.n_batches = n_batches
        self.batch = batch

    def epoch(self, epoch=0):
        for i in range(self.n_batches):
            yield {
                "x": jnp.ones((self.batch, 4), jnp.float32) * (i + 1),
                "question_id": np.arange(self.batch) + i * self.batch,
            }


def _run_loop(monkeypatch, env=None):
    """Drive _eval_loop with a fake eval_step, recording the dispatch/block
    interleaving via a monkeypatched jax.block_until_ready."""
    events = []
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)

    real_block = jax.block_until_ready

    def spy_block(tree):
        events.append(("block", len([e for e in events if e[0] == "dispatch"])))
        return real_block(tree)

    monkeypatch.setattr(engine_mod.jax, "block_until_ready", spy_block)

    def eval_step(state, batch, features):
        events.append(("dispatch", None))
        s = jnp.sum(batch["x"], axis=1)
        return {
            "pred": jnp.argmax(batch["x"], axis=1),
            "n": jnp.asarray(s.shape[0]),
        }

    metrics, results = engine_mod._eval_loop(
        _Loader(6), state=None, eval_step=eval_step,
        aid_to_ans=[str(i) for i in range(8)], epoch=0,
    )
    return events, metrics, results


def test_cpu_eval_dispatch_is_serialized(monkeypatch):
    """Default on the CPU backend: every dispatch is followed by a block
    before the next dispatch (window 0 — at most ONE sharded execution in
    flight; the deadlock needs two)."""
    assert jax.default_backend() == "cpu"  # conftest forces the CPU mesh
    events, metrics, results = _run_loop(monkeypatch)
    dispatches = [i for i, e in enumerate(events) if e[0] == "dispatch"]
    assert len(dispatches) == 6
    # between any two consecutive dispatches there must be >=1 block
    for a, b in zip(dispatches, dispatches[1:]):
        assert any(events[i][0] == "block" for i in range(a + 1, b)), (
            "two eval dispatches with no block between them — the CPU "
            "in-flight bound regressed to concurrent execution"
        )
    assert metrics["n"] == 48 and len(results) == 48


def test_cpu_eval_window_env_override(monkeypatch):
    """VQA_TPU_CPU_EVAL_INFLIGHT=2 allows up to 2 outstanding dispatches
    after the window fills (the experimentation knob still works)."""
    events, _, _ = _run_loop(
        monkeypatch, env={"VQA_TPU_CPU_EVAL_INFLIGHT": "2"}
    )
    # first block happens only after the 3rd dispatch (len(outs) > 2)
    first_block = next(i for i, e in enumerate(events) if e[0] == "block")
    n_dispatched_before = sum(
        1 for e in events[:first_block] if e[0] == "dispatch"
    )
    assert n_dispatched_before == 3


def test_readback_single_jitted_stack_matches_eager(monkeypatch):
    """The CPU readback path (drain + one jitted stack) returns exactly what
    the eager per-leaf stack would."""
    outs = [
        {"pred": jnp.arange(4) + i, "n": jnp.asarray(4)} for i in range(3)
    ]
    got = engine_mod._readback_stacked(outs)
    want = jax.device_get(
        jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    )
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
