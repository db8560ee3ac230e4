"""Gradient accumulation (optim.grad_accum, SURVEY.md C18 extension).

k micro-batch gradients accumulate (mean) into ONE applied update — an
effective batch of k*batch_size without the HBM footprint. Oracle: the
accumulated update must equal a single grad_accum=1 update on the mean
gradient, with clip/decay inside the accumulation boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.config import OptimOptions
from vqa_tpu.engine.optim import factory, make_schedule


def _tree(seed):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.standard_normal((4, 3)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((3,)), jnp.float32),
    }


def _apply(tx, params, grads_seq):
    state = tx.init(params)
    trace = []
    for g in grads_seq:
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        trace.append(params)
    return params, trace


def test_accumulated_update_equals_big_batch_update():
    k = 3
    base = dict(lr=0.01, optimizer="adam", grad_clip=0.7, weight_decay=1e-3)
    tx_acc = factory(OptimOptions(grad_accum=k, **base))
    tx_big = factory(OptimOptions(grad_accum=1, **base))

    params = _tree(0)
    micro = [_tree(10 + i) for i in range(k)]
    mean_grad = jax.tree.map(lambda *gs: sum(gs) / k, *micro)

    p_acc, trace = _apply(tx_acc, params, micro)
    p_big, _ = _apply(tx_big, params, [mean_grad])

    # non-boundary micro-steps must not move the params at all
    for mid in trace[:-1]:
        for a, b in zip(jax.tree.leaves(mid), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_lr_decay_boundary_counts_applied_updates_not_micro_steps():
    # steps_per_epoch=4 micro-steps, k=2 -> 2 APPLIED updates per epoch;
    # the staircase must drop lr after 2 applied updates, not 4.
    opt = OptimOptions(lr=0.1, optimizer="sgd", momentum=0.0,
                       lr_decay=0.5, grad_accum=2)
    sched = make_schedule(opt, steps_per_epoch=4)
    np.testing.assert_allclose(
        [float(sched(i)) for i in range(3)], [0.1, 0.1, 0.05], rtol=1e-6
    )

    tx = factory(opt, steps_per_epoch=4)
    params = {"w": jnp.zeros((2,), jnp.float32)}
    ones = {"w": jnp.ones((2,), jnp.float32)}
    p, trace = _apply(tx, params, [ones] * 8)
    w = [float(np.asarray(t["w"])[0]) for t in trace]
    # applied at micro-steps 2 and 4 with lr 0.1, then 6 and 8 with lr 0.05
    np.testing.assert_allclose(w[1], -0.1, rtol=1e-6)
    np.testing.assert_allclose(w[3], -0.2, rtol=1e-6)
    np.testing.assert_allclose(w[5], -0.25, rtol=1e-6)
    np.testing.assert_allclose(w[7], -0.30, rtol=1e-6)


def test_grad_accum_composes_with_tp_sharding():
    # MultiSteps nests the opt_state (acc_grads mirror the params); the
    # shape-based per-leaf TP rule must still lay it out and the sharded
    # step must match the replicated one.
    from vqa_tpu.engine.optim import criterion_factory
    from vqa_tpu.engine.steps import create_state, make_train_step
    from vqa_tpu.models import factory as model_factory
    from vqa_tpu.parallel import batch_sharding, make_mesh, replicated, shard_state_tp
    from vqa_tpu.config import ModelOptions

    B, R, DV, T, VOCAB, NANS = 8, 5, 12, 6, 31, 7
    model = model_factory(
        ModelOptions(
            arch="MLBAtt",
            seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 16},
            attention={"nb_glimpses": 2, "dim_h": 16},
            fusion={"arch": "mlb", "dim_h": 16},
        ),
        VOCAB, NANS,
    )
    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(rng.standard_normal((B, R, DV)), jnp.float32),
        "question": jnp.asarray(rng.integers(1, VOCAB, (B, T)), jnp.int32),
        "length": jnp.full((B,), T, jnp.int32),
        "answer": jnp.asarray(rng.integers(0, NANS, (B,)), jnp.int32),
    }
    params = model.init(
        jax.random.key(0), batch["visual"], batch["question"], batch["length"]
    )["params"]
    tx = factory(OptimOptions(lr=0.1, optimizer="sgd", momentum=0.0,
                              grad_accum=2))
    state = create_state(model, params, tx)
    step = make_train_step(criterion_factory(), donate=False)
    key = jax.random.key(1)

    mesh_dp = make_mesh(jax.devices(), model_parallel=1)
    s_dp = jax.device_put(state, replicated(mesh_dp))
    b_dp = jax.device_put(batch, batch_sharding(mesh_dp))
    mesh_tp = make_mesh(jax.devices(), model_parallel=2)
    s_tp = shard_state_tp(state, mesh_tp, min_size=64)
    b_tp = jax.device_put(batch, batch_sharding(mesh_tp))

    for _ in range(2):  # one full accumulation window
        s_dp, m_dp = step(s_dp, b_dp, key)
        s_tp, m_tp = step(s_tp, b_tp, key)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5)
    for x, y in zip(
        jax.tree.leaves(jax.device_get(s_dp.params)),
        jax.tree.leaves(jax.device_get(s_tp.params)),
    ):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-5)
    # the window closed: params actually moved
    moved = any(
        not np.allclose(x, y)
        for x, y in zip(jax.tree.leaves(jax.device_get(s_dp.params)),
                        jax.tree.leaves(params))
    )
    assert moved


def test_train_step_runs_under_grad_accum():
    # engine smoke: the jitted train step accepts a MultiSteps-wrapped tx
    # (opt_state tree changes shape; step counts micro-steps) and learns.
    from vqa_tpu.config import ModelOptions
    from vqa_tpu.engine.optim import criterion_factory
    from vqa_tpu.engine.steps import create_state, make_train_step
    from vqa_tpu.models import factory as model_factory

    B, R, DV, T, VOCAB, NANS = 4, 5, 12, 6, 19, 7
    mopt = ModelOptions(
        arch="MLBAtt",
        seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 12},
        attention={"nb_glimpses": 2, "dim_h": 10},
        fusion={"arch": "mlb", "dim_h": 10},
    )
    model = model_factory(mopt, VOCAB, NANS)
    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(rng.standard_normal((B, R, DV)), jnp.float32),
        "question": jnp.asarray(rng.integers(1, VOCAB, (B, T)), jnp.int32),
        "length": jnp.full((B,), T, jnp.int32),
        "answer": jnp.asarray(rng.integers(0, NANS, (B,)), jnp.int32),
    }
    params = model.init(
        jax.random.key(0), batch["visual"], batch["question"], batch["length"]
    )["params"]
    tx = factory(OptimOptions(lr=0.01, optimizer="adam", grad_accum=2), 1)
    state = create_state(model, params, tx)
    step = make_train_step(criterion_factory(), donate=False)
    key = jax.random.key(0)
    first = None
    for _ in range(80):
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(first)
    assert float(metrics["loss"]) < first * 0.7, (first, float(metrics["loss"]))
    assert int(state.step) == 80
