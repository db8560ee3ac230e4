"""TP seam (SURVEY.md section 2.3): sharded-over-'model' params produce the
same numbers as replicated params, and the train step runs on a 2-D mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.config import ModelOptions, OptimOptions
from vqa_tpu.engine.optim import criterion_factory, factory as optim_factory
from vqa_tpu.engine.steps import create_state, make_train_step
from vqa_tpu.models import factory
from vqa_tpu.parallel import batch_sharding, make_mesh, replicated, shard_state_tp
from vqa_tpu.parallel.partition import tp_shardings

B, R, DV, T, VOCAB, NANS = 16, 5, 16, 6, 31, 11


def _setup():
    model = factory(
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
    # sgd: the update is lr*grad, so cross-layout float noise stays
    # proportional (adam's g/sqrt(v) amplifies near-zero-grad noise to O(lr))
    tx = optim_factory(OptimOptions(lr=0.1, optimizer="sgd", momentum=0.0), 1)
    state = create_state(model, params, tx)
    return model, state, batch


def test_tp_layout_shards_big_2d_leaves():
    _, state, _ = _setup()
    mesh = make_mesh(jax.devices(), model_parallel=2)  # 4x2
    shardings = tp_shardings(state.params, mesh, min_size=64)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = [s for _, s in flat if "model" in str(s.spec)]
    assert sharded, "no parameter picked up the model axis"
    # embedding table [31, 8]: 31 not divisible by 2 -> replicated
    emb = dict(
        (jax.tree_util.keystr(k), s) for k, s in flat
    )["['encoder']['embed']['embedding']"]
    assert "model" not in str(emb.spec)


import pytest


@pytest.mark.parametrize("model_parallel", [2, 4])
def test_tp_train_step_matches_dp(model_parallel):
    model, state, batch = _setup()
    step = make_train_step(criterion_factory(), donate=False)
    rng = jax.random.key(1)

    mesh_dp = make_mesh(jax.devices(), model_parallel=1)   # 8x1
    state_dp = jax.device_put(state, replicated(mesh_dp))
    batch_dp = jax.device_put(batch, batch_sharding(mesh_dp))
    new_dp, m_dp = step(state_dp, batch_dp, rng)

    # 4x2 and 2x4 meshes: tp=4 additionally exercises leaves whose dims
    # divide by 2 but not 4 (they must fall back to replicated)
    mesh_tp = make_mesh(jax.devices(), model_parallel=model_parallel)
    state_tp = shard_state_tp(state, mesh_tp, min_size=64)
    batch_tp = jax.device_put(batch, batch_sharding(mesh_tp))
    new_tp, m_tp = step(state_tp, batch_tp, rng)

    np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5)
    # updated params numerically identical regardless of layout
    a = jax.tree.leaves(jax.device_get(new_dp.params))
    b = jax.tree.leaves(jax.device_get(new_tp.params))
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-5)
