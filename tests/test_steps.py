"""Jitted step unit tests (SURVEY.md C16): overfit one batch, eval masking."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.config import ModelOptions, OptimOptions
from vqa_tpu.engine.optim import criterion_factory, factory as optim_factory
from vqa_tpu.engine.steps import create_state, make_eval_step, make_train_step
from vqa_tpu.models import factory

B, R, DV, T, VOCAB, NANS = 8, 5, 12, 6, 19, 7


def _setup():
    opt = ModelOptions(
        arch="MLBAtt",
        seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 12},
        attention={"nb_glimpses": 2, "dim_h": 10},
        fusion={"arch": "mlb", "dim_h": 10},
    )
    model = factory(opt, VOCAB, NANS)
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
    tx = optim_factory(OptimOptions(lr=0.01, optimizer="adam"), 1)
    return create_state(model, params, tx), batch


def test_train_step_overfits_single_batch():
    state, batch = _setup()
    train_step = make_train_step(criterion_factory(), donate=False)
    rng = jax.random.key(0)
    first = None
    for _ in range(60):
        state, metrics = train_step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    # dropout stays active (train=True), so demand clear learning, not zero loss
    assert last < first * 0.5, (first, last)
    assert float(metrics["acc1"]) >= 0.75
    assert int(state.step) == 60


def test_train_step_device_feature_gather_matches_direct():
    state, batch = _setup()
    train_step = make_train_step(criterion_factory(), donate=False)
    rng = jax.random.key(0)
    _, m_direct = train_step(state, batch, rng)

    # same visuals through the HBM-table path
    features = batch["visual"]
    indexed = dict(batch)
    del indexed["visual"]
    indexed["image_index"] = jnp.arange(B, dtype=jnp.int32)
    _, m_indexed = train_step(state, indexed, rng, features)
    np.testing.assert_allclose(
        float(m_direct["loss"]), float(m_indexed["loss"]), rtol=1e-6
    )


def test_int8_feature_table_close_to_direct():
    """engine.features_dtype=int8: per-row quantized table + in-step dequant
    tracks the float path within quantization tolerance."""
    from vqa_tpu.engine.steps import quantize_features

    state, batch = _setup()
    train_step = make_train_step(criterion_factory(), donate=False)
    rng = jax.random.key(0)
    _, m_direct = train_step(state, batch, rng)

    values, scales = quantize_features(np.asarray(batch["visual"]))
    # round trip error bounded by scale/2 per element
    deq = values.astype(np.float32) * scales
    err = np.abs(deq - np.asarray(batch["visual"]))
    assert (err <= scales / 2 + 1e-6).all()

    indexed = dict(batch)
    del indexed["visual"]
    indexed["image_index"] = jnp.arange(B, dtype=jnp.int32)
    features = (jnp.asarray(values), jnp.asarray(scales))
    _, m_q = train_step(state, indexed, rng, features)
    np.testing.assert_allclose(
        float(m_direct["loss"]), float(m_q["loss"]), rtol=0.05, atol=0.02
    )


def test_eval_step_masks_invalid_and_negative_labels():
    state, batch = _setup()
    eval_step = make_eval_step()
    batch = dict(batch)
    batch["valid"] = jnp.asarray([True] * 6 + [False] * 2)
    batch["answer"] = batch["answer"].at[0].set(-1)  # OOV consensus in val
    out = eval_step(state, batch)
    assert int(out["n"]) == 6
    assert int(out["n_labeled"]) == 5
    assert int(out["correct1"]) <= 5