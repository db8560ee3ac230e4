"""Model-layer tests: shapes, attention semantics, fusion numerics vs
hand-computed einsum oracles (SURVEY.md section 4 "Unit")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.config import ModelOptions
from vqa_tpu.models import factory
from vqa_tpu.models.fusion import (
    MFBFusion,
    MLBFusion,
    MutanFusion,
    l2_normalize,
    signed_sqrt,
)

B, R, DV, T, VOCAB, NANS = 3, 5, 16, 7, 23, 11


def _model_opt(arch):
    return ModelOptions(
        arch=arch,
        seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 12},
        attention={"nb_glimpses": 2, "dim_h": 10, "dim_hq": 6, "dim_hv": 6, "dim_mm": 9, "R": 2},
        fusion={
            "arch": {"ConcatAtt": "concat", "MLBAtt": "mlb", "MutanAtt": "mutan",
                     "MLBNoAtt": "mlb", "MutanNoAtt": "mutan"}[arch],
            **({"dim_h": 10} if "MLB" in arch else {}),
            **({"dim_hq": 6, "dim_hv": 6, "dim_mm": 9, "R": 2} if "Mutan" in arch else {}),
        },
        classif={"dim_h": 10} if arch == "ConcatAtt" else {},
    )


def _inputs(rng, pooled=False):
    visual = jnp.asarray(rng.standard_normal((B, DV) if pooled else (B, R, DV)), jnp.float32)
    question = jnp.asarray(rng.integers(1, VOCAB, (B, T)), jnp.int32)
    lengths = jnp.asarray([T, 4, 2], jnp.int32)
    question = question * (jnp.arange(T)[None, :] < lengths[:, None])
    return visual, question, lengths


@pytest.mark.parametrize("arch", ["ConcatAtt", "MLBAtt", "MutanAtt", "MLBNoAtt", "MutanNoAtt"])
def test_forward_shapes_and_determinism(arch):
    rng = np.random.default_rng(0)
    pooled = "NoAtt" in arch
    visual, question, lengths = _inputs(rng, pooled=pooled)
    model = factory(_model_opt(arch), VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    logits = model.apply(params, visual, question, lengths)
    assert logits.shape == (B, NANS)
    assert jnp.isfinite(logits).all()
    logits2 = model.apply(params, visual, question, lengths)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(logits2))
    # train mode with dropout rng differs from eval
    out_train = model.apply(
        params, visual, question, lengths, train=True,
        rngs={"dropout": jax.random.key(1)},
    )
    assert not np.allclose(np.asarray(out_train), np.asarray(logits))


def test_attention_alpha_normalized_and_used():
    rng = np.random.default_rng(1)
    visual, question, lengths = _inputs(rng)
    model = factory(_model_opt("MutanAtt"), VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    _, alpha = model.apply(
        params, visual, question, lengths, return_attention=True
    )
    assert alpha.shape == (B, R, 2)
    np.testing.assert_allclose(np.asarray(alpha.sum(axis=1)), 1.0, rtol=1e-5)


def test_lstm_padding_invariance():
    """Padding (token id 0) must be invisible wherever it sits: the same
    content right-padded and left-padded encodes identically (masks come
    from token ids — vqa.pad is a supported knob on both sides)."""
    rng = np.random.default_rng(2)
    visual, question, lengths = _inputs(rng)
    model = factory(_model_opt("MLBAtt"), VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    base = model.apply(params, visual, question, lengths)
    # left-pad the same rows
    left = np.zeros_like(np.asarray(question))
    for b in range(B):
        L = int(lengths[b])
        left[b, T - L :] = np.asarray(question)[b, :L]
    out = model.apply(params, visual, jnp.asarray(left), lengths)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-5)
    # and real token content does matter
    changed = question.at[2, 0].set((int(question[2, 0]) % (VOCAB - 1)) + 1)
    out2 = model.apply(params, visual, changed, lengths)
    assert not np.allclose(np.asarray(base[2]), np.asarray(out2[2]))


def test_mlb_fusion_matches_numpy_oracle():
    q = jnp.asarray(np.random.default_rng(3).standard_normal((B, 6)), jnp.float32)
    v = jnp.asarray(np.random.default_rng(4).standard_normal((B, 8)), jnp.float32)
    mod = MLBFusion(dim_h=5, dropout_q=0.0, dropout_v=0.0)
    params = mod.init(jax.random.key(0), q, v)
    out = np.asarray(mod.apply(params, q, v))
    p = jax.tree.map(np.asarray, params["params"])
    oracle = np.tanh(q @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]) * np.tanh(
        v @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
    )
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_mutan_fusion_matches_einsum_oracle():
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, 6)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    mod = MutanFusion(dim_hq=4, dim_hv=4, dim_mm=7, R=3, dropout_q=0.0, dropout_v=0.0)
    params = mod.init(jax.random.key(0), q, v)
    out = np.asarray(mod.apply(params, q, v))
    p = jax.tree.map(np.asarray, params["params"])
    qt = np.tanh(q @ p["q_proj"]["kernel"] + p["q_proj"]["bias"])
    vt = np.tanh(v @ p["v_proj"]["kernel"] + p["v_proj"]["bias"])
    # rank-R Tucker core as explicit loop oracle
    wq = p["w_core_q"].reshape(4, 3, 7)  # [dim_hq, R, dim_mm]
    wv = p["w_core_v"].reshape(4, 3, 7)
    z = np.zeros((B, 7), np.float32)
    for r in range(3):
        z += (qt @ wq[:, r, :]) * (vt @ wv[:, r, :])
    np.testing.assert_allclose(out, np.tanh(z), rtol=1e-4, atol=1e-5)


def test_mfb_pool_signed_sqrt_l2():
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((B, 6)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 8)), jnp.float32)
    mod = MFBFusion(pool_factor=3, dim_mm=4, dropout_pre=0.0)
    params = mod.init(jax.random.key(0), q, v)
    out, pre = mod.apply(params, q, v)
    assert pre.shape == (B, 12) and out.shape == (B, 4)
    p = jax.tree.map(np.asarray, params["params"])
    prod = (q @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]) * (
        v @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
    )
    # strided pooling groups (see ops/mfb_pool.py): reshape (k, m), sum over k
    pooled = np.asarray(prod).reshape(B, 3, 4).sum(-2)
    ss = np.sign(pooled) * np.sqrt(np.abs(pooled) + 1e-12)
    oracle = ss / np.sqrt((ss**2).sum(-1, keepdims=True) + 1e-12)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-4, atol=1e-5)
    # unit norm
    np.testing.assert_allclose((np.asarray(out) ** 2).sum(-1), 1.0, rtol=1e-4)


def test_signed_sqrt_and_l2_helpers():
    x = jnp.asarray([-4.0, 0.0, 9.0])
    np.testing.assert_allclose(np.asarray(signed_sqrt(x)), [-2.0, 0.0, 3.0], atol=1e-5)
    n = np.asarray(l2_normalize(jnp.asarray([[3.0, 4.0]])))
    np.testing.assert_allclose(n, [[0.6, 0.8]], rtol=1e-6)


def test_factory_unknown_arch():
    with pytest.raises(KeyError):
        factory(ModelOptions(arch="Nope"), VOCAB, NANS)
