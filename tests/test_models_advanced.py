"""MFB/MFH co-attention + Chain-of-Reasoning tests (SURVEY.md C12, C13)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.config import ModelOptions
from vqa_tpu.models import factory

B, R, DV, T, VOCAB, NANS = 3, 6, 16, 7, 23, 11


def _mfb_opt(arch="MFBCoAtt", **fus_extra):
    return ModelOptions(
        arch=arch,
        seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 12, "return_sequence": True},
        attention={"nb_glimpses": 2, "dim_h": 10, "question_glimpses": 2, "dropout": 0.1},
        fusion={"arch": "mfb" if arch == "MFBCoAtt" else "mfh",
                "pool_factor": 3, "dim_mm": 8, "dropout_pre": 0.1, **fus_extra},
        classif={},
    )


def _cor_opt(steps=3):
    return ModelOptions(
        arch="CoR",
        seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 12},
        attention={},
        fusion={"arch": "cor", "dim_h": 10, "dropout": 0.1},
        classif={},
        extra={"chain": {"steps": steps}},
    )


def _inputs(rng):
    visual = jnp.asarray(rng.standard_normal((B, R, DV)), jnp.float32)
    question = jnp.asarray(rng.integers(1, VOCAB, (B, T)), jnp.int32)
    lengths = jnp.asarray([T, 4, 2], jnp.int32)
    question = question * (jnp.arange(T)[None, :] < lengths[:, None])
    return visual, question, lengths


@pytest.mark.parametrize("arch", ["MFBCoAtt", "MFHCoAtt", "CoR"])
def test_forward_shapes(arch):
    rng = np.random.default_rng(0)
    visual, question, lengths = _inputs(rng)
    opt = _cor_opt() if arch == "CoR" else _mfb_opt(arch)
    model = factory(opt, VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    logits = model.apply(params, visual, question, lengths)
    assert logits.shape == (B, NANS)
    assert jnp.isfinite(logits).all()
    # train mode runs with dropout rng
    out = model.apply(params, visual, question, lengths, train=True,
                      rngs={"dropout": jax.random.key(1)})
    assert out.shape == (B, NANS)


@pytest.mark.parametrize("arch", ["MFBCoAtt", "CoR"])
def test_padding_invariance(arch):
    """Pad tokens (id 0) are invisible on either side: right-padded and
    left-padded questions encode identically (masked question self-attention
    for MFB; masked LSTM carry for CoR)."""
    rng = np.random.default_rng(1)
    visual, question, lengths = _inputs(rng)
    opt = _cor_opt() if arch == "CoR" else _mfb_opt(arch)
    model = factory(opt, VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    base = model.apply(params, visual, question, lengths)
    left = np.zeros_like(np.asarray(question))
    for b in range(B):
        L = int(lengths[b])
        left[b, T - L :] = np.asarray(question)[b, :L]
    out = model.apply(params, visual, jnp.asarray(left), lengths)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-5)
    changed = question.at[2, 0].set((int(question[2, 0]) % (VOCAB - 1)) + 1)
    out2 = model.apply(params, visual, changed, lengths)
    assert not np.allclose(np.asarray(base[2]), np.asarray(out2[2]))


def test_mfh_concatenates_blocks():
    """MFH output feeds classifier with order*dim_mm features."""
    rng = np.random.default_rng(2)
    visual, question, lengths = _inputs(rng)
    model = factory(_mfb_opt("MFHCoAtt", mfh_order=2), VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    kernel = params["params"]["classifier"]["logits"]["kernel"]
    assert kernel.shape[0] == 2 * 8  # mfh_order * dim_mm


def test_cor_steps_change_output():
    rng = np.random.default_rng(3)
    visual, question, lengths = _inputs(rng)
    m1 = factory(_cor_opt(steps=1), VOCAB, NANS)
    m3 = factory(_cor_opt(steps=3), VOCAB, NANS)
    p3 = m3.init(jax.random.key(0), visual, question, lengths)
    out3 = m3.apply(p3, visual, question, lengths)
    # same params applied with steps=1 structure differ (gate dim differs),
    # so just check 3-step output is finite and the scan produced params once
    chain_params = p3["params"]["chain"]
    # shared weights across steps: rel_src kernel is a single [D,d] matrix
    assert chain_params["rel_src"]["kernel"].ndim == 2
    assert jnp.isfinite(out3).all()
    p1 = m1.init(jax.random.key(0), visual, question, lengths)
    assert p1["params"]["step_gates"]["kernel"].shape[-1] == 1
    assert p3["params"]["step_gates"]["kernel"].shape[-1] == 3


def test_cor_unroll_matches_scan():
    """chain.unroll (the r3 perf default) must be a pure compilation choice:
    identical params tree and identical outputs vs the rolled lax.scan —
    eval AND train (same dropout rng folding per step)."""
    rng = np.random.default_rng(9)
    visual, question, lengths = _inputs(rng)
    opt_u, opt_s = _cor_opt(), _cor_opt()
    opt_s.extra = {"chain": {"steps": 3, "unroll": False}}
    mu, ms = factory(opt_u, VOCAB, NANS), factory(opt_s, VOCAB, NANS)
    p = mu.init(jax.random.key(0), visual, question, lengths)
    assert jax.tree.structure(p) == jax.tree.structure(
        ms.init(jax.random.key(0), visual, question, lengths)
    )
    np.testing.assert_allclose(
        np.asarray(mu.apply(p, visual, question, lengths)),
        np.asarray(ms.apply(p, visual, question, lengths)),
        rtol=1e-6, atol=1e-6,
    )
    drop = {"dropout": jax.random.key(7)}
    np.testing.assert_allclose(
        np.asarray(mu.apply(p, visual, question, lengths, train=True, rngs=drop)),
        np.asarray(ms.apply(p, visual, question, lengths, train=True, rngs=drop)),
        rtol=1e-6, atol=1e-6,
    )


def test_cor_visual_actually_used():
    rng = np.random.default_rng(4)
    visual, question, lengths = _inputs(rng)
    model = factory(_cor_opt(), VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    a = model.apply(params, visual, question, lengths)
    b = model.apply(params, visual * 0.3 + 1.0, question, lengths)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_cor_attention_map():
    """CoR exposes per-step object attention (the lineage's qualitative
    visualization; cli/visu.py consumes the same [B, N, G] contract)."""
    rng = np.random.default_rng(3)
    visual, question, lengths = _inputs(rng)
    steps = 3
    model = factory(_cor_opt(steps), VOCAB, NANS)
    params = model.init(jax.random.key(0), visual, question, lengths)
    logits, alpha = model.apply(
        params, visual, question, lengths, return_attention=True
    )
    assert alpha.shape == (B, R, steps)
    np.testing.assert_allclose(np.asarray(alpha).sum(axis=1), 1.0, rtol=1e-5)
    plain = model.apply(params, visual, question, lengths)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(plain), rtol=1e-6)
