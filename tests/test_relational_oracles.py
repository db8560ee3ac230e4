"""Numpy oracles for the TPU-first factorizations (SURVEY.md section 4):
CoR's pairwise-relation matmul and the masked question self-attention."""

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.models.cor import CoRStep
from vqa_tpu.models.mfb import QuestionSelfAttention

B, N, D, DQ = 3, 5, 8, 6


def test_cor_step_factorized_logits_match_pairwise_loop():
    rng = np.random.default_rng(0)
    objects = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, DQ)), jnp.float32)
    step = CoRStep(dim_h=D, dropout=0.0)
    params = step.init(jax.random.key(0), (objects, q), None)
    (new_objects, _), (decision, beta) = step.apply(params, (objects, q), None)
    assert new_objects.shape == (B, N, D) and decision.shape == (B, D)
    assert beta.shape == (B, N)
    np.testing.assert_allclose(np.asarray(beta).sum(-1), 1.0, rtol=1e-5)

    # oracle: explicit pairwise loop over (i, j) relations
    p = jax.tree.map(np.asarray, params["params"])
    o_np, q_np = np.asarray(objects), np.asarray(q)
    ph = np.tanh(o_np @ p["rel_src"]["kernel"] + p["rel_src"]["bias"])
    r = np.tanh(o_np @ p["rel_dst"]["kernel"] + p["rel_dst"]["bias"])
    g = np.tanh(q_np @ p["rel_guide"]["kernel"] + p["rel_guide"]["bias"])
    s = np.zeros((B, N, N), np.float32)
    for b in range(B):
        for i in range(N):
            for j in range(N):
                s[b, i, j] = np.sum(ph[b, i] * g[b] * r[b, j])
    s /= np.sqrt(D)
    alpha = np.exp(s - s.max(-1, keepdims=True))
    alpha /= alpha.sum(-1, keepdims=True)
    absorbed = np.einsum("bnm,bmd->bnd", alpha, r)
    update = (absorbed * (ph * g[:, None, :])) @ p["rel_to_obj"]["kernel"] + p["rel_to_obj"]["bias"]
    expected = o_np + np.tanh(update)
    np.testing.assert_allclose(np.asarray(new_objects), expected, rtol=1e-4, atol=1e-5)


def test_question_self_attention_masks_and_matches_numpy():
    rng = np.random.default_rng(1)
    T, H = 7, 8
    seq = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
    lengths = np.asarray([7, 4, 2])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    att = QuestionSelfAttention(glimpses=2, dim_h=6, dropout=0.0)
    params = att.init(jax.random.key(0), seq, mask)
    out = np.asarray(att.apply(params, seq, mask))
    assert out.shape == (B, 2 * H)

    p = jax.tree.map(np.asarray, params["params"])
    s_np = np.asarray(seq)
    h = np.maximum(s_np @ p["hidden"]["kernel"] + p["hidden"]["bias"], 0)
    logits = h @ p["logits"]["kernel"] + p["logits"]["bias"]  # [B, T, 2]
    for b, L in enumerate([7, 4, 2]):
        logits[b, L:] = -1e30
    alpha = np.exp(logits - logits.max(1, keepdims=True))
    alpha /= alpha.sum(1, keepdims=True)
    expected = np.einsum("btg,bth->bgh", alpha, s_np).reshape(B, -1)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    # masking: padded timesteps get zero weight
    corrupted = seq.at[1, 4:].set(99.0)
    out2 = np.asarray(att.apply(params, corrupted, mask))
    np.testing.assert_allclose(out[1], out2[1], atol=1e-5)
