"""Scan-LSTM vs torch.nn.LSTM numerics (SURVEY.md section 4 "Parity harness",
section 7 "cuDNN-LSTM vs scan-LSTM numerics": gate order i,f,g,o)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vqa_tpu.models.seq2vec import SeqEncoder

B, T, E, H, VOCAB = 4, 9, 5, 6, 30


def test_lstm_matches_torch_last_valid_state():
    rng = np.random.default_rng(0)
    tokens_np = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
    lengths_np = np.asarray([T, 5, 1, 7], np.int32)
    tokens_np = tokens_np * (np.arange(T)[None] < lengths_np[:, None])

    enc = SeqEncoder(vocab_size=VOCAB, emb_size=E, hidden_size=H, num_layers=1)
    params = enc.init(jax.random.key(0), jnp.asarray(tokens_np), jnp.asarray(lengths_np))
    ours = np.asarray(enc.apply(params, jnp.asarray(tokens_np), jnp.asarray(lengths_np)))

    p = jax.tree.map(np.asarray, params["params"])
    emb_table = p["embed"]["embedding"]
    wx, wh, b = p["lstm_0"]["wx"], p["lstm_0"]["wh"], p["lstm_0"]["b"]

    lstm = torch.nn.LSTM(E, H, batch_first=True)
    with torch.no_grad():
        # torch stores [4H, in] with gate order i,f,g,o — same as ours
        lstm.weight_ih_l0.copy_(torch.from_numpy(wx.T.copy()))
        lstm.weight_hh_l0.copy_(torch.from_numpy(wh.T.copy()))
        lstm.bias_ih_l0.copy_(torch.from_numpy(b.copy()))
        lstm.bias_hh_l0.zero_()
        emb = torch.from_numpy(emb_table[tokens_np])  # [B, T, E]
        out, _ = lstm(emb)
        theirs = np.stack(
            [out[i, lengths_np[i] - 1].numpy() for i in range(B)]
        )

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_two_layer_lstm_matches_torch_full_length():
    """Multi-layer stacking vs torch (full-length rows: identical semantics;
    at padded steps we zero inter-layer activations, torch propagates them,
    so parity is checked without padding)."""
    rng = np.random.default_rng(7)
    tokens_np = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
    lengths_np = np.full(B, T, np.int32)

    enc = SeqEncoder(vocab_size=VOCAB, emb_size=E, hidden_size=H, num_layers=2)
    params = enc.init(jax.random.key(1), jnp.asarray(tokens_np), jnp.asarray(lengths_np))
    ours = np.asarray(enc.apply(params, jnp.asarray(tokens_np), jnp.asarray(lengths_np)))

    p = jax.tree.map(np.asarray, params["params"])
    lstm = torch.nn.LSTM(E, H, num_layers=2, batch_first=True)
    with torch.no_grad():
        for layer in range(2):
            lp = p[f"lstm_{layer}"]
            getattr(lstm, f"weight_ih_l{layer}").copy_(torch.from_numpy(lp["wx"].T.copy()))
            getattr(lstm, f"weight_hh_l{layer}").copy_(torch.from_numpy(lp["wh"].T.copy()))
            getattr(lstm, f"bias_ih_l{layer}").copy_(torch.from_numpy(lp["b"].copy()))
            getattr(lstm, f"bias_hh_l{layer}").zero_()
        emb = torch.from_numpy(p["embed"]["embedding"][tokens_np])
        out, _ = lstm(emb)
        theirs = out[:, -1].numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_gru_matches_torch():
    rng = np.random.default_rng(1)
    tokens_np = rng.integers(1, VOCAB, (B, T)).astype(np.int32)
    lengths_np = np.full(B, T, np.int32)

    enc = SeqEncoder(vocab_size=VOCAB, emb_size=E, hidden_size=H, cell="gru")
    params = enc.init(jax.random.key(0), jnp.asarray(tokens_np), jnp.asarray(lengths_np))
    ours = np.asarray(enc.apply(params, jnp.asarray(tokens_np), jnp.asarray(lengths_np)))

    p = jax.tree.map(np.asarray, params["params"])
    emb_table = p["embed"]["embedding"]
    g = p["gru_0"]

    gru = torch.nn.GRU(E, H, batch_first=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(g["wx"].T.copy()))
        gru.weight_hh_l0.copy_(torch.from_numpy(g["wh"].T.copy()))
        gru.bias_ih_l0.copy_(torch.from_numpy(g["bx"].copy()))
        gru.bias_hh_l0.copy_(torch.from_numpy(g["bh"].copy()))
        emb = torch.from_numpy(emb_table[tokens_np])
        out, _ = gru(emb)
        theirs = out[:, -1].numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
