"""Torch-CPU parity oracles for the fusion zoo + glimpse attention
(SURVEY.md section 4 "Parity harness"; VERDICT r1 item 7).

Each oracle restates the published equations in idiomatic PyTorch (explicit
per-rank / per-glimpse loops, AvgPool1d sum-pooling — the style of the
torch lineage), loads the *identical* weights from the Flax module, and
asserts the outputs match. This breaks the self-referential numpy-oracle
loop: a misremembered equation now has to be misremembered in two different
programming styles to pass.

Equations (papers behind the graded configs):
  MLB   (Kim et al. 2017):      z = tanh(W_q q) * tanh(W_v v)
  MUTAN (Ben-younes et al.):    z = tanh(sum_r (q~ W_qr) * (v~ W_vr))
  MFB   (Yu et al. 1708.01471): z = L2(signed_sqrt(SumPool_k(U q * V v)))
  MFH:  block i reuses block i-1's pre-pool product
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vqa_tpu.models.att import GlimpseAttention
from vqa_tpu.models.fusion import (
    MFBFusion,
    MFHFusion,
    MLBFusion,
    MutanFusion,
)

B, DQ, DV = 6, 11, 13


def _lin(x: torch.Tensor, p: dict) -> torch.Tensor:
    """Apply a flax Dense param dict {kernel [in,out], bias [out]} in torch."""
    w = torch.from_numpy(np.asarray(p["kernel"]))
    b = torch.from_numpy(np.asarray(p["bias"])) if "bias" in p else None
    return F.linear(x, w.T.contiguous(), b)


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_mlb_fusion_matches_torch():
    q_np, v_np = _rand((B, DQ), 0), _rand((B, DV), 1)
    mod = MLBFusion(dim_h=17)
    params = mod.init(jax.random.key(0), jnp.asarray(q_np), jnp.asarray(v_np))
    ours = np.asarray(mod.apply(params, jnp.asarray(q_np), jnp.asarray(v_np)))

    p = jax.tree.map(np.asarray, params["params"])
    with torch.no_grad():
        q, v = torch.from_numpy(q_np), torch.from_numpy(v_np)
        x_q = torch.tanh(_lin(q, p["q_proj"]))
        x_v = torch.tanh(_lin(v, p["v_proj"]))
        theirs = (x_q * x_v).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_mutan_fusion_matches_torch():
    R, M = 4, 15
    q_np, v_np = _rand((B, DQ), 2), _rand((B, DV), 3)
    mod = MutanFusion(dim_hq=9, dim_hv=10, dim_mm=M, R=R)
    params = mod.init(jax.random.key(1), jnp.asarray(q_np), jnp.asarray(v_np))
    # core biases init to zero; randomize so the oracle checks the bias math
    # (the lineage's per-rank nn.Linear cores carry biases)
    params["params"]["b_core_q"] = jnp.asarray(_rand((R * M,), 20))
    params["params"]["b_core_v"] = jnp.asarray(_rand((R * M,), 21))
    ours = np.asarray(mod.apply(params, jnp.asarray(q_np), jnp.asarray(v_np)))

    p = jax.tree.map(np.asarray, params["params"])
    wq = torch.from_numpy(p["w_core_q"])  # [dim_hq, R*M]
    wv = torch.from_numpy(p["w_core_v"])  # [dim_hv, R*M]
    bq = torch.from_numpy(p["b_core_q"])
    bv = torch.from_numpy(p["b_core_v"])
    with torch.no_grad():
        q = torch.tanh(_lin(torch.from_numpy(q_np), p["q_proj"]))
        v = torch.tanh(_lin(torch.from_numpy(v_np), p["v_proj"]))
        # the lineage's Tucker core: explicit loop over ranks (per-rank
        # nn.Linear with bias), list + stack
        x_mm = []
        for r in range(R):
            sl = slice(r * M, (r + 1) * M)
            x_q = q @ wq[:, sl] + bq[sl]
            x_v = v @ wv[:, sl] + bv[sl]
            x_mm.append(x_q * x_v)
        theirs = torch.tanh(torch.stack(x_mm, dim=0).sum(dim=0)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _strided_to_contiguous_perm(m: int, k: int) -> np.ndarray:
    """Channel permutation mapping our strided pool groups onto the published
    contiguous AvgPool1d(k) groups (ops/mfb_pool.py documents the strided
    layout as a reparametrization; this test *proves* it)."""
    i = np.arange(k * m)
    return (i % k) * m + i // k


def _mfb_block_torch(q, v, p, m, k, prev=None):
    """Published MFB block: Hadamard of projections -> k-window sum-pool via
    AvgPool1d -> signed sqrt -> L2 normalize. Channels permuted so contiguous
    pooling reproduces our strided grouping with identical weights."""
    perm = _strided_to_contiguous_perm(m, k)

    def plin(x, pd):
        w = torch.from_numpy(np.asarray(pd["kernel"])[:, perm])
        b = torch.from_numpy(np.asarray(pd["bias"])[perm])
        return F.linear(x, w.T.contiguous(), b)

    z = plin(q, p["q_proj"]) * plin(v, p["v_proj"])
    if prev is not None:
        z = z * prev
    pooled = F.avg_pool1d(z.unsqueeze(1), kernel_size=k).squeeze(1) * k
    out = torch.sqrt(F.relu(pooled)) - torch.sqrt(F.relu(-pooled))
    return F.normalize(out, dim=-1), z


def test_mfb_fusion_matches_torch():
    m, k = 14, 3
    q_np, v_np = _rand((B, DQ), 4), _rand((B, DV), 5)
    mod = MFBFusion(pool_factor=k, dim_mm=m)
    params = mod.init(jax.random.key(2), jnp.asarray(q_np), jnp.asarray(v_np))
    ours, _ = mod.apply(params, jnp.asarray(q_np), jnp.asarray(v_np))

    p = jax.tree.map(np.asarray, params["params"])
    with torch.no_grad():
        theirs, _ = _mfb_block_torch(
            torch.from_numpy(q_np), torch.from_numpy(v_np), p, m, k
        )
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_mfh_fusion_matches_torch():
    m, k = 12, 2
    q_np, v_np = _rand((B, DQ), 6), _rand((B, DV), 7)
    mod = MFHFusion(pool_factor=k, dim_mm=m, mfh_order=2)
    params = mod.init(jax.random.key(3), jnp.asarray(q_np), jnp.asarray(v_np))
    ours = np.asarray(mod.apply(params, jnp.asarray(q_np), jnp.asarray(v_np)))

    p = jax.tree.map(np.asarray, params["params"])
    with torch.no_grad():
        q, v = torch.from_numpy(q_np), torch.from_numpy(v_np)
        out0, z0 = _mfb_block_torch(q, v, p["mfb_0"], m, k)
        out1, _ = _mfb_block_torch(q, v, p["mfb_1"], m, k, prev=z0)
        theirs = torch.cat([out0, out1], dim=1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_mutan_glimpse_attention_matches_torch():
    """Full MutanAtt attention head (the graded config #3 hot path): per-region
    Tucker fusion -> glimpse logits -> softmax over regions -> weighted sums."""
    R_regions, G, M, rank = 7, 2, 15, 3
    q_np, v_np = _rand((B, DQ), 8), _rand((B, R_regions, DV), 9)
    fusion = MutanFusion(dim_hq=9, dim_hv=10, dim_mm=M, R=rank)
    head = GlimpseAttention(fusion=fusion, nb_glimpses=G, dim_h=None)
    params = head.init(jax.random.key(4), jnp.asarray(q_np), jnp.asarray(v_np))
    params["params"]["fusion"]["b_core_q"] = jnp.asarray(_rand((rank * M,), 22))
    params["params"]["fusion"]["b_core_v"] = jnp.asarray(_rand((rank * M,), 23))
    attended, alpha = head.apply(params, jnp.asarray(q_np), jnp.asarray(v_np))

    p = jax.tree.map(np.asarray, params["params"])
    fp = p["fusion"]
    wq = torch.from_numpy(fp["w_core_q"])
    wv = torch.from_numpy(fp["w_core_v"])
    bq = torch.from_numpy(fp["b_core_q"])
    bv = torch.from_numpy(fp["b_core_v"])
    with torch.no_grad():
        # tile q over regions, flatten to [B*R, .] — the torch-lineage att style
        q = torch.from_numpy(q_np)[:, None, :].expand(B, R_regions, DQ).reshape(-1, DQ)
        v = torch.from_numpy(v_np).reshape(-1, DV)
        x_q = torch.tanh(_lin(q, fp["q_proj"]))
        x_v = torch.tanh(_lin(v, fp["v_proj"]))
        x_mm = []
        for r in range(rank):
            sl = slice(r * M, (r + 1) * M)
            x_mm.append((x_q @ wq[:, sl] + bq[sl]) * (x_v @ wv[:, sl] + bv[sl]))
        joint = torch.tanh(torch.stack(x_mm, dim=0).sum(dim=0))
        logits = _lin(joint, p["glimpse_logits"]).view(B, R_regions, G)
        glimpses = []
        alphas = []
        for g in range(G):
            a = F.softmax(logits[:, :, g], dim=1)
            alphas.append(a)
            glimpses.append((a.unsqueeze(2) * torch.from_numpy(v_np)).sum(dim=1))
        theirs = torch.cat(glimpses, dim=1).numpy()
        alpha_t = torch.stack(alphas, dim=2).numpy()
    np.testing.assert_allclose(np.asarray(attended), theirs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(alpha), alpha_t, rtol=1e-4, atol=1e-5)
