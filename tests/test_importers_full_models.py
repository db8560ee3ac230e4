"""Full-model torch mirrors + checkpoint import for the remaining graded
configs: ConcatAtt (#1), MFB/MFH-coatt (#4), CoR (#5). MutanAtt/MLB/NoAtt
live in test_importers.py.

Each torch mirror restates the model in the lineage's style — explicit
per-glimpse/per-step loops, 1x1 convs for per-region projections,
AvgPool1d(k)*k contiguous sum-pooling — with the module naming the
options/import_specs/*.json files map. The tests convert a mirror
checkpoint through the full CLI path (tools/import_torch.py --kind model)
and assert our model reproduces the torch logits to 1e-4, pinning both the
import mechanics AND the equations (the CoR/MFB reconstruction risk named
in SURVEY.md C12/C13).

The MFB mirrors pool CONTIGUOUS k-windows (the published layout) while our
mfb_pool uses strided groups; the spec's pool_perm entries bridge the two,
so a passing test also proves the permutation logic on a full checkpoint.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp


def _conv1x1(ci, co):
    return tnn.Conv2d(ci, co, 1)


def _apply_conv1x1(conv, x):
    """conv [O,I,1,1] applied as a per-position Linear over [..., I]."""
    return F.linear(x, conv.weight[:, :, 0, 0], conv.bias)


def _mfb_pool_torch(z, k):
    """Published MFB pooling: contiguous k-window sum-pool (AvgPool1d * k)
    + signed sqrt + L2 normalize, over the last axis of [..., k*m]."""
    shape = z.shape
    pooled = F.avg_pool1d(z.reshape(-1, 1, shape[-1]), kernel_size=k) * k
    pooled = pooled.reshape(shape[:-1] + (shape[-1] // k,))
    out = torch.sqrt(F.relu(pooled)) - torch.sqrt(F.relu(-pooled))
    return F.normalize(out, dim=-1)


def _l2norm(x):
    return x / torch.sqrt((x * x).sum(dim=-1, keepdim=True) + 1e-12)


def _run_import_and_compare(tmp_path, tmodel, yaml_text, V, nans, Rg, dv, T,
                            spec=None, torch_forward=None):
    """Shared harness: save the mirror checkpoint, convert via the CLI with
    the committed spec, graft, compare logits."""
    from tools.import_torch import main as cli
    from vqa_tpu.cli.train import _graft_npz
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory as models_factory

    tmodel.eval()
    ckpt = tmp_path / "model.pth"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)
    yaml = tmp_path / "opt.yaml"
    yaml.write_text(yaml_text)
    out = tmp_path / "params.npz"
    argv = [
        str(ckpt), "--kind", "model", "--path_opt", str(yaml),
        "--num_words", str(V), "--num_answers", str(nans),
        "--regions", str(Rg), "--feature_dim", str(dv), "--out", str(out),
    ]
    if spec is not None:
        argv += ["--spec", str(spec)]
    assert cli(argv) == 0

    opt = load_options(str(yaml))
    model = models_factory(opt.model, V, nans)
    rng = np.random.default_rng(9)
    v = rng.standard_normal((3, Rg, dv)).astype(np.float32)
    tokens = rng.integers(1, V, (3, T)).astype(np.int32)
    lengths = np.full(3, T, np.int32)

    params = model.init(
        jax.random.key(0), jnp.asarray(v), jnp.asarray(tokens), jnp.asarray(lengths)
    )["params"]
    _graft_npz(np.load(out), params, "pretrained_params")
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(v), jnp.asarray(tokens), jnp.asarray(lengths)
    ))
    fwd = torch_forward or tmodel
    with torch.no_grad():
        theirs = fwd(torch.from_numpy(v), torch.from_numpy(tokens).long()).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------ ConcatAtt


class TConcatAtt(tnn.Module):
    """Torch mirror of graded config #1 (options/import_specs/concat_att.json):
    single-glimpse softmax attention over per-region [q;v] concat, concat
    final fusion, 2-layer classifier."""

    def __init__(self, V, E, H, dv, dim_h, G, classif_h, nans):
        super().__init__()
        self.seq2vec = tnn.Module()
        self.seq2vec.embedding = tnn.Embedding(V, E)
        self.seq2vec.rnn = tnn.LSTM(E, H, batch_first=True)
        self.conv_att_hidden = _conv1x1(H + dv, dim_h)
        self.conv_att = _conv1x1(dim_h, G)
        self.linear_classif_hidden = tnn.Linear(H + G * dv, classif_h)
        self.linear_classif = tnn.Linear(classif_h, nans)
        self.G = G

    def forward(self, v, tokens):
        B, Rg, dv = v.shape
        out, _ = self.seq2vec.rnn(self.seq2vec.embedding(tokens))
        q = out[:, -1]
        joint = torch.cat([q[:, None, :].expand(B, Rg, -1), v], dim=2)
        h = torch.tanh(_apply_conv1x1(self.conv_att_hidden, joint))
        logits = _apply_conv1x1(self.conv_att, h)                    # [B,R,G]
        glimpses = [
            (F.softmax(logits[:, :, g], dim=1).unsqueeze(2) * v).sum(dim=1)
            for g in range(self.G)
        ]
        z = torch.cat([q] + glimpses, dim=1)
        z = torch.tanh(self.linear_classif_hidden(z))
        return self.linear_classif(z)


def test_full_concat_att_checkpoint_import_matches_torch(tmp_path):
    V, E, H, dv, Rg, T = 13, 4, 6, 8, 5, 7
    dim_h, G, classif_h, nans = 9, 1, 10, 11
    torch.manual_seed(3)
    tmodel = TConcatAtt(V, E, H, dv, dim_h, G, classif_h, nans)
    yaml = f"""
model:
  arch: ConcatAtt
  seq2vec: {{arch: lstm, emb_size: {E}, hidden_size: {H}}}
  attention: {{nb_glimpses: {G}, dim_h: {dim_h}, activation: tanh}}
  fusion: {{arch: concat}}
  classif: {{dim_h: {classif_h}}}
"""
    _run_import_and_compare(tmp_path, tmodel, yaml, V, nans, Rg, dv, T)


# ---------------------------------------------------------------- MFB co-att

K = 5  # pool factor: the committed specs carry pool_perm: 5 (config default)


class TMFBCoAtt(tnn.Module):
    """Torch mirror of graded config #4 (options/import_specs/mfb_coatt.json
    and mfh_coatt.json when mfh=True): question self-attention over LSTM
    timesteps, MFB glimpse attention over regions, MFB (or order-2 MFH
    cascade) final fusion. Pools contiguous windows, the published layout."""

    def __init__(self, V, E, H, dv, Gq, dim_h, m_att, Gv, m_f, nans, mfh=False):
        super().__init__()
        self.seq2vec = tnn.Module()
        self.seq2vec.embedding = tnn.Embedding(V, E)
        self.seq2vec.rnn = tnn.LSTM(E, H, batch_first=True)
        self.q_att = tnn.Module()
        self.q_att.linear_hidden = tnn.Linear(H, dim_h)
        self.q_att.linear_logits = tnn.Linear(dim_h, Gq)
        self.v_att = tnn.Module()
        self.v_att.linear_q_proj = tnn.Linear(Gq * H, K * m_att)
        self.v_att.conv_v_proj = _conv1x1(dv, K * m_att)
        self.v_att.conv_hidden = _conv1x1(m_att, dim_h)
        self.v_att.conv_logits = _conv1x1(dim_h, Gv)
        self.fusion = tnn.Module()
        if mfh:
            for i in range(2):
                blk = tnn.Module()
                blk.linear_q_proj = tnn.Linear(Gq * H, K * m_f)
                blk.linear_v_proj = tnn.Linear(Gv * dv, K * m_f)
                setattr(self.fusion, f"mfb{i}", blk)
            classif_in = 2 * m_f
        else:
            self.fusion.linear_q_proj = tnn.Linear(Gq * H, K * m_f)
            self.fusion.linear_v_proj = tnn.Linear(Gv * dv, K * m_f)
            classif_in = m_f
        self.linear_classif = tnn.Linear(classif_in, nans)
        self.Gq, self.Gv, self.mfh = Gq, Gv, mfh

    def forward(self, v, tokens):
        v = _l2norm(v)
        seq, _ = self.seq2vec.rnn(self.seq2vec.embedding(tokens))   # [B,T,H]
        # question self-attention (full-length rows in the test: no masking)
        h = F.relu(self.q_att.linear_hidden(seq))
        alpha_q = F.softmax(self.q_att.linear_logits(h), dim=1)     # [B,T,Gq]
        q = torch.cat(
            [(alpha_q[:, :, g].unsqueeze(2) * seq).sum(dim=1) for g in range(self.Gq)],
            dim=1,
        )                                                           # [B,Gq*H]
        # MFB glimpse attention over regions
        z = self.v_att.linear_q_proj(q)[:, None, :] * _apply_conv1x1(
            self.v_att.conv_v_proj, v)
        joint = _mfb_pool_torch(z, K)                               # [B,R,m]
        hidden = F.relu(_apply_conv1x1(self.v_att.conv_hidden, joint))
        logits = _apply_conv1x1(self.v_att.conv_logits, hidden)     # [B,R,Gv]
        v_att = torch.cat(
            [(F.softmax(logits[:, :, g], dim=1).unsqueeze(2) * v).sum(dim=1)
             for g in range(self.Gv)],
            dim=1,
        )                                                           # [B,Gv*dv]
        # final fusion
        if self.mfh:
            outs, prev = [], None
            for i in range(2):
                blk = getattr(self.fusion, f"mfb{i}")
                z = blk.linear_q_proj(q) * blk.linear_v_proj(v_att)
                if prev is not None:
                    z = z * prev
                outs.append(_mfb_pool_torch(z, K))
                prev = z
            z = torch.cat(outs, dim=1)
        else:
            z = _mfb_pool_torch(
                self.fusion.linear_q_proj(q) * self.fusion.linear_v_proj(v_att), K
            )
        return self.linear_classif(z)


@pytest.mark.parametrize("mfh", [False, True], ids=["mfb", "mfh"])
def test_full_mfb_coatt_checkpoint_import_matches_torch(tmp_path, mfh):
    V, E, H, dv, Rg, T = 15, 4, 6, 8, 5, 7
    Gq, dim_h, m_att, Gv, m_f, nans = 2, 9, 6, 2, 7, 12
    torch.manual_seed(4)
    tmodel = TMFBCoAtt(V, E, H, dv, Gq, dim_h, m_att, Gv, m_f, nans, mfh=mfh)
    arch = "MFHCoAtt" if mfh else "MFBCoAtt"
    fus_arch = "mfh" if mfh else "mfb"
    yaml = f"""
model:
  arch: {arch}
  seq2vec: {{arch: lstm, emb_size: {E}, hidden_size: {H}, return_sequence: true}}
  attention: {{nb_glimpses: {Gv}, question_glimpses: {Gq}, dim_h: {dim_h}, dim_mm: {m_att}}}
  fusion: {{arch: {fus_arch}, pool_factor: {K}, dim_mm: {m_f}}}
"""
    _run_import_and_compare(tmp_path, tmodel, yaml, V, nans, Rg, dv, T)


# ----------------------------------------------------------------------- CoR


class TCoR(tnn.Module):
    """Torch mirror of graded config #5 (options/import_specs/cor.json):
    T-step chain of question-guided pairwise relations with SHARED step
    weights, explicit O(N^2) pairwise loop (the style the factorized
    relation_attend einsum replaces — tests/test_relational_oracles.py
    proves the einsum against the same loop at the op level)."""

    def __init__(self, V, E, H, dv, D, steps, classif_h, nans):
        super().__init__()
        self.seq2vec = tnn.Module()
        self.seq2vec.embedding = tnn.Embedding(V, E)
        self.seq2vec.rnn = tnn.LSTM(E, H, batch_first=True)
        self.conv_obj_proj = _conv1x1(dv, D)
        self.chain = tnn.Module()
        self.chain.conv_rel_src = _conv1x1(D, D)
        self.chain.conv_rel_dst = _conv1x1(D, D)
        self.chain.linear_rel_guide = tnn.Linear(H, D)
        self.chain.conv_rel_to_obj = _conv1x1(D, D)
        self.chain.conv_pool_hidden = _conv1x1(D, D)
        self.chain.conv_pool_logits = _conv1x1(D, 1)
        self.chain.linear_decision = tnn.Linear(D, D)
        self.linear_step_gates = tnn.Linear(H, steps)
        self.linear_classif_hidden = tnn.Linear(D, classif_h)
        self.linear_classif = tnn.Linear(classif_h, nans)
        self.steps, self.D = steps, D

    def forward(self, v, tokens):
        B, N, _ = v.shape
        v = _l2norm(v)
        out, _ = self.seq2vec.rnn(self.seq2vec.embedding(tokens))
        q = out[:, -1]
        objects = torch.tanh(_apply_conv1x1(self.conv_obj_proj, v))  # [B,N,D]
        g = torch.tanh(self.chain.linear_rel_guide(q))               # [B,D]
        decisions = []
        for _t in range(self.steps):  # shared weights each step
            p = torch.tanh(_apply_conv1x1(self.chain.conv_rel_src, objects))
            r = torch.tanh(_apply_conv1x1(self.chain.conv_rel_dst, objects))
            pg = p * g[:, None, :]
            # explicit pairwise relation scores s_ij = <pg_i, r_j>/sqrt(D)
            s = torch.empty(B, N, N)
            for i in range(N):
                for j in range(N):
                    s[:, i, j] = (pg[:, i, :] * r[:, j, :]).sum(dim=1)
            s = s / (self.D ** 0.5)
            alpha = F.softmax(s, dim=2)
            absorbed = torch.einsum("bnm,bmd->bnd", alpha, r)
            update = _apply_conv1x1(self.chain.conv_rel_to_obj, absorbed * pg)
            objects = objects + torch.tanh(update)
            pool_h = torch.tanh(
                _apply_conv1x1(self.chain.conv_pool_hidden, objects)
            ) * g[:, None, :]
            beta = F.softmax(
                _apply_conv1x1(self.chain.conv_pool_logits, pool_h), dim=1
            )                                                        # [B,N,1]
            pooled = (beta * objects).sum(dim=1)
            decisions.append(torch.tanh(self.chain.linear_decision(pooled)) * g)
        gates = F.softmax(self.linear_step_gates(q), dim=1)          # [B,T]
        decision = sum(gates[:, t : t + 1] * decisions[t] for t in range(self.steps))
        z = torch.tanh(self.linear_classif_hidden(decision))
        return self.linear_classif(z)


def test_pool_perm_rejects_nondivisible_width():
    """A pool_perm k that does not divide the projection width is a spec
    authoring error and must fail loudly, not silently mis-permute."""
    from vqa_tpu import importers

    sd = {"proj.weight": np.zeros((10, 4), np.float32)}
    template = {"p": {"kernel": np.zeros((4, 10)), "bias": np.zeros(10)}}
    with pytest.raises(ValueError, match="pool_perm"):
        importers.model_from_torch(
            sd, template,
            [{"path": "p", "kind": "dense", "key": "proj", "pool_perm": 3}],
        )


def test_full_cor_checkpoint_import_matches_torch(tmp_path):
    V, E, H, dv, Rg, T = 14, 4, 6, 8, 6, 7
    D, steps, classif_h, nans = 8, 3, 9, 10
    torch.manual_seed(5)
    tmodel = TCoR(V, E, H, dv, D, steps, classif_h, nans)
    yaml = f"""
model:
  arch: CoR
  seq2vec: {{arch: lstm, emb_size: {E}, hidden_size: {H}}}
  fusion: {{arch: cor, dim_h: {D}}}
  classif: {{dim_h: {classif_h}}}
  chain: {{steps: {steps}}}
"""
    _run_import_and_compare(tmp_path, tmodel, yaml, V, nans, Rg, dv, T)
