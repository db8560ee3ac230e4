"""Torch-weight importer tests (vqa_tpu/importers.py, tools/import_torch.py).

Each converter is pinned against a REAL torch module carrying the source
layout: a hand-built ResNet with torchvision's module naming (conv1/bn1/
layer{s}.{b}/downsample.{0,1} — the state_dict format of ImageNet
checkpoints), and nn.Embedding + nn.GRU/nn.LSTM for the skip-thoughts-port
encoder path (SURVEY.md C8/C15).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

from vqa_tpu import importers
from vqa_tpu.models import convnets
from vqa_tpu.models.seq2vec import SeqEncoder

STAGES = (1, 1, 1, 1)  # one bottleneck per stage: exercises every mapping rule


class TBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride != 1 or inplanes != planes * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        identity = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            identity = self.downsample(x)
        return F.relu(y + identity)


class TResNet(tnn.Module):
    """torchvision-named ResNet (state_dict-identical key layout)."""

    def __init__(self, stage_sizes):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for s, n_blocks in enumerate(stage_sizes):
            blocks = []
            planes = 64 * 2**s
            for b in range(n_blocks):
                stride = 2 if s > 0 and b == 0 else 1
                blocks.append(TBottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            x = getattr(self, f"layer{s + 1}")(x)
        return x


def _randomize(model: tnn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.uniform_(-0.2, 0.2, generator=g)
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 2.0, generator=g)
            elif isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)


def test_resnet_import_matches_torch_eval_forward():
    tmodel = TResNet(STAGES)
    _randomize(tmodel, 0)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}

    variables = importers.resnet_from_torch(sd, STAGES)
    fmodel = convnets.ResNet(stage_sizes=STAGES)

    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(fmodel.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_resnet_import_covers_real_depths():
    """Key coverage: a full resnet50-shaped state_dict converts without
    missing keys and yields the same tree structure as a fresh init."""
    tmodel = TResNet(convnets._DEPTHS["resnet50"])
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = importers.resnet_from_torch(sd, convnets._DEPTHS["resnet50"])

    fmodel = convnets.factory("resnet50")
    ref = fmodel.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    ref_shapes = jax.tree.map(lambda a: tuple(a.shape), ref)
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), variables)
    assert ref_shapes == got_shapes


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_seq_encoder_import_matches_torch(cell):
    B, T, E, H, VOCAB = 3, 7, 5, 6, 20
    emb = tnn.Embedding(VOCAB, E)
    rnn = (tnn.GRU if cell == "gru" else tnn.LSTM)(E, H, batch_first=True)
    sd = {f"embedding.{k}": v.numpy() for k, v in emb.state_dict().items()}
    sd.update({f"rnn.{k}": v.numpy() for k, v in rnn.state_dict().items()})

    params = importers.seq_encoder_from_torch(sd, cell)
    enc = SeqEncoder(vocab_size=VOCAB, emb_size=E, hidden_size=H, cell=cell)

    tokens = np.random.default_rng(2).integers(1, VOCAB, (B, T)).astype(np.int32)
    lengths = np.full(B, T, np.int32)
    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(tokens), jnp.asarray(lengths))
    )
    with torch.no_grad():
        out, _ = rnn(emb(torch.from_numpy(tokens).long()))
        theirs = out[:, -1].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_skipthoughts_theano_import_matches_kiros_equations():
    """uni_skip.npz (theano layout) -> our GRULayer. The oracle restates the
    original skip-thoughts gru_layer in numpy: r,z gates packed in W/U/b
    (slice 0 = r, slice 1 = u), candidate tanh(x@Wx + bx + r*(h@Ux)) with no
    hidden bias, carry u*h + (1-u)*n."""
    E, H, T, B, V = 5, 6, 7, 3, 12
    rng = np.random.default_rng(11)
    theano = {
        "encoder_W": rng.standard_normal((E, 2 * H)).astype(np.float32) * 0.3,
        "encoder_b": rng.standard_normal(2 * H).astype(np.float32) * 0.1,
        "encoder_U": rng.standard_normal((H, 2 * H)).astype(np.float32) * 0.3,
        "encoder_Wx": rng.standard_normal((E, H)).astype(np.float32) * 0.3,
        "encoder_bx": rng.standard_normal(H).astype(np.float32) * 0.1,
        "encoder_Ux": rng.standard_normal((H, H)).astype(np.float32) * 0.3,
    }
    converted = importers.skipthoughts_from_theano(theano)

    tokens = rng.integers(1, V, (B, T)).astype(np.int32)
    lengths = np.full(B, T, np.int32)
    emb_table = rng.standard_normal((V, E)).astype(np.float32)

    enc = SeqEncoder(vocab_size=V, emb_size=E, hidden_size=H, cell="gru")
    params = enc.init(jax.random.key(0), jnp.asarray(tokens), jnp.asarray(lengths))
    params["params"]["gru_0"] = jax.tree.map(jnp.asarray, converted["gru_0"])
    params["params"]["embed"]["embedding"] = jnp.asarray(emb_table)
    ours = np.asarray(enc.apply(params, jnp.asarray(tokens), jnp.asarray(lengths)))

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    x = emb_table[tokens]                                   # [B, T, E]
    below = x @ theano["encoder_W"] + theano["encoder_b"]   # [B, T, 2H]
    belowx = x @ theano["encoder_Wx"] + theano["encoder_bx"]
    h = np.zeros((B, H), np.float32)
    for t in range(T):
        preact = h @ theano["encoder_U"] + below[:, t]
        r, u = sig(preact[:, :H]), sig(preact[:, H:])
        n = np.tanh((h @ theano["encoder_Ux"]) * r + belowx[:, t])
        h = u * h + (1.0 - u) * n
    np.testing.assert_allclose(ours, h, rtol=1e-4, atol=1e-5)


def test_skipthoughts_cli(tmp_path):
    E, H = 4, 5
    rng = np.random.default_rng(13)
    np.savez(
        tmp_path / "uni_skip.npz",
        encoder_W=rng.standard_normal((E, 2 * H)).astype(np.float32),
        encoder_b=np.zeros(2 * H, np.float32),
        encoder_U=rng.standard_normal((H, 2 * H)).astype(np.float32),
        encoder_Wx=rng.standard_normal((E, H)).astype(np.float32),
        encoder_bx=np.zeros(H, np.float32),
        encoder_Ux=rng.standard_normal((H, H)).astype(np.float32),
        Wemb=rng.standard_normal((9, E)).astype(np.float32),
    )
    from tools.import_torch import main as cli

    out = tmp_path / "st.npz"
    assert cli([str(tmp_path / "uni_skip.npz"), "--kind", "skipthoughts",
                "--out", str(out)]) == 0
    loaded = np.load(out)
    assert set(loaded.files) == {"gru_0/wx", "gru_0/wh", "gru_0/bx", "gru_0/bh"}
    assert loaded["gru_0/wx"].shape == (E, 3 * H)


def test_two_layer_lstm_encoder_import():
    B, T, E, H, VOCAB = 2, 5, 4, 6, 14
    emb = tnn.Embedding(VOCAB, E)
    rnn = tnn.LSTM(E, H, num_layers=2, batch_first=True)
    sd = {f"embedding.{k}": v.numpy() for k, v in emb.state_dict().items()}
    sd.update({f"rnn.{k}": v.numpy() for k, v in rnn.state_dict().items()})
    params = importers.seq_encoder_from_torch(sd, "lstm", num_layers=2)
    enc = SeqEncoder(vocab_size=VOCAB, emb_size=E, hidden_size=H,
                     num_layers=2, cell="lstm")
    tokens = np.random.default_rng(4).integers(1, VOCAB, (B, T)).astype(np.int32)
    lengths = np.full(B, T, np.int32)
    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(tokens), jnp.asarray(lengths))
    )
    with torch.no_grad():
        out, _ = rnn(emb(torch.from_numpy(tokens).long()))
        theirs = out[:, -1].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_align_embedding_to_vocab():
    table = np.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], np.float32)
    source = ["cat", "dog", "fish"]
    target = ["<pad>", "<unk>", "dog", "yeti"]
    aligned, n_oov = importers.align_embedding_to_vocab(table, source, target)
    assert n_oov == 2  # <unk> and yeti
    np.testing.assert_array_equal(aligned[0], [0, 0])
    np.testing.assert_array_equal(aligned[2], [3, 4])
    np.testing.assert_array_equal(aligned[3], [0, 0])

    aligned, _ = importers.align_embedding_to_vocab(table, source, target, oov="mean")
    np.testing.assert_allclose(aligned[3], table[[1]].mean(axis=0))  # only 'dog' matched


def test_import_torch_cli_roundtrip(tmp_path):
    """CLI: .pth state_dict -> encoder npz + vocab-aligned embedding npz."""
    from tools.import_torch import main as cli

    E, H, VOCAB = 4, 5, 9
    emb = tnn.Embedding(VOCAB, E)
    rnn = tnn.GRU(E, H, batch_first=True)
    sd = {f"embedding.{k}": v for k, v in emb.state_dict().items()}
    sd.update({f"rnn.{k}": v for k, v in rnn.state_dict().items()})
    # DataParallel-style prefixes + checkpoint wrapper, as the lineage saves
    ckpt = tmp_path / "st.pth"
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}}, ckpt)

    out = tmp_path / "enc.npz"
    assert cli([str(ckpt), "--kind", "seq2vec", "--cell", "gru", "--out", str(out)]) == 0
    loaded = np.load(out)
    assert set(loaded.files) == {
        "embed/embedding", "gru_0/wx", "gru_0/wh", "gru_0/bx", "gru_0/bh"
    }
    assert loaded["gru_0/wx"].shape == (E, 3 * H)

    words = tmp_path / "words.txt"
    words.write_text("".join(f"w{i}\n" for i in range(VOCAB)))
    vocab = tmp_path / "vocab.json"
    vocab.write_text(json.dumps({"wid_to_word": ["<pad>", "<unk>", "w3", "nope"],
                                 "aid_to_ans": []}))
    out_emb = tmp_path / "emb.npz"
    assert cli([
        str(ckpt), "--kind", "embedding", "--embedding_key", "embedding.weight",
        "--source_words", str(words), "--vocab", str(vocab), "--out", str(out_emb),
    ]) == 0
    aligned = np.load(out_emb)["embedding"]
    assert aligned.shape == (4, E)
    np.testing.assert_allclose(
        aligned[2], emb.state_dict()["weight"][3].numpy(), rtol=1e-6
    )


class TMutanAtt(tnn.Module):
    """Torch mirror of the lineage's MutanAtt in its module naming (the
    options/import_specs/mutan_att.json 'key' layout): per-rank Tucker
    Linears in ModuleLists, 1x1 convs for per-region projections, and
    per-glimpse fusion Linears. Forward restates the model in the torch
    style (explicit loops) so a full converted checkpoint can be checked
    logits-for-logits against our AttModel."""

    def __init__(self, V, E, H, dv, hq_a, hv_a, M_a, R_a, G, hq_f, hv_f, M_f, R_f, nans):
        super().__init__()
        self.seq2vec = tnn.Module()
        self.seq2vec.embedding = tnn.Embedding(V, E)
        self.seq2vec.rnn = tnn.LSTM(E, H, batch_first=True)
        self.conv_v_att = tnn.Conv2d(dv, hv_a, 1)
        self.linear_q_att = tnn.Linear(H, hq_a)
        self.fusion_att = tnn.Module()
        self.fusion_att.list_linear_hq = tnn.ModuleList(
            [tnn.Linear(hq_a, M_a) for _ in range(R_a)])
        self.fusion_att.list_linear_hv = tnn.ModuleList(
            [tnn.Linear(hv_a, M_a) for _ in range(R_a)])
        self.conv_att = tnn.Conv2d(M_a, G, 1)
        self.list_linear_v_fusion = tnn.ModuleList(
            [tnn.Linear(dv, hv_f // G) for _ in range(G)])
        self.linear_q_fusion = tnn.Linear(H, hq_f)
        self.fusion = tnn.Module()
        self.fusion.list_linear_hq = tnn.ModuleList(
            [tnn.Linear(hq_f, M_f) for _ in range(R_f)])
        self.fusion.list_linear_hv = tnn.ModuleList(
            [tnn.Linear(hv_f, M_f) for _ in range(R_f)])
        self.linear_classif = tnn.Linear(M_f, nans)
        self.G = G

    @staticmethod
    def _tucker(ns, xq, xv):
        z = None
        for lq, lv in zip(ns.list_linear_hq, ns.list_linear_hv):
            term = lq(xq) * lv(xv)
            z = term if z is None else z + term
        return torch.tanh(z)

    def forward(self, v, tokens):
        B, Rg, dv = v.shape
        emb = self.seq2vec.embedding(tokens)
        out, _ = self.seq2vec.rnn(emb)
        q = out[:, -1]  # full-length rows in the test
        qa = torch.tanh(self.linear_q_att(q))
        va = torch.tanh(
            F.linear(v, self.conv_v_att.weight[:, :, 0, 0], self.conv_v_att.bias))
        joint = self._tucker(
            self.fusion_att, qa[:, None, :].expand(B, Rg, -1), va)
        logits = F.linear(joint, self.conv_att.weight[:, :, 0, 0], self.conv_att.bias)
        glimpses = [
            (F.softmax(logits[:, :, g], dim=1).unsqueeze(2) * v).sum(dim=1)
            for g in range(self.G)
        ]
        vf = torch.cat(
            [torch.tanh(lin(g_v)) for lin, g_v in zip(self.list_linear_v_fusion, glimpses)],
            dim=1,
        )
        qf = torch.tanh(self.linear_q_fusion(q))
        z = self._tucker(self.fusion, qf, vf)
        return self.linear_classif(z)


def test_full_mutan_att_checkpoint_import_matches_torch(tmp_path):
    """Lineage-named torch MutanAtt checkpoint -> --kind model CLI ->
    model.pretrained_params graft -> identical eval logits."""
    from tools.import_torch import main as cli
    from vqa_tpu.cli.train import _graft_npz
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory as models_factory

    V, E, H, dv, Rg, T = 19, 6, 8, 10, 5, 7
    hq_a, hv_a, M_a, R_a, G = 7, 9, 11, 3, 2
    hq_f, hv_f, M_f, R_f, nans = 6, 8, 12, 2, 13

    torch.manual_seed(0)
    tmodel = TMutanAtt(V, E, H, dv, hq_a, hv_a, M_a, R_a, G, hq_f, hv_f, M_f, R_f, nans)
    tmodel.eval()
    ckpt = tmp_path / "mutan.pth"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)

    yaml = tmp_path / "opt.yaml"
    yaml.write_text(f"""
model:
  arch: MutanAtt
  seq2vec: {{arch: lstm, emb_size: {E}, hidden_size: {H}}}
  attention: {{nb_glimpses: {G}, dim_hq: {hq_a}, dim_hv: {hv_a}, dim_mm: {M_a}, R: {R_a}}}
  fusion: {{arch: mutan, dim_hq: {hq_f}, dim_hv: {hv_f}, dim_mm: {M_f}, R: {R_f}}}
""")
    out = tmp_path / "params.npz"
    assert cli([
        str(ckpt), "--kind", "model", "--path_opt", str(yaml),
        "--num_words", str(V), "--num_answers", str(nans),
        "--regions", str(Rg), "--feature_dim", str(dv), "--out", str(out),
    ]) == 0

    opt = load_options(str(yaml))
    model = models_factory(opt.model, V, nans)
    rng = np.random.default_rng(3)
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
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(v), torch.from_numpy(tokens).long()).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


class TMLBAtt(tnn.Module):
    """Torch mirror of the lineage's MLBAtt (options/import_specs/mlb_att.json)."""

    def __init__(self, V, E, H, dv, h_att, G, h_f, nans):
        super().__init__()
        self.seq2vec = tnn.Module()
        self.seq2vec.embedding = tnn.Embedding(V, E)
        self.seq2vec.rnn = tnn.LSTM(E, H, batch_first=True)
        self.conv_v_att = tnn.Conv2d(dv, h_att, 1)
        self.linear_q_att = tnn.Linear(H, h_att)
        self.conv_att = tnn.Conv2d(h_att, G, 1)
        self.list_linear_v_fusion = tnn.ModuleList(
            [tnn.Linear(dv, h_f // G) for _ in range(G)])
        self.linear_q_fusion = tnn.Linear(H, h_f)
        self.linear_classif = tnn.Linear(h_f, nans)
        self.G = G

    def forward(self, v, tokens):
        out, _ = self.seq2vec.rnn(self.seq2vec.embedding(tokens))
        q = out[:, -1]
        qa = torch.tanh(self.linear_q_att(q))
        va = torch.tanh(
            F.linear(v, self.conv_v_att.weight[:, :, 0, 0], self.conv_v_att.bias))
        joint = qa[:, None, :] * va
        logits = F.linear(joint, self.conv_att.weight[:, :, 0, 0], self.conv_att.bias)
        glimpses = [
            (F.softmax(logits[:, :, g], dim=1).unsqueeze(2) * v).sum(dim=1)
            for g in range(self.G)
        ]
        x_v = torch.cat(
            [torch.tanh(lin(g_v)) for lin, g_v in zip(self.list_linear_v_fusion, glimpses)],
            dim=1,
        )
        x_q = torch.tanh(self.linear_q_fusion(q))
        return self.linear_classif(x_v * x_q)


def test_full_mlb_att_checkpoint_import_matches_torch(tmp_path):
    from tools.import_torch import main as cli
    from vqa_tpu.cli.train import _graft_npz
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory as models_factory

    V, E, H, dv, Rg, T = 17, 5, 7, 9, 4, 6
    h_att, G, h_f, nans = 10, 2, 8, 12
    torch.manual_seed(1)
    tmodel = TMLBAtt(V, E, H, dv, h_att, G, h_f, nans)
    tmodel.eval()
    ckpt = tmp_path / "mlb.pth"
    torch.save(tmodel.state_dict(), ckpt)

    yaml = tmp_path / "opt.yaml"
    yaml.write_text(f"""
model:
  arch: MLBAtt
  seq2vec: {{arch: lstm, emb_size: {E}, hidden_size: {H}}}
  attention: {{nb_glimpses: {G}, dim_h: {h_att}}}
  fusion: {{arch: mlb, dim_h: {h_f}}}
""")
    out = tmp_path / "params.npz"
    assert cli([
        str(ckpt), "--kind", "model", "--path_opt", str(yaml),
        "--num_words", str(V), "--num_answers", str(nans),
        "--regions", str(Rg), "--feature_dim", str(dv), "--out", str(out),
    ]) == 0

    opt = load_options(str(yaml))
    model = models_factory(opt.model, V, nans)
    rng = np.random.default_rng(5)
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
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(v), torch.from_numpy(tokens).long()).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_full_mutan_noatt_checkpoint_import_matches_torch(tmp_path):
    """NoAtt family spec (global pooled feature, Tucker fusion with biases)."""
    from tools.import_torch import main as cli
    from vqa_tpu.cli.train import _graft_npz
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory as models_factory

    V, E, H, dv, T = 15, 4, 6, 8, 5
    hq, hv, M, R, nans = 5, 7, 9, 2, 11
    torch.manual_seed(2)

    class TMutanNoAtt(tnn.Module):
        def __init__(self):
            super().__init__()
            self.seq2vec = tnn.Module()
            self.seq2vec.embedding = tnn.Embedding(V, E)
            self.seq2vec.rnn = tnn.LSTM(E, H, batch_first=True)
            self.linear_q_fusion = tnn.Linear(H, hq)
            self.linear_v_fusion = tnn.Linear(dv, hv)
            self.fusion = tnn.Module()
            self.fusion.list_linear_hq = tnn.ModuleList(
                [tnn.Linear(hq, M) for _ in range(R)])
            self.fusion.list_linear_hv = tnn.ModuleList(
                [tnn.Linear(hv, M) for _ in range(R)])
            self.linear_classif = tnn.Linear(M, nans)

        def forward(self, v, tokens):
            out, _ = self.seq2vec.rnn(self.seq2vec.embedding(tokens))
            q = torch.tanh(self.linear_q_fusion(out[:, -1]))
            x_v = torch.tanh(self.linear_v_fusion(v))
            z = TMutanAtt._tucker(self.fusion, q, x_v)
            return self.linear_classif(z)

    tmodel = TMutanNoAtt()
    tmodel.eval()
    ckpt = tmp_path / "noatt.pth"
    torch.save(tmodel.state_dict(), ckpt)

    yaml = tmp_path / "opt.yaml"
    yaml.write_text(f"""
model:
  arch: MutanNoAtt
  seq2vec: {{arch: lstm, emb_size: {E}, hidden_size: {H}}}
  fusion: {{arch: mutan, dim_hq: {hq}, dim_hv: {hv}, dim_mm: {M}, R: {R}}}
""")
    out = tmp_path / "params.npz"
    assert cli([
        str(ckpt), "--kind", "model", "--path_opt", str(yaml),
        "--num_words", str(V), "--num_answers", str(nans),
        "--regions", "3", "--feature_dim", str(dv), "--out", str(out),
    ]) == 0

    opt = load_options(str(yaml))
    model = models_factory(opt.model, V, nans)
    rng = np.random.default_rng(7)
    v = rng.standard_normal((2, dv)).astype(np.float32)  # pooled global feature
    tokens = rng.integers(1, V, (2, T)).astype(np.int32)
    lengths = np.full(2, T, np.int32)
    params = model.init(
        jax.random.key(0), jnp.asarray(v), jnp.asarray(tokens), jnp.asarray(lengths)
    )["params"]
    _graft_npz(np.load(out), params, "pretrained_params")
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(v), jnp.asarray(tokens), jnp.asarray(lengths)
    ))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(v), torch.from_numpy(tokens).long()).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_pretrained_encoder_hook(tmp_path):
    """cli.train.init_params grafts a converted encoder npz into the model
    params (model.seq2vec.pretrained_encoder)."""
    from vqa_tpu.cli.train import init_params
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory as models_factory

    E, H, VOCAB, NANS = 4, 5, 11, 7
    emb = tnn.Embedding(VOCAB, E)
    rnn = tnn.GRU(E, H, batch_first=True)
    sd = {f"embedding.{k}": v.numpy() for k, v in emb.state_dict().items()}
    sd.update({f"rnn.{k}": v.numpy() for k, v in rnn.state_dict().items()})
    enc_npz = tmp_path / "enc.npz"
    importers.save_tree_npz(str(enc_npz), importers.seq_encoder_from_torch(sd, "gru"))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_options(
        os.path.join(repo, "options/vqa2/mutan_att.yaml"),
        [
            "model.seq2vec.arch=gru",
            f"model.seq2vec.emb_size={E}",
            f"model.seq2vec.hidden_size={H}",
            f"model.seq2vec.pretrained_encoder={enc_npz}",
            "model.attention.dim_hq=6", "model.attention.dim_hv=6",
            "model.attention.dim_mm=8", "model.attention.R=2",
            "model.fusion.dim_hq=6", "model.fusion.dim_hv=6",
            "model.fusion.dim_mm=8", "model.fusion.R=2",
        ],
    )

    class FakeDataset:
        feature_shape = (6, 16)

    model = models_factory(opt.model, VOCAB, NANS)
    params = init_params(model, FakeDataset(), opt)
    got = np.asarray(params["encoder"]["gru_0"]["wx"])
    np.testing.assert_allclose(got, rnn.state_dict()["weight_ih_l0"].numpy().T)
    np.testing.assert_allclose(
        np.asarray(params["encoder"]["embed"]["embedding"]),
        emb.state_dict()["weight"].numpy(),
    )

    # wrong vocab size -> loud error pointing at re-alignment
    bad = load_options(
        os.path.join(repo, "options/vqa2/mutan_att.yaml"),
        [f"model.seq2vec.pretrained_encoder={enc_npz}",
         "model.seq2vec.arch=gru",
         f"model.seq2vec.emb_size={E}", f"model.seq2vec.hidden_size={H}"],
    )
    bad_model = models_factory(bad.model, VOCAB + 3, NANS)
    with pytest.raises(ValueError, match="re-aligned"):
        init_params(bad_model, FakeDataset(), bad)


def test_import_cli_show_lists_both_sides(tmp_path, capsys):
    """--show prints torch keys and model leaves side by side (the
    spec-authoring workflow for checkpoints with renamed modules)."""
    from tools.import_torch import main as cli

    emb = tnn.Embedding(7, 3)
    torch.save({"embedding.weight": emb.weight.detach()}, tmp_path / "w.pth")
    yaml = tmp_path / "opt.yaml"
    yaml.write_text("""
model:
  arch: MutanAtt
  seq2vec: {arch: lstm, emb_size: 3, hidden_size: 4}
  attention: {nb_glimpses: 1, dim_hq: 3, dim_hv: 3, dim_mm: 4, R: 2}
  fusion: {arch: mutan, dim_hq: 3, dim_hv: 3, dim_mm: 4, R: 2}
""")
    rc = cli([str(tmp_path / "w.pth"), "--kind", "model",
              "--path_opt", str(yaml), "--num_words", "7", "--num_answers", "5",
              "--regions", "3", "--feature_dim", "6",
              "--out", str(tmp_path / "x.npz"), "--show"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "embedding.weight  (7, 3)" in out
    assert "encoder/lstm_0/wx" in out and "classifier/logits/kernel" in out
