"""Torch-weight importers (SURVEY.md C8/C15 pretrained paths + migration).

The reference lineage's pretrained assets are PyTorch state_dicts:
torchvision ImageNet ResNets for the grid extractor (C15, SURVEY call stack
3.5), the torch skip-thoughts port for the question encoder (C8), and full
trained VQA checkpoints (C20's ``torch.save`` payloads). None are
obtainable in this offline image, but a user migrating from the reference
HAS them — these converters turn each into this framework's Flax trees so
the switch is turnkey instead of a weight-surgery project.

Everything here is numpy-in / numpy-out and torch-free; the CLI
(tools/import_torch.py) does the ``torch.load(map_location='cpu')`` and
hands in a flat ``{key: ndarray}`` dict. Layout contracts (all pinned by
tests/test_importers.py against real torch modules):

  torch Linear      weight [out, in], bias [out]   -> Dense  kernel [in, out]
  torch Embedding   weight [V, E]                  -> Embed  embedding [V, E]
  torch LSTM        weight_ih/hh [4H, *], gate order i,f,g,o (ours too;
                    tests/test_lstm_torch_oracle.py) -> wx/wh transposed,
                    b = b_ih + b_hh (one bias per gate in the scan cell)
  torch GRU         gate order r,z,n; b_ih/b_hh stay separate (the "n" gate
                    applies r *inside* the hidden bias term) -> bx, bh
  torch Conv2d      weight [O, I, kh, kw]          -> Conv kernel [kh, kw, I, O]
  torch BatchNorm2d weight/bias + running_mean/var -> params {scale, bias}
                                                      + batch_stats {mean, var}
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np

Array = np.ndarray
Tree = Dict[str, Any]


# ---------------------------------------------------------------- layer level


def from_dense(weight: Array, bias: Optional[Array] = None) -> Tree:
    out = {"kernel": np.ascontiguousarray(weight.T)}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def from_embedding(weight: Array) -> Tree:
    return {"embedding": np.asarray(weight)}


def from_lstm(w_ih: Array, w_hh: Array, b_ih: Array, b_hh: Array) -> Tree:
    """torch LSTM layer -> LSTMLayer {wx, wh, b} (models/seq2vec.py)."""
    return {
        "wx": np.ascontiguousarray(w_ih.T),
        "wh": np.ascontiguousarray(w_hh.T),
        "b": np.asarray(b_ih) + np.asarray(b_hh),
    }


def from_gru(w_ih: Array, w_hh: Array, b_ih: Array, b_hh: Array) -> Tree:
    """torch GRU layer -> GRULayer {wx, wh, bx, bh} (biases must stay split)."""
    return {
        "wx": np.ascontiguousarray(w_ih.T),
        "wh": np.ascontiguousarray(w_hh.T),
        "bx": np.asarray(b_ih),
        "bh": np.asarray(b_hh),
    }


def from_conv(weight: Array, bias: Optional[Array] = None) -> Tree:
    out = {"kernel": np.ascontiguousarray(weight.transpose(2, 3, 1, 0))}
    if bias is not None:
        out["bias"] = np.asarray(bias)
    return out


def from_batchnorm(sd: Mapping[str, Array], prefix: str) -> Tuple[Tree, Tree]:
    """``{prefix}.{weight,bias,running_mean,running_var}`` ->
    (params {scale, bias}, batch_stats {mean, var})."""
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


# ------------------------------------------------------------- state_dict I/O


def strip_prefixes(sd: Mapping[str, Array]) -> Dict[str, Array]:
    """Unwrap ``nn.DataParallel`` ('module.') — the lineage saves through it."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _require(sd: Mapping[str, Array], key: str) -> Array:
    if key not in sd:
        near = sorted(k for k in sd if key.split(".")[0] in k)[:6]
        raise KeyError(f"state_dict has no {key!r}; nearby keys: {near}")
    return np.asarray(sd[key])


# ----------------------------------------------------------- ResNet (C15)


def resnet_from_torch(
    sd: Mapping[str, Array], stage_sizes: Sequence[int]
) -> Tree:
    """torchvision ResNet state_dict -> models/convnets.ResNet variables
    {'params': ..., 'batch_stats': ...} (the ``extract.py --params`` tree).

    torchvision names: conv1/bn1 stem; layer{1..4}.{b}.conv{1..3}/bn{1..3};
    layer{s}.{b}.downsample.{0 conv, 1 bn}. The classifier ``fc.*`` is
    dropped — the extractor stops at the conv5 grid (SURVEY call stack 3.5).
    """
    sd = strip_prefixes(sd)
    params: Tree = {}
    stats: Tree = {}

    params["stem"] = from_conv(_require(sd, "conv1.weight"))
    params["bn_stem"], stats["bn_stem"] = from_batchnorm(sd, "bn1")

    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            t = f"layer{stage + 1}.{block}"
            ours = f"s{stage}_b{block}"
            p: Tree = {}
            s: Tree = {}
            for i in (1, 2, 3):
                p[f"conv{i}"] = from_conv(_require(sd, f"{t}.conv{i}.weight"))
                p[f"bn{i}"], s[f"bn{i}"] = from_batchnorm(sd, f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in sd:
                p["proj"] = from_conv(_require(sd, f"{t}.downsample.0.weight"))
                p["bn_proj"], s["bn_proj"] = from_batchnorm(sd, f"{t}.downsample.1")
            params[ours] = p
            stats[ours] = s
    return {"params": params, "batch_stats": stats}


# ------------------------------------------- question encoder (C8) importers


def seq_encoder_from_torch(
    sd: Mapping[str, Array],
    cell: str,
    num_layers: int = 1,
    embedding_key: str = "embedding.weight",
    rnn_prefix: str = "rnn",
) -> Tree:
    """torch ``Embedding + nn.LSTM/nn.GRU`` state_dict -> SeqEncoder params.

    Defaults match the lineage's torch skip-thoughts port layout
    (``embedding.weight`` + ``rnn.weight_ih_l0`` ...); override
    ``embedding_key``/``rnn_prefix`` for other checkpoints.
    """
    sd = strip_prefixes(sd)
    conv = {"lstm": from_lstm, "gru": from_gru}[cell]
    params: Tree = {"embed": from_embedding(_require(sd, embedding_key))}
    for layer in range(num_layers):
        args = tuple(
            _require(sd, f"{rnn_prefix}.{name}_l{layer}")
            for name in ("weight_ih", "weight_hh", "bias_ih", "bias_hh")
        )
        params[f"{cell}_{layer}"] = conv(*args)
    return params


def align_embedding_to_vocab(
    table: Array,
    source_words: Sequence[str],
    target_words: Sequence[str],
    oov: str = "zeros",
) -> Tuple[Array, int]:
    """Re-index a pretrained embedding table onto OUR word vocab (the
    ``pretrained_emb`` hook's input, cli/train.py): row i of the result is
    the source row for target_words[i]. ``target_words`` is the run's
    ``wid_to_word`` list from vocab.json ([0]=<pad>, [1]=<unk> —
    datasets/processed.py). Row 0 stays zero (SeqEncoder masks on
    token!=0); missing words (incl. <unk>) get the ``oov`` fill:
    'zeros' | 'mean' (mean of matched rows, the skip-thoughts convention).
    Returns (aligned table, n_oov)."""
    index = {w: i for i, w in enumerate(source_words)}
    dim = table.shape[1]
    rows = np.zeros((len(target_words), dim), table.dtype)
    hits = [index[w] for w in target_words[1:] if w in index]
    fill = table[hits].mean(axis=0) if (oov == "mean" and hits) else np.zeros(dim, table.dtype)
    n_oov = 0
    for i, w in enumerate(target_words):
        if i == 0:
            continue  # <pad>
        j = index.get(w)
        if j is None:
            rows[i] = fill
            n_oov += 1
        else:
            rows[i] = table[j]
    return rows, n_oov


# --------------------------------------------------------------- npz helpers


def flatten_tree(tree: Tree, sep: str = "/") -> Dict[str, Array]:
    flat: Dict[str, Array] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (str(k),))
        else:
            flat[sep.join(path)] = np.asarray(node)

    walk(tree, ())
    return flat


def save_tree_npz(path: str, tree: Tree) -> None:
    """Write the '/'-flattened npz that ``extract.py --params`` and the
    ``pretrained_emb``/params hooks consume."""
    np.savez(path, **flatten_tree(tree))
