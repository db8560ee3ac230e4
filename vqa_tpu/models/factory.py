"""Model factory (SURVEY.md C8-C14 assembly; reference call stack 3.1).

factory(model_opt, num_words, num_answers) -> flax Module with
``__call__(visual, question, lengths=None, train=False) -> logits``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from vqa_tpu.config import ModelOptions
from vqa_tpu.models import fusion as fusion_lib
from vqa_tpu.models import seq2vec as seq2vec_lib
from vqa_tpu.models.att import AttModel, GlimpseAttention
from vqa_tpu.models.classifier import Classifier
from vqa_tpu.models.noatt import NoAttModel

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def _dtype(name: Any):
    return _DTYPES[name] if isinstance(name, str) else (name or jnp.float32)


# typo-safety (SURVEY.md section 7: silently divergent hyperparameters are
# the parity killers): every model-config section validates against the union
# of its archs' knobs — a misspelled key fails loudly, while knobs shared
# across archs (e.g. attention.dim_h in a sweep) stay legal.
_VALID_KEYS = {
    "seq2vec": {
        "arch", "emb_size", "hidden_size", "num_layers", "dropout",
        "return_sequence", "pretrained_emb", "pretrained_encoder",
    },
    "attention": {
        "nb_glimpses", "question_glimpses", "dim_h", "dim_hq", "dim_hv",
        "dim_mm", "R", "dropout", "dropout_q", "dropout_v", "dropout_mm",
        "dropout_hq", "dropout_hv", "activation", "activation_q", "activation_v",
        "core_bias",
    },
    "classif": {"dim_h", "activation", "dropout"},
    "chain": {"steps", "unroll", "remat"},
    # union across fusion archs; fusion_lib.factory additionally enforces the
    # exact per-arch set for the archs it builds
    "fusion": {
        "arch", "dim_h", "dim_hq", "dim_hv", "dim_mm", "R", "pool_factor",
        "mfh_order", "dropout", "dropout_pre", "dropout_q", "dropout_v",
        "dropout_hq", "dropout_hv", "activation_q", "activation_v",
        "activation_hq", "activation_hv", "project_inputs", "core_bias",
    },
}


def _check_keys(section: str, opt: dict) -> None:
    unknown = set(opt or {}) - _VALID_KEYS[section]
    if unknown:
        raise KeyError(
            f"model.{section} got unknown option(s) {sorted(unknown)}; "
            f"valid: {sorted(_VALID_KEYS[section])}"
        )


def _att_scoring_fusion(arch: str, att: dict, dtype) -> tuple:
    """Build the per-region scoring fusion + glimpse-head knobs for an arch."""
    if arch == "ConcatAtt":
        f = fusion_lib.ConcatFusion(
            dropout_q=att.get("dropout_q", 0.5),
            dropout_v=att.get("dropout_v", 0.5),
            dtype=dtype,
        )
        return f, dict(dim_h=att.get("dim_h", 1024), activation=att.get("activation", "tanh"))
    if arch == "MLBAtt":
        f = fusion_lib.MLBFusion(
            dim_h=att.get("dim_h", 1200),
            dropout_q=att.get("dropout_q", 0.5),
            dropout_v=att.get("dropout_v", 0.5),
            activation_q=att.get("activation", att.get("activation_q", "tanh")),
            activation_v=att.get("activation", att.get("activation_v", "tanh")),
            dtype=dtype,
        )
        return f, dict(dim_h=None)
    if arch == "MutanAtt":
        f = fusion_lib.MutanFusion(
            dim_hq=att.get("dim_hq", 310),
            dim_hv=att.get("dim_hv", 310),
            dim_mm=att.get("dim_mm", 510),
            R=att.get("R", 5),
            dropout_q=att.get("dropout_q", 0.5),
            dropout_v=att.get("dropout_v", 0.5),
            dropout_hq=att.get("dropout_hq", 0.0),
            dropout_hv=att.get("dropout_hv", 0.0),
            activation_q=att.get("activation_q", "tanh"),
            activation_v=att.get("activation_v", "tanh"),
            core_bias=att.get("core_bias", True),
            dtype=dtype,
        )
        return f, dict(dim_h=None)
    raise KeyError(arch)


def factory(
    model_opt: ModelOptions,
    num_words: int,
    num_answers: int,
    dtype: Any = jnp.float32,
):
    dtype = _dtype(dtype)
    arch = model_opt.arch
    _check_keys("seq2vec", model_opt.seq2vec)
    _check_keys("attention", model_opt.attention)
    _check_keys("classif", model_opt.classif)
    _check_keys("chain", model_opt.extra.get("chain", {}))
    _check_keys("fusion", model_opt.fusion)
    encoder = seq2vec_lib.factory(num_words, model_opt.seq2vec, dtype=dtype)
    classif = model_opt.classif or {}
    att = model_opt.attention or {}
    fus = model_opt.fusion or {}

    if arch in ("ConcatAtt", "MLBAtt", "MutanAtt"):
        scoring, head_kwargs = _att_scoring_fusion(arch, att, dtype)
        attention = GlimpseAttention(
            fusion=scoring,
            nb_glimpses=att.get("nb_glimpses", 1),
            dropout_mm=att.get("dropout_mm", 0.0),
            dtype=dtype,
            **head_kwargs,
        )
        final = fusion_lib.factory(fus, dtype=dtype)
        classifier = Classifier(
            num_answers=num_answers,
            dim_h=classif.get("dim_h"),
            activation=classif.get("activation", "tanh"),
            dropout=classif.get("dropout", 0.5),
            dtype=dtype,
        )
        return AttModel(
            encoder=encoder,
            attention=attention,
            final_fusion=final,
            classifier=classifier,
            l2norm_visual=model_opt.extra.get("l2norm_visual", False),
        )

    if arch in ("MLBNoAtt", "MutanNoAtt", "ConcatNoAtt"):
        final = fusion_lib.factory(fus, dtype=dtype)
        classifier = Classifier(
            num_answers=num_answers,
            dim_h=classif.get("dim_h"),
            activation=classif.get("activation", "tanh"),
            dropout=classif.get("dropout", 0.5),
            dtype=dtype,
        )
        return NoAttModel(
            encoder=encoder,
            fusion=final,
            classifier=classifier,
            l2norm_visual=model_opt.extra.get("l2norm_visual", False),
        )

    if arch in ("MFBCoAtt", "MFHCoAtt"):
        from vqa_tpu.models.mfb import MFBCoAttModel  # deferred: heavier module

        return MFBCoAttModel.build(model_opt, num_words, num_answers, dtype)

    if arch == "CoR":
        from vqa_tpu.models.cor import CoRModel

        return CoRModel.build(model_opt, num_words, num_answers, dtype)

    raise KeyError(
        f"unknown model arch {arch!r}; known: ConcatAtt, MLBAtt, MutanAtt, "
        "MLBNoAtt, MutanNoAtt, ConcatNoAtt, MFBCoAtt, MFHCoAtt, CoR"
    )
