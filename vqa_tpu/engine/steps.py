"""Jitted train/eval steps (SURVEY.md C16 hot loop).

One fused XLA program per step: forward + CE loss + backward + optimizer
update, with the train state donated so parameter buffers update in place in
HBM. Metrics come back as a small scalar dict; logits never leave the device
on the train path.

Eval is a separate jit (no grads): top-1/top-5 + predicted answer ids, with a
``valid`` mask so the last partial batch can ride the same static shape
(SURVEY.md C7 / pipeline.pad_last).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState; dropout folds the step into the base rng."""


def create_state(model, params, tx) -> TrainState:
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _topk_acc(logits: jax.Array, labels: jax.Array, k: int) -> jax.Array:
    topk = jax.lax.top_k(logits, k)[1]              # [B, k]
    return (topk == labels[:, None]).any(axis=-1)


def quantize_features(table):
    """Per-row symmetric int8 quantization of a feature table [N, ..., D]:
    returns (values int8, scales [N, ..., 1]). Halves the HBM footprint vs
    bf16 (a full VQA-v2 trainval bottom-up table is ~18GB bf16 — over v5e
    HBM — and ~9GB int8) and halves gather bandwidth."""
    import numpy as np

    absmax = np.abs(table).max(axis=-1, keepdims=True)
    scales = (absmax / 127.0 + 1e-12).astype(np.float32)
    values = np.clip(np.round(table / scales), -127, 127).astype(np.int8)
    return values, scales


def _resolve_visual(batch: Dict[str, jax.Array], features, allow_kernel: bool = True) -> jax.Array:
    """HBM-resident feature path (BASELINE north star): when the batch
    carries ``image_index`` instead of ``visual``, gather the region tensors
    from the device-resident table inside the jitted step — the host ships
    only token ids + indices (bytes, not the 36x2048 features). The gather
    rides the scalar-prefetch Mosaic kernel (ops/gather.py), 1.25x over
    jnp.take at bench shapes (KERNELS_r02.json, best-of-N — single-round
    timings swing +-30% through the tunnel). ``features`` may be an
    int8-quantized
    ``(values, scales)`` pair (engine.features_dtype=int8); dequantization
    happens after the gather, so only int8 bytes cross HBM."""
    if "visual" in batch:
        return batch["visual"]
    if features is None:
        raise ValueError("batch has image_index but no feature table was passed")
    from vqa_tpu.ops.gather import gather_rows

    take = gather_rows if allow_kernel else (
        lambda t, i: jnp.take(t, i, axis=0)
    )
    if isinstance(features, (tuple, list)):
        values, scales = features
        v = take(values, batch["image_index"])
        s = jnp.take(scales, batch["image_index"], axis=0)  # tiny
        return v.astype(s.dtype) * s
    return take(features, batch["image_index"])


def make_train_step(criterion: Callable, donate: bool = True, sharded_features: bool = False):
    """Returns jitted (state, batch, rng, features=None) -> (state, metrics).

    ``sharded_features``: the feature table is row-sharded over the mesh
    (engine.features_sharded — tables bigger than one chip's HBM). The
    Mosaic gather kernel has no SPMD partitioning rule, so this path keeps
    jnp.take and lets XLA partition the gather (local gather + collective)."""

    def train_step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        features=None,
    ):
        dropout_rng = jax.random.fold_in(rng, state.step)
        visual = _resolve_visual(batch, features, allow_kernel=not sharded_features)

        def loss_fn(params):
            logits = state.apply_fn(
                {"params": params},
                visual,
                batch["question"],
                batch["length"],
                train=True,
                rngs={"dropout": dropout_rng},
            )
            loss = criterion(logits, batch["answer"]).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": loss,
            "acc1": _topk_acc(logits, batch["answer"], 1).mean(),
            "acc5": _topk_acc(logits, batch["answer"], 5).mean(),
            "gnorm": optax.global_norm(grads),
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(sharded_features: bool = False):
    """Returns jitted (state, batch) -> per-batch eval outputs.

    Output dict: pred [B] aid, plus masked-sum metrics (correct1/correct5/n)
    so partial batches aggregate exactly. ``sharded_features`` as in
    :func:`make_train_step`.
    """

    def eval_step(state: TrainState, batch: Dict[str, jax.Array], features=None):
        logits = state.apply_fn(
            {"params": state.params},
            _resolve_visual(batch, features, allow_kernel=not sharded_features),
            batch["question"],
            batch["length"],
            train=False,
        )
        pred = logits.argmax(axis=-1).astype(jnp.int32)
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(pred.shape[0], dtype=bool)
        out = {"pred": pred, "n": valid.sum()}
        if "answer" in batch:
            labeled = valid & (batch["answer"] >= 0)
            out["n_labeled"] = labeled.sum()
            out["correct1"] = (_topk_acc(logits, batch["answer"], 1) & labeled).sum()
            out["correct5"] = (_topk_acc(logits, batch["answer"], 5) & labeled).sum()
        return out

    return jax.jit(eval_step)
