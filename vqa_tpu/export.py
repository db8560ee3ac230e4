"""AOT model export / serving artifacts via ``jax.export``.

Serving-side capability beyond the reference's demo scripts (SURVEY.md C23;
the reference has no deployment story — this is the TPU-native production
complement to ``cli/serve.py``): a trained run is frozen into a
self-contained directory

    <out>/
      program.jaxexport   serialized StableHLO of the jitted forward at a
                          fixed serving shape, with the checkpoint's weights
                          baked in as program constants
      meta.json           question vocab, answer vocab, shapes, tokenizer
                          flavor, feature-table coordinates, provenance

Why AOT for TPU serving: the artifact is compiled ONCE at export time and
the serving host never traces Python, never imports the model zoo (flax /
vqa_tpu.models are not touched on the load path — asserted by
tests/test_export.py), and cannot silently recompile at a new shape: the
batch dimension is frozen, so latency is flat by construction (the same
fixed-shape discipline cli/serve.py enforces dynamically). Version caveat:
``jax.export`` guarantees forward compatibility for serialized programs, and
`meta.json` records the exporting jax version for auditability.

Loading needs only jax + the tokenizer; features still come from the
FeatureStore named in the meta (weights travel inside the program, image
features do not).
"""

from __future__ import annotations

import json
import os
import types
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PROGRAM_FILE = "program.jaxexport"
META_FILE = "meta.json"
PARAMS_FILE = "params.npz"


def _flatten_params(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if hasattr(v, "items"):  # nested dict / FrozenDict
            out.update(_flatten_params(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_params(flat) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key in (flat.files if hasattr(flat, "files") else flat.keys()):
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(flat[key])
    return tree


def export_forward(
    model,
    params,
    *,
    batch: int,
    seq: int,
    feature_shape: Sequence[int],
    feat_dtype: Any = jnp.float32,
    platforms: Sequence[str] = ("cpu", "tpu"),
    params_mode: str = "baked",
    quantized: bool = False,
):
    """Export ``model.apply`` at a fixed serving shape.

    ``params_mode='baked'`` closes over the params, so ``jax.export`` lowers
    them into StableHLO constants: ONE self-contained file (inference-only —
    no donation, no trainable state). ``'external'`` exports
    ``fn(params, ...)`` instead — the program stays weight-free and the
    params ship as a sidecar npz; use this for big models or environments
    that cap compile-request sizes (constants embed in the HLO). Lowered for
    both cpu and tpu by default (the production-path forward is pure XLA —
    the Pallas dispatch layer keeps kernels off the eval graph per the
    measured ADRs — so cross-platform lowering is exact)."""
    from jax import export as jax_export

    args = (
        jax.ShapeDtypeStruct((batch, *tuple(feature_shape)), feat_dtype),
        jax.ShapeDtypeStruct((batch, seq), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )
    if params_mode == "baked":

        def fn(visual, question, lengths):
            p = dequantize_int8(params) if quantized else params
            return model.apply({"params": p}, visual, question, lengths)

        return jax_export.export(jax.jit(fn), platforms=list(platforms))(*args)
    if quantized:
        raise ValueError("int8 quantization requires params_mode='baked'")
    if params_mode == "external":

        def fn_ext(p, visual, question, lengths):
            return model.apply({"params": p}, visual, question, lengths)

        # normalize to a plain nested dict so the load-side npz rebuild
        # produces the exact pytree structure the program was traced with
        params = _unflatten_params(_flatten_params(params))
        p_struct = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
        )
        return jax_export.export(jax.jit(fn_ext), platforms=list(platforms))(
            p_struct, *args
        )
    raise ValueError(f"params_mode must be 'baked' or 'external', got {params_mode!r}")


def _cast_floating(params, dtype):
    return jax.tree.map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )


def quantize_int8(params):
    """Weight-only int8 quantization, per-last-dim (output-channel) scales.

    Floating arrays with ndim >= 2 become ``(int8 values, f32 scales)``
    pairs; biases/scalars stay as-is (negligible size, precision-critical).
    symmetric: w ≈ q * scale, scale = max|w| / 127 per output channel.
    """

    def q(p):
        if not jnp.issubdtype(p.dtype, jnp.floating) or p.ndim < 2:
            return p
        axis = tuple(range(p.ndim - 1))
        scale = jnp.max(jnp.abs(p), axis=axis, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, jnp.ones_like(scale), scale)
        qv = jnp.clip(jnp.round(p / scale), -127, 127).astype(jnp.int8)
        return {"q": qv, "scale": scale.astype(jnp.float32), "dtype": str(p.dtype)}

    return jax.tree.map(q, params)


def dequantize_int8(qparams):
    """Inverse of :func:`quantize_int8` (runs inside the exported program:
    int8 constants -> per-channel rescale; halves weight HBM traffic vs
    bf16 at serving time on top of the 4x-vs-f32 artifact size)."""

    def is_q(v):
        return isinstance(v, dict) and set(v) == {"q", "scale", "dtype"}

    def dq(v):
        if is_q(v):
            return (v["q"].astype(jnp.float32) * v["scale"]).astype(
                jnp.dtype(v["dtype"])
            )
        return v

    return jax.tree.map(dq, qparams, is_leaf=is_q)


def save_export(
    out_dir: str,
    predictor,
    batch: int = 64,
    weights_dtype: Optional[str] = None,
    params_mode: str = "baked",
) -> Dict[str, Any]:
    """Freeze a :class:`~vqa_tpu.predictor.Predictor` into ``out_dir``.

    ``weights_dtype='bfloat16'`` casts the weights (halves the baked
    artifact; the TPU-native serving dtype). Inputs/outputs keep their
    original dtypes — only the weights change.

    ``weights_dtype='int8'`` (baked only) applies weight-only per-channel
    int8 quantization (:func:`quantize_int8`): ~4x smaller than f32, and
    the program dequantizes at run time so weight HBM reads halve vs bf16
    too. Compute dtype/activations are unchanged.

    ``params_mode='external'`` keeps the program weight-free and writes the
    params to a sidecar ``params.npz`` (stored as float32 — bfloat16 has no
    portable npz encoding — and re-cast per ``weights_dtype`` at load, which
    is lossless). Use for big models or environments that cap
    compile-request sizes.

    Returns the meta dict (also written to ``meta.json``).
    """
    quantized = weights_dtype == "int8"
    if quantized and params_mode != "baked":
        # fail before quantizing a (possibly large) tree
        raise ValueError("int8 quantization requires params_mode='baked'")
    ds, opt = predictor.dataset, predictor.opt
    feature_shape = list(ds.features.feature_shape)
    params = predictor.params
    if quantized:
        params = quantize_int8(params)
    elif weights_dtype is not None:
        params = _cast_floating(params, jnp.dtype(weights_dtype))
    exported = export_forward(
        predictor.model,
        params,
        batch=batch,
        seq=opt.vqa.maxlength,
        feature_shape=feature_shape,
        feat_dtype=jnp.float32,
        params_mode=params_mode,
        quantized=quantized,
    )
    meta = {
        "format": "vqa_tpu.export/1",
        "batch": batch,
        "maxlength": opt.vqa.maxlength,
        "pad": opt.vqa.pad,
        "nlp": opt.vqa.nlp,
        "feature_shape": feature_shape,
        "num_answers": ds.num_answers,
        "aid_to_ans": list(ds.vocabs.aid_to_ans),
        "word_to_wid": dict(ds.vocabs.word_to_wid),
        "model_arch": opt.model.arch,
        "engine_dtype": opt.engine.dtype,
        "weights_dtype": weights_dtype or "unchanged",
        "params": params_mode,
        "coco": {"dir": opt.coco.dir, "arch": opt.coco.arch, "mode": opt.coco.mode},
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM_FILE), "wb") as f:
        f.write(exported.serialize())
    if params_mode == "external":
        flat = _flatten_params(params)
        np.savez(
            os.path.join(out_dir, PARAMS_FILE),
            **{
                k: (v.astype(np.float32) if v.dtype.name == "bfloat16" else v)
                for k, v in flat.items()
            },
        )
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f)
    return meta


class _ServingDataset:
    """Duck-typed stand-in for the dataset attributes the serving layer uses
    (AnswerService/cli.serve touch ``.num_answers``, ``.vocabs``,
    ``.features`` and ``.split.image_names`` only)."""

    def __init__(self, features, aid_to_ans, word_to_wid):
        self.features = features
        self.num_answers = len(aid_to_ans)
        self.vocabs = types.SimpleNamespace(
            aid_to_ans=list(aid_to_ans), word_to_wid=dict(word_to_wid)
        )
        self.split = types.SimpleNamespace(image_names=features.names)


class ExportedPredictor:
    """Predictor-compatible inference over a saved export (no model code).

    Mirrors :class:`~vqa_tpu.predictor.Predictor`'s serving surface
    (``answer_batch`` / ``answer`` / ``encode_questions`` / ``.dataset``), so
    ``cli.serve.AnswerService`` works unchanged on top. The forward runs the
    deserialized fixed-shape program; arbitrary request sizes are padded and
    chunked to the exported batch.
    """

    def __init__(self, export_dir: str, features=None, meta: Optional[dict] = None):
        from jax import export as jax_export

        self.meta = _read_meta(export_dir) if meta is None else meta
        if self.meta.get("format") != "vqa_tpu.export/1":
            raise ValueError(
                f"unknown export format {self.meta.get('format')!r} in {export_dir}"
            )
        with open(os.path.join(export_dir, PROGRAM_FILE), "rb") as f:
            self._exported = jax_export.deserialize(bytearray(f.read()))
        # one executable, cached across calls (Exported.call retraces per call)
        self._call = jax.jit(self._exported.call)
        self._params = None
        if self.meta.get("params", "baked") == "external":
            with np.load(os.path.join(export_dir, PARAMS_FILE)) as flat:
                self._params = _unflatten_params(flat)
            if self.meta.get("weights_dtype") == "bfloat16":
                # npz stores float32 (no portable bf16 encoding); the f32
                # round-trip of a bf16 value is exact, so this cast restores
                # the traced dtype losslessly
                self._params = _cast_floating(self._params, jnp.bfloat16)
        self.batch = int(self.meta["batch"])
        self.dataset = (
            _ServingDataset(
                features, self.meta["aid_to_ans"], self.meta["word_to_wid"]
            )
            if features is not None
            else None
        )
        self._tok = None

    # -- question encoding (vocab travels in meta.json) ----------------------
    def encode_questions(self, questions: Sequence[str]):
        from vqa_tpu.datasets.processed import encode_question_batch
        from vqa_tpu.datasets.tokenizer import get_tokenizer

        if self._tok is None:
            self._tok = get_tokenizer(self.meta["nlp"])
        rows, lengths = encode_question_batch(
            questions, self._tok, self.meta["word_to_wid"],
            self.meta["maxlength"], self.meta["pad"],
        )
        return jnp.asarray(rows), jnp.asarray(lengths)

    # -- fixed-shape forward --------------------------------------------------
    def logits(self, visual, question, lengths) -> np.ndarray:
        """Forward n <= exported-batch rows (pads to the frozen shape)."""
        n = question.shape[0]
        if n == 0:
            raise ValueError("no rows to run (empty batch)")
        if n > self.batch:
            raise ValueError(f"{n} rows > exported batch {self.batch}; chunk first")
        pad = self.batch - n
        if pad:
            visual = np.concatenate([visual, np.repeat(visual[-1:], pad, axis=0)])
            question = jnp.concatenate([question, jnp.repeat(question[-1:], pad, 0)])
            lengths = jnp.concatenate([lengths, jnp.repeat(lengths[-1:], pad, 0)])
        args = (
            jnp.asarray(visual, jnp.float32),
            jnp.asarray(question, jnp.int32),
            jnp.asarray(lengths, jnp.int32),
        )
        if self._params is not None:
            out = self._call(self._params, *args)
        else:
            out = self._call(*args)
        return np.asarray(out)[:n]

    # -- Predictor-compatible serving surface ---------------------------------
    def answer_batch(
        self, questions: Sequence[str], image_names: Sequence[str], topk: int = 5
    ) -> List[List[Tuple[str, float]]]:
        from vqa_tpu.utils.decode import topk_answers

        if self.dataset is None:
            raise ValueError("ExportedPredictor was loaded without a feature store")
        out: List[List[Tuple[str, float]]] = []
        for start in range(0, len(questions), self.batch):
            qs = list(questions[start : start + self.batch])
            ims = list(image_names[start : start + self.batch])
            visual = self.dataset.features.get(self.dataset.features.index_of(ims))
            q, lengths = self.encode_questions(qs)
            logits = self.logits(visual, q, lengths)
            out.extend(topk_answers(logits, self.dataset.vocabs.aid_to_ans, topk))
        return out

    def answer(self, question: str, image_name: str, topk: int = 5):
        return self.answer_batch([question], [image_name], topk)[0]


def _read_meta(export_dir: str) -> dict:
    with open(os.path.join(export_dir, META_FILE)) as f:
        return json.load(f)


def load_export(
    export_dir: str,
    features=None,
    coco_dir: Optional[str] = None,
) -> ExportedPredictor:
    """Load an export. ``features`` may be a ready FeatureStore; otherwise the
    meta's feature-table coordinates are used (``coco_dir`` overrides the
    recorded directory — the table rarely lives at the training-time path on
    a serving host)."""
    meta = _read_meta(export_dir)
    if features is None:
        from vqa_tpu.datasets.features import FeatureStore

        coco = meta["coco"]
        features = FeatureStore(coco_dir or coco["dir"], coco["arch"], coco["mode"])
    return ExportedPredictor(export_dir, features=features, meta=meta)
