"""Export CLI: freeze a run into a self-contained AOT serving artifact.

  python -m vqa_tpu.cli.export --dir_logs logs/vqa2/mutan_att --out exported/ \
      [--path_opt options/vqa2/mutan_att.yaml] [--resume best | --no_resume] \
      [--batch 64]

Writes ``<out>/program.jaxexport`` (serialized StableHLO of the jitted
forward at the fixed serving shape, weights baked in) + ``<out>/meta.json``
(vocabs, shapes, tokenizer flavor, provenance). Serve it with

  python -m vqa_tpu.cli.serve --exported exported/ [--coco_dir ...]

See vqa_tpu/export.py for the format; beyond-reference capability
(SURVEY.md C23 serving-side complement).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir_logs", required=True)
    p.add_argument("--path_opt", default=None,
                   help="defaults to the run dir's own options.yaml")
    p.add_argument("--resume", default="best", help="best | latest | <epoch>")
    p.add_argument("--no_resume", action="store_true",
                   help="export init params (a model.pretrained_params import)")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--batch", type=int, default=64,
                   help="frozen serving batch (requests are padded/chunked)")
    p.add_argument("--weights_dtype", default=None,
                   choices=["float32", "bfloat16", "int8"],
                   help="bfloat16: half-size artifact (TPU-native serving "
                        "dtype). int8: weight-only per-channel quantization, "
                        "~4x smaller, runtime dequant (baked mode only)")
    p.add_argument("--params", default="baked", choices=["baked", "external"],
                   help="baked: weights become program constants (one "
                        "self-contained file). external: weight-free program "
                        "+ sidecar params.npz — use for big models or "
                        "compile-request-size-limited environments")
    p.add_argument("--validate", type=int, default=0, metavar="N",
                   help="deployment gate: run N val-split questions through "
                        "BOTH the live model and the written artifact and "
                        "report answer agreement (fails the command if a "
                        "same-dtype artifact disagrees; bf16/int8 exports "
                        "report without failing — cast weights legitimately "
                        "perturb near-tie argmaxes)")
    p.add_argument("--platform", default=None, metavar="cpu|tpu|...",
                   help="force the jax backend (config API; see cli/train.py). "
                        "The artifact itself is lowered for cpu AND tpu "
                        "regardless — this only picks where the export runs")
    args = p.parse_args(argv)
    if args.weights_dtype == "int8" and args.params == "external":
        # reject before the (potentially minutes-long) checkpoint load —
        # the quantized pairs must live as baked program constants
        p.error("--weights_dtype int8 requires --params baked")

    from vqa_tpu.utils import force_platform

    force_platform(args.platform)

    from vqa_tpu.export import save_export
    from vqa_tpu.predictor import Predictor
    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()
    predictor = Predictor.from_run(
        args.dir_logs, args.path_opt,
        resume=None if args.no_resume else args.resume,
    )
    meta = save_export(
        args.out, predictor, batch=args.batch,
        weights_dtype=args.weights_dtype, params_mode=args.params,
    )
    print(
        f"exported {meta['model_arch']} (batch {meta['batch']}, "
        f"seq {meta['maxlength']}, features {meta['feature_shape']}, "
        f"{meta['num_answers']} answers, weights {meta['weights_dtype']}) "
        f"-> {args.out}",
        flush=True,
    )
    if args.validate:
        import numpy as np

        from vqa_tpu.export import load_export

        ep = load_export(args.out, features=predictor.dataset.features)
        split = predictor.dataset.split
        n = min(args.validate, len(split.image_names))
        rng = np.random.default_rng(0)
        idx = rng.choice(len(split.image_names), size=n, replace=False)
        # real split questions: decode the encoded rows is lossy, so run
        # the LOGITS comparison on the stored encodings directly
        import jax.numpy as jnp

        q = jnp.asarray(split.questions[idx])
        lengths = jnp.asarray(split.lengths[idx])
        visual = predictor.dataset.features.get(
            predictor.dataset.features.index_of(
                [str(split.image_names[i]) for i in idx]
            )
        )
        # run BOTH sides chunked+padded at the exported batch: identical
        # shapes mean identical XLA tilings (no near-tie flips from a
        # different batch shape) and zero extra compiles — the live side
        # reuses one shape instead of a fresh batch-n remote compile
        def pad_rows(a, start):
            chunk = np.asarray(a[start:start + ep.batch])
            need = ep.batch - chunk.shape[0]
            if need:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], need, 0)])
            return chunk

        live_rows, frozen_rows = [], []
        for start in range(0, n, ep.batch):
            m = min(ep.batch, n - start)
            v = pad_rows(visual, start).astype(np.float32)
            qq = jnp.asarray(pad_rows(np.asarray(q), start))
            ll = jnp.asarray(pad_rows(np.asarray(lengths), start))
            live_rows.append(np.asarray(
                predictor._forward(predictor.params, jnp.asarray(v), qq, ll)
            )[:m])
            frozen_rows.append(ep.logits(v[:m], qq[:m], ll[:m]))
        live = np.concatenate(live_rows)
        frozen = np.concatenate(frozen_rows)
        agree = float((frozen.argmax(-1) == live.argmax(-1)).mean())
        print(f"validate: answer agreement {agree:.4f} over {n} val questions",
              flush=True)
        # quantized/cast weights legitimately perturb near-tie argmaxes:
        # report, don't gate. Only a same-dtype artifact must agree exactly.
        if agree < 1.0 and args.weights_dtype in (None, "float32"):
            print("validate: FROZEN ARTIFACT DISAGREES WITH THE LIVE MODEL",
                  flush=True)
            return 1
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
