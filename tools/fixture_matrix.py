"""Run every graded config end-to-end (train -> eval -> official scorer) on
the synthetic fixture and emit ACCURACY.md — the round's verification
artifact that each config's full pipeline works and learns.

Usage: JAX_PLATFORMS=cpu python tools/fixture_matrix.py [--epochs 6]
(CPU-friendly tiny dims; accuracy here measures pipeline health on the
synthetic signal, not VQA-paper accuracy.)
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "concat_att": [],
    "mlb_att": ["--opt", "model.fusion.dim_h=24"],
    "mutan_att": [
        "--opt", "model.attention.dim_hq=12", "--opt", "model.attention.dim_hv=12",
        "--opt", "model.attention.dim_mm=16", "--opt", "model.attention.R=2",
        "--opt", "model.fusion.dim_hq=12", "--opt", "model.fusion.dim_hv=12",
        "--opt", "model.fusion.dim_mm=16", "--opt", "model.fusion.R=2",
    ],
    "mfb_coatt": ["--opt", "model.fusion.dim_mm=16", "--opt", "model.fusion.pool_factor=2"],
    "mfh_coatt": ["--opt", "model.fusion.dim_mm=16", "--opt", "model.fusion.pool_factor=2"],
    "cor": ["--opt", "vqa.trainsplit=train", "--opt", "model.fusion.dim_h=24"],
    "mlb_noatt": ["--opt", "model.fusion.dim_h=24"],
    "mutan_noatt": [
        "--opt", "model.fusion.dim_hq=12", "--opt", "model.fusion.dim_hv=12",
        "--opt", "model.fusion.dim_mm=16", "--opt", "model.fusion.R=2",
    ],
}

COMMON = [
    "--opt", "vqa.nans=25",
    "--opt", "model.seq2vec.emb_size=16",
    "--opt", "model.seq2vec.hidden_size=32",
    "--opt", "model.attention.dim_h=24",
    "--opt", "model.classif.dim_h=24",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--dir", default=None)
    p.add_argument(
        "--int8_delta", action="store_true",
        help="train every config twice (engine.features_dtype bfloat16 vs "
        "int8) and APPEND the accuracy-delta section to ACCURACY.md — the "
        "int8 capacity path's quantization cost on the official scorer "
        "(VERDICT r3 item 4)",
    )
    p.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (this image's sitecustomize overrides "
        "JAX_PLATFORMS, so the env var alone does not work)",
    )
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vqa_tpu.cli.train import main as train_main
    from vqa_tpu.datasets.fixtures import generate
    from vqa_tpu.scorer import evaluate_files

    work = args.dir or tempfile.mkdtemp(prefix="vqa_matrix_")
    generate(work, n_images=24, n_questions=200, seed=5)
    ann = os.path.join(work, "vqa2/raw/v2_mscoco_val2014_annotations.json")

    def run_config(name, extra, logs, dtype_opt=()):
        argv = [
            "--path_opt", os.path.join(REPO, "options/vqa2", f"{name}.yaml"),
            "--dir_logs", logs, "--epochs", str(args.epochs),
            "--batch_size", "16", "--lr", "0.003", "--print_freq", "0",
            "--opt", f"vqa.dir={work}/vqa2", "--opt", f"coco.dir={work}/coco",
            *COMMON, *extra, *dtype_opt,
        ]
        rc = train_main(argv)
        assert rc == 0, name
        with open(os.path.join(logs, "ckpt", "info.json")) as f:
            info = json.load(f)
        results = os.path.join(
            logs, "results", f"vqa_OpenEnded_val_epoch{info['best']}_results.json"
        )
        report = evaluate_files(results, ann)
        return info["best_acc"], report["overall"]

    acc_path = os.path.join(REPO, "ACCURACY.md")

    if args.int8_delta:
        rows = []
        for name, extra in CONFIGS.items():
            per = {}
            for dtype in ("bfloat16", "int8"):
                logs = os.path.join(work, "logs", f"{name}_{dtype}")
                per[dtype] = run_config(
                    name, extra, logs,
                    ("--opt", f"engine.features_dtype={dtype}"),
                )
            delta = per["int8"][1] - per["bfloat16"][1]
            rows.append((name, per["bfloat16"][1], per["int8"][1], delta))
            print(f"{name}: scorer bf16 {per['bfloat16'][1]:.1f} int8 "
                  f"{per['int8'][1]:.1f} (delta {delta:+.1f})")
        with open(acc_path, "a") as f:
            f.write(
                "\n## features_dtype=int8 accuracy delta (capacity path)\n\n"
                "Same fixture + seed + epochs, every graded config trained and\n"
                "scored twice: device feature table bfloat16 vs per-row-quantized\n"
                "int8 (engine.features_dtype). Fixture-noise-level signals (see\n"
                "header caveat), recorded so the capacity feature ships with its\n"
                "quantization cost measured rather than assumed.\n\n"
                "| config | scorer bf16 | scorer int8 | delta |\n|---|---|---|---|\n"
            )
            for name, b, i8, d in rows:
                f.write(f"| {name} | {b:.1f} | {i8:.1f} | {d:+.1f} |\n")
        print("appended int8 delta section to ACCURACY.md")
        return

    rows = []
    for name, extra in CONFIGS.items():
        acc1, overall = run_config(name, extra, os.path.join(work, "logs", name))
        rows.append((name, acc1, overall))
        print(f"{name}: best acc1 {acc1*100:.1f}, scorer {overall:.1f}")

    # REPLACE only the top table; preserve every appended "## " section
    # (TPU rehearsals etc. accumulate below the matrix table)
    kept = ""
    if os.path.exists(acc_path):
        old = open(acc_path).read()
        i = old.find("\n## ")
        if i != -1:
            kept = old[i:]
    with open(acc_path, "w") as f:
        f.write(
            "# ACCURACY — graded configs on the synthetic fixture\n\n"
            "All configs trained end-to-end via the CLI on the offline fixture\n"
            f"({args.epochs} epochs, tiny dims — pipeline-health numbers, not\n"
            "paper accuracy; real-data parity pends a populated reference mount,\n"
            "see SURVEY.md header). `scorer` is the official VQA metric over the\n"
            "emitted OpenEnded results json.\n\n"
            "| config | best val acc1 (engine) | scorer overall |\n|---|---|---|\n"
        )
        for name, acc1, overall in rows:
            f.write(f"| {name} | {acc1*100:.1f} | {overall:.1f} |\n")
        f.write(kept)
    print("wrote ACCURACY.md")


if __name__ == "__main__":
    main()
