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

    rows = []
    for name, extra in CONFIGS.items():
        logs = os.path.join(work, "logs", name)
        argv = [
            "--path_opt", os.path.join(REPO, "options/vqa2", f"{name}.yaml"),
            "--dir_logs", logs, "--epochs", str(args.epochs),
            "--batch_size", "16", "--lr", "0.003", "--print_freq", "0",
            "--opt", f"vqa.dir={work}/vqa2", "--opt", f"coco.dir={work}/coco",
            *COMMON, *extra,
        ]
        rc = train_main(argv)
        assert rc == 0, name
        with open(os.path.join(logs, "ckpt", "info.json")) as f:
            info = json.load(f)
        results = os.path.join(
            logs, "results", f"vqa_OpenEnded_val_epoch{info['best']}_results.json"
        )
        report = evaluate_files(results, ann)
        rows.append((name, info["best_acc"], report["overall"]))
        print(f"{name}: best acc1 {info['best_acc']*100:.1f}, scorer {report['overall']:.1f}")

    with open(os.path.join(REPO, "ACCURACY.md"), "w") as f:
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
    print("wrote ACCURACY.md")


if __name__ == "__main__":
    main()
