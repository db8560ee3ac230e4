"""Training-curve plots from a run dir's metrics.jsonl (SURVEY.md C21's
logger made visual — the lineage's habit of plotting the Experiment logs).

  python tools/plot_logs.py --dir_logs logs/vqa2/mutan_att [--out curves.png]

Left axis: train loss per epoch; right axis: val acc1/acc5 (and the
OOV-comparable *_labeled variants when present). One PNG, no display.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict


def load_history(path: str):
    splits = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "split" in rec and "epoch" in rec:
                splits[rec["split"]].append(rec)
    for records in splits.values():
        records.sort(key=lambda r: r["epoch"])
    return splits


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dir_logs", required=True)
    p.add_argument("--out", default=None, help="default <dir_logs>/curves.png")
    args = p.parse_args(argv)

    path = os.path.join(args.dir_logs, "metrics.jsonl")
    if not os.path.exists(path):
        print(f"no metrics.jsonl under {args.dir_logs}", file=sys.stderr)
        return 1
    splits = load_history(path)
    if not splits:
        print("metrics.jsonl holds no epoch records", file=sys.stderr)
        return 1

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax_loss = plt.subplots(figsize=(8, 5))
    ax_acc = ax_loss.twinx()

    train = splits.get("train", [])
    if train:
        epochs = [r["epoch"] for r in train if "loss" in r]
        ax_loss.plot(epochs, [r["loss"] for r in train if "loss" in r],
                     color="tab:red", marker="o", label="train loss")
    ax_loss.set_xlabel("epoch")
    ax_loss.set_ylabel("train loss", color="tab:red")

    for split, style in (("val", "-"), ("test", "--")):
        records = [r for r in splits.get(split, []) if "acc1" in r]
        if not records:
            continue
        epochs = [r["epoch"] for r in records]
        ax_acc.plot(epochs, [100 * r["acc1"] for r in records],
                    color="tab:blue", linestyle=style, marker="s",
                    label=f"{split} acc1")
        if "acc5" in records[0]:
            ax_acc.plot(epochs, [100 * r["acc5"] for r in records],
                        color="tab:cyan", linestyle=style, marker="^",
                        label=f"{split} acc5")
    ax_acc.set_ylabel("accuracy (%)", color="tab:blue")

    lines, labels = [], []
    for ax in (ax_loss, ax_acc):
        ln, lb = ax.get_legend_handles_labels()
        lines += ln
        labels += lb
    if lines:
        ax_loss.legend(lines, labels, loc="center right", fontsize=8)
    ax_loss.set_title(os.path.basename(os.path.abspath(args.dir_logs)))
    fig.tight_layout()

    out = args.out or os.path.join(args.dir_logs, "curves.png")
    fig.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
