"""Speed-of-light accounting: analytic FLOPs vs measured throughput.

For every graded family this lowers the REAL eval forward and train
value_and_grad at the bench shapes (batch 1024, bucket ladder {7,13,26}),
reads the FLOP count from XLA's cost analysis on the lowered module (exact
for dot-generals — where all the work is), blends buckets by the same
VQA-length distribution the benches use, and divides the per-QA FLOPs into
the measured throughputs (EVAL_rNN.json / TRAIN_rNN.json) to report achieved
TFLOPs and the fraction of the device's calibration-verified sustained GEMM
rate (tools/device_ready.py, ~130 TFLOPs bf16 on v5e-1 through this image's
tunnel).

This runs entirely on CPU — lowering is tracing, no device work — so the
audit is cheap and deterministic. Caveats recorded in the output: the train
number excludes the optimizer update (elementwise; measured 8.4% of the step
in PROFILE_r03) and the eval number excludes the feature gather (0 FLOPs,
bandwidth-bound; gather ADR in the ledger).

Usage: python tools/flops_audit.py [--eval EVAL_r03.json] [--train TRAIN_r03.json]
       [--device-tflops 130] [--out SOL_r03.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 1024
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
REGIONS, DIM = 36, 2048
BUCKETS = (7, 13, 26)

FAMILIES = {
    "mutan": ("mutan_att.yaml", None),
    "mutan_st": ("mutan_att.yaml", ["model.seq2vec.arch=skipthoughts"]),
    "mfb": ("mfb_coatt.yaml", None),
    "mfh": ("mfh_coatt.yaml", None),
    "cor": ("cor.yaml", None),
}


def bucket_shares() -> dict:
    """Share of QA pairs riding each ladder rung under the bench's
    VQA-length distribution (normal(6.2, 2.2) clipped to [3, 26])."""
    rng = np.random.default_rng(0)
    lengths = np.clip(np.round(rng.normal(6.2, 2.2, 1 << 18)), 3, 26)
    shares, prev = {}, 0
    for b in BUCKETS:
        n = int((lengths <= b).sum())
        shares[b] = (n - prev) / lengths.size
        prev = n
    return shares


def lowered_flops(fn, *args) -> float:
    cost = jax.jit(fn).lower(*args).cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns one dict per device
        cost = cost[0]
    return float(cost["flops"])


def family_flops(arch: str) -> dict:
    """Per-QA eval/train FLOPs for one family, blended over the ladder."""
    import optax

    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory

    yaml, overrides = FAMILIES[arch]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_options(os.path.join(repo, "options/vqa2", yaml), overrides)
    model = factory(opt.model, NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")

    def init_struct(t):
        return jax.eval_shape(
            lambda: jax.tree.map(
                lambda p: p.astype(jnp.bfloat16),
                model.init(
                    jax.random.key(0),
                    jnp.zeros((2, REGIONS, DIM), jnp.bfloat16),
                    jnp.zeros((2, t), jnp.int32),
                    jnp.ones((2,), jnp.int32),
                )["params"],
            )
        )

    shares = bucket_shares()
    out = {"eval_flops_per_qa": 0.0, "train_flops_per_qa": 0.0, "buckets": {}}
    dropout_key = jax.random.key(1)
    for t in BUCKETS:
        params = init_struct(t)
        visual = jax.ShapeDtypeStruct((BATCH, REGIONS, DIM), jnp.bfloat16)
        question = jax.ShapeDtypeStruct((BATCH, t), jnp.int32)
        lengths = jax.ShapeDtypeStruct((BATCH,), jnp.int32)
        answers = jax.ShapeDtypeStruct((BATCH,), jnp.int32)

        def eval_fn(p, v, q, l):
            return model.apply({"params": p}, v, q, l)

        def train_fn(p, v, q, l, a):
            def loss_fn(pp):
                logits = model.apply(
                    {"params": pp}, v, q, l, train=True,
                    rngs={"dropout": dropout_key},
                )
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, a
                ).mean()

            return jax.value_and_grad(loss_fn)(p)

        ef = lowered_flops(eval_fn, params, visual, question, lengths)
        tf = lowered_flops(train_fn, params, visual, question, lengths, answers)
        out["buckets"][t] = {
            "eval_flops_per_qa": ef / BATCH,
            "train_flops_per_qa": tf / BATCH,
        }
        out["eval_flops_per_qa"] += shares[t] * ef / BATCH
        out["train_flops_per_qa"] += shares[t] * tf / BATCH
    return out


def load_measured(path: str, kind: str) -> dict:
    """arch -> measured QA/s from either artifact format.

    r3 artifacts are one structured object with a "families" map; r5+
    artifacts are JSONL append files (one bench line per family, possibly
    several per arch at different batches — the append-and-commit evidence
    discipline). For JSONL, lines whose batch matches the analysis BATCH
    win; otherwise the last line per arch does.
    """
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "families" in doc:
        fams = doc["families"]
        if kind == "train":
            return {k: v["blended_vqa"] for k, v in fams.items()}
        return dict(fams)
    prefix = ("eval_throughput_" if kind == "eval"
              else "train_step_throughput_")
    picked = {}  # arch -> (qa_per_sec, batch)
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        metric = rec.get("metric", "")
        if not metric.startswith(prefix):
            continue
        arch = metric[len(prefix):]
        if kind == "eval":
            val = rec["value"]
        else:  # blended over the train ladder, same lens as r3's blended_vqa
            val = rec.get("bucketed_blend", {}).get("vqa_like", rec["value"])
        prev = picked.get(arch)
        if rec.get("batch") == BATCH or prev is None or prev[1] != BATCH:
            picked[arch] = (val, rec.get("batch"))
    return {k: v[0] for k, v in picked.items()}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--eval", default="EVAL_r03.json")
    p.add_argument("--train", default="TRAIN_r03.json")
    p.add_argument("--device-tflops", type=float, default=130.0,
                   help="calibration-verified sustained bf16 GEMM rate")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    jax.config.update("jax_platforms", "cpu")  # tracing only; keep off the TPU

    measured_eval = load_measured(args.eval, "eval")
    measured_train = load_measured(args.train, "train")

    record = {
        "metric": "speed_of_light_accounting",
        "device_sustained_tflops_bf16": args.device_tflops,
        "batch": BATCH,
        "buckets": list(BUCKETS),
        "bucket_shares": {str(k): round(v, 4) for k, v in bucket_shares().items()},
        "note": (
            "FLOPs from XLA cost analysis on the lowered eval forward / train "
            "value_and_grad at bench shapes, blended over the VQA-length ladder; "
            "train excludes the optimizer update (elementwise, 8.4% of the step "
            "per PROFILE_r03), eval excludes the 0-FLOP feature gather. "
            "pct_of_sustained divides achieved TFLOPs by the tunnel-measured "
            "sustained GEMM rate, i.e. 100% == running as fast as back-to-back "
            "large matmuls on this device. This is a FLOP-only lens: families "
            "whose hot loop is bandwidth-bound sit legitimately low — mutan "
            "eval is dominated by the 0-FLOP feature gather (at its measured "
            "random-row HBM ceiling, gather ADR) plus a short-T recurrence, "
            "so its 27% is the bandwidth bound showing through, not MXU "
            "headroom (component probe: tools/probe_gather.py). The FLOP-"
            "dense families (mfb/mfh/cor) are the ones where pct tracks real "
            "MXU utilization."
        ),
        "families": {},
    }
    for arch in FAMILIES:
        fam = family_flops(arch)
        entry = {
            "eval_flops_per_qa": round(fam["eval_flops_per_qa"]),
            "train_flops_per_qa": round(fam["train_flops_per_qa"]),
            "per_bucket": {
                str(t): {k: round(v) for k, v in d.items()}
                for t, d in fam["buckets"].items()
            },
        }
        if arch in measured_eval:
            qa_s = measured_eval[arch]
            tfl = fam["eval_flops_per_qa"] * qa_s / 1e12
            entry["eval"] = {
                "measured_qa_per_sec": qa_s,
                "achieved_tflops": round(tfl, 1),
                "pct_of_sustained": round(100 * tfl / args.device_tflops, 1),
            }
        if arch in measured_train:
            qa_s = measured_train[arch]
            tfl = fam["train_flops_per_qa"] * qa_s / 1e12
            entry["train"] = {
                "measured_qa_per_sec": qa_s,
                "achieved_tflops": round(tfl, 1),
                "pct_of_sustained": round(100 * tfl / args.device_tflops, 1),
            }
        record["families"][arch] = entry
        print(f"{arch}: eval {entry.get('eval', {})} train {entry.get('train', {})}",
              file=sys.stderr, flush=True)

    line = json.dumps(record)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
