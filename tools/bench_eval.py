"""Per-family eval-throughput benchmark (companion to bench.py).

bench.py is the headline contract (flagship MutanAtt only, one JSON line);
this tool measures the SAME production eval path — HBM-resident bf16 feature
table, device gather, {7,13,26} bucket ladder over VQA-distribution lengths,
single stacked readback — for any graded family, so the per-round artifact
(EVAL_rNN.json) can show where each model family sits.

Usage: python tools/bench_eval.py [arch]
  arch: mutan | cor | mfb | mfh | mutan_st (default mutan; mutan_st is the
  620/2400 skip-thoughts GRU encoder variant)
Env: BENCH_BATCH (1024), BENCH_QUESTIONS (32768), BENCH_IMAGES (1024),
  EVAL_APPEND=<file> appends the JSON line for artifact assembly.

Measurement discipline (perf ledger): best-of-2 timed passes against tunnel
interleaving; run tools/device_ready.py first when recording an artifact.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
N_QUESTIONS = int(os.environ.get("BENCH_QUESTIONS", 32768))
N_IMAGES = int(os.environ.get("BENCH_IMAGES", 1024))
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
SEQ, REGIONS, DIM = 26, 36, 2048
BUCKETS = (7, 13, SEQ)


def main() -> None:
    from vqa_tpu.config import load_options
    from vqa_tpu.engine.optim import factory as optim_factory
    from vqa_tpu.engine.steps import create_state, make_eval_step
    from vqa_tpu.models import factory
    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()
    arch = sys.argv[1] if len(sys.argv) > 1 else "mutan"
    yamls = {"mutan": "mutan_att.yaml", "cor": "cor.yaml",
             "mfb": "mfb_coatt.yaml", "mfh": "mfh_coatt.yaml",
             "mutan_st": "mutan_att.yaml"}
    if arch not in yamls:
        raise SystemExit(f"unknown arch {arch!r}; one of {sorted(yamls)}")
    yaml = yamls[arch]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_options(
        os.path.join(repo, "options/vqa2", yaml),
        overrides=["model.seq2vec.arch=skipthoughts"] if arch == "mutan_st" else None,
    )
    model = factory(opt.model, NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")

    rng = np.random.default_rng(0)
    questions = rng.integers(1, NUM_WORDS, (N_QUESTIONS, SEQ), dtype=np.int32)
    lengths = np.clip(np.round(rng.normal(6.2, 2.2, N_QUESTIONS)), 3, SEQ).astype(np.int32)
    questions *= (np.arange(SEQ)[None, :] < lengths[:, None]).astype(np.int32)
    image_index = rng.integers(0, N_IMAGES, N_QUESTIONS).astype(np.int32)
    order = np.argsort(lengths, kind="stable")  # eval bucketing = sorted order
    questions, lengths, image_index = questions[order], lengths[order], image_index[order]
    features = jnp.asarray(
        rng.standard_normal((N_IMAGES, REGIONS, DIM), dtype=np.float32), jnp.bfloat16
    )

    params = model.init(
        jax.random.key(0),
        jnp.zeros((2, REGIONS, DIM), jnp.bfloat16),
        jnp.zeros((2, SEQ), jnp.int32),
        jnp.ones((2,), jnp.int32),
    )["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    state = create_state(model, params, optim_factory(opt.optim, 1))
    eval_step = make_eval_step()
    n_batches = N_QUESTIONS // BATCH

    def batches():
        for i in range(n_batches):
            sl = slice(i * BATCH, (i + 1) * BATCH)
            t_b = next(b for b in BUCKETS if b >= int(lengths[sl].max()))
            yield {
                "question": jnp.asarray(questions[sl, :t_b]),
                "length": jnp.asarray(lengths[sl]),
                "image_index": jnp.asarray(image_index[sl]),
            }

    out = None
    for b in batches():  # warmup: compile every bucket shape
        out = eval_step(state, b, features)
    _ = np.asarray(out["pred"])

    stack = jax.jit(jnp.stack)

    def timed_pass() -> float:
        t0 = time.perf_counter()
        preds = [eval_step(state, b, features)["pred"] for b in batches()]
        preds = np.asarray(stack(preds))  # ONE host sync, as the engine does
        assert preds.shape == (n_batches, BATCH)
        return n_batches * BATCH / (time.perf_counter() - t0)

    qa_per_sec = max(timed_pass(), timed_pass())
    line = json.dumps({
        "metric": f"eval_throughput_{arch}",
        "value": round(qa_per_sec / jax.device_count(), 1),
        "unit": "QA pairs/sec/chip",
        "batch": BATCH,
        "n": N_QUESTIONS,
        "buckets": list(BUCKETS),
    })
    print(line)
    if os.environ.get("EVAL_APPEND"):
        with open(os.environ["EVAL_APPEND"], "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
