"""Training-throughput microbenchmark (not the headline metric — that's
bench.py eval throughput per BASELINE.md; this quantifies the full
fwd+bwd+adam step for the graded full-train configs #3/#5).

Usage: python tools/bench_train.py [arch]   (arch: mutan | cor; default mutan)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 256))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
SEQ, REGIONS, DIM = 26, 36, 2048


def main() -> None:
    from vqa_tpu.config import load_options
    from vqa_tpu.engine.optim import criterion_factory, factory as optim_factory
    from vqa_tpu.engine.steps import create_state, make_train_step
    from vqa_tpu.models import factory

    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()
    arch = sys.argv[1] if len(sys.argv) > 1 else "mutan"
    yaml = {"mutan": "mutan_att.yaml", "cor": "cor.yaml"}[arch]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_options(os.path.join(repo, "options/vqa2", yaml))
    model = factory(opt.model, NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")

    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(
            rng.standard_normal((BATCH, REGIONS, DIM)), jnp.bfloat16
        ),
        "question": jnp.asarray(rng.integers(1, NUM_WORDS, (BATCH, SEQ)), jnp.int32),
        "length": jnp.asarray(rng.integers(5, SEQ + 1, BATCH), jnp.int32),
        "answer": jnp.asarray(rng.integers(0, NUM_ANSWERS, BATCH), jnp.int32),
    }
    params = model.init(
        jax.random.key(0), batch["visual"][:2], batch["question"][:2], batch["length"][:2]
    )["params"]
    state = create_state(model, params, optim_factory(opt.optim, 1))
    step = make_train_step(criterion_factory(), donate=True)
    key = jax.random.key(0)

    state, metrics = step(state, batch, key)  # compile
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch, key)
    _ = float(metrics["loss"])
    wall = time.perf_counter() - t0
    qa_s = STEPS * BATCH / wall
    print(
        json.dumps(
            {
                "metric": f"train_step_throughput_{arch}",
                "value": round(qa_s, 1),
                "unit": "QA pairs/sec/chip",
                "steps": STEPS,
                "batch": BATCH,
                "loss": round(float(metrics["loss"]), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
