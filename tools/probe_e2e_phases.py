"""Phase-timing probe for the e2e eval pipeline (VERDICT r2 weak 2 ADR).

Separates the e2e loop into additive phases, each timed best-of-3 over the
same 32k-question fixture bench_e2e uses:

  host assembly only   BatchIterator with no transform (pure numpy slicing)
  host + device_put    + the device transfer (prefetch-overlapped)
  device only          pre-transformed batches: dispatch + stacked readback
  full loop            the real thing

MEASURED ADR (2026-08-17, v5e-1, batch 1024 vs 2048): the r2 ledger's
"e2e@1024 is 21% below @2048, host per-batch overhead amortizing" hypothesis
is REFUTED — host assembly is 8ms of a 316ms epoch (2.5%, fully overlapped
by prefetch), host+put sustains >400k QA/s standalone, and the device-only
rate equals the full-loop rate at BOTH batch sizes (1024: 105.6k device vs
103.6k full; 2048: 108.5k vs 105.7k, same session minutes apart). The
1024-vs-2048 spread recorded in r2 (102.8k vs 130.3k, separate processes)
was tunnel measurement contamination — the same artifact class as r2's
root-caused "batch-2048 collapse". bench_e2e now runs two timed epochs and
records the best; there is no host-overhead fix to make.

Usage: python tools/probe_e2e_phases.py [batch]  (fixture must exist —
run tools/bench_e2e.py once first)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.utils import enable_compile_cache

enable_compile_cache()
from vqa_tpu import datasets as datasets_lib
from vqa_tpu.config import load_options
from vqa_tpu.datasets.pipeline import BatchIterator, normalize_buckets
from vqa_tpu.engine import engine as engine_lib
from vqa_tpu.engine.optim import factory as optim_factory
from vqa_tpu.engine.steps import create_state, make_eval_step
from vqa_tpu.models import factory as model_factory
from vqa_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

def _batch_arg() -> int:
    # parsed lazily so importing this module (tests smoke-import tools/)
    # never trips over an unrelated sys.argv
    return int(sys.argv[1]) if len(sys.argv) > 1 else 1024


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = "/tmp/vqa_tpu_bench_fixture/1024x32768"


def main() -> None:
    BATCH = _batch_arg()
    opt = load_options(
        os.path.join(REPO, "options/vqa2/mutan_att.yaml"),
        overrides=[
            ("vqa.dir", os.path.join(FIXTURE, "vqa2")),
            ("coco.dir", os.path.join(FIXTURE, "coco")),
            ("engine.dtype", "bfloat16"),
            ("engine.device_features", True),
            ("optim.eval_batch_size", BATCH),
        ],
    )
    val_set = datasets_lib.factory("val", opt, visual_mode="index")
    mesh = make_mesh()
    model = model_factory(opt.model, 12000, 2000, dtype="bfloat16")
    params = model.init(
        jax.random.key(0),
        jnp.zeros((2,) + val_set.feature_shape, jnp.float32),
        jnp.zeros((2, opt.vqa.maxlength), jnp.int32),
        jnp.ones((2,), jnp.int32),
    )["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    state = jax.device_put(
        create_state(model, params, optim_factory(opt.optim, 1)), replicated(mesh)
    )
    features = jax.device_put(
        val_set.features.as_array().astype(jnp.bfloat16), replicated(mesh)
    )
    transform = engine_lib.make_device_transform(
        batch_sharding(mesh), dtype=jnp.bfloat16
    )
    buckets = normalize_buckets(((opt.vqa.maxlength + 1) // 2,), opt.vqa.maxlength)

    def make_loader(tr):
        return BatchIterator(
            val_set, BATCH, shuffle=False, pad_last=True, transform=tr,
            sort_by_length=True, length_buckets=buckets,
        )

    eval_step = make_eval_step()

    def strip(b):
        return {k: v for k, v in b.items() if k not in ("question_id", "valid_host")}

    # warmup: compile every bucket shape
    outs = [eval_step(state, strip(b), features) for b in make_loader(transform).epoch(0)]
    _ = np.asarray(jax.jit(jnp.stack)([o["pred"] for o in outs]))

    def timeit(label, fn, n=3):
        best = min(fn() for _ in range(n))
        print(f"{label}: {best*1e3:.1f} ms")
        return best

    def host_only():
        t0 = time.perf_counter()
        for _ in make_loader(None).epoch(1):
            pass
        return time.perf_counter() - t0

    def host_put():
        t0 = time.perf_counter()
        for _ in make_loader(transform).epoch(1):
            pass
        return time.perf_counter() - t0

    def full():
        t0 = time.perf_counter()
        outs = [
            eval_step(state, strip(b), features)
            for b in make_loader(transform).epoch(1)
        ]
        _ = np.asarray(jax.jit(jnp.stack)([o["pred"] for o in outs]))
        return time.perf_counter() - t0

    pre = [strip(b) for b in make_loader(transform).epoch(1)]

    def device_only():
        t0 = time.perf_counter()
        outs = [eval_step(state, db, features) for db in pre]
        _ = np.asarray(jax.jit(jnp.stack)([o["pred"] for o in outs]))
        return time.perf_counter() - t0

    ta, tb = timeit("host assembly only", host_only), timeit("host + device_put", host_put)
    tc, td = timeit("full loop", full), timeit("device only (pre-put)", device_only)
    n = len(val_set)
    print(
        f"batch={BATCH}  full={n/tc:.0f} QA/s  device_only={n/td:.0f}  "
        f"host_put_rate={n/tb:.0f}  assembly={n/ta:.0f}"
    )


if __name__ == "__main__":
    main()
