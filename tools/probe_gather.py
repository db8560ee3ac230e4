"""Batch-size probe for the eval step (VERDICT r1 item 3: the batch-2048
regression). Pipelined timing (dispatch N iters, one readback) so the ~27ms
tunnel sync doesn't mask per-batch cost.

Programs timed per batch size:
  gather : jnp.take(table, idx) alone
  xg     : the hoisted LSTM input GEMM [T*B, E] x [E, 4H]
  lstm   : lstm_seq recurrence on precomputed xg
  model  : eval_step on pre-gathered visual (no gather)
  full   : eval_step with image_index (gather inside the step)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.utils import enable_compile_cache

enable_compile_cache()

from vqa_tpu.engine.optim import factory as optim_factory
from vqa_tpu.engine.steps import create_state, make_eval_step
from __graft_entry__ import _flagship_model

N_IMAGES = int(os.environ.get("BENCH_IMAGES", 1024))
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
SEQ, REGIONS, DIM = 26, 36, 2048
H, E = 2400, 620
ITERS = int(os.environ.get("BENCH_ITERS", 16))


def timed(fn, readback):
    _ = np.asarray(readback(fn()))  # warm + drain
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):  # keep only the last output live: holding all
        out = fn()          # ITERS results (e.g. 16 x 0.5GB xg) OOMs HBM
    _ = np.asarray(readback(out))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((N_IMAGES, REGIONS, DIM)), jnp.bfloat16)
    model, opt = _flagship_model(NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")
    params = model.init(
        jax.random.key(0),
        jnp.zeros((2, REGIONS, DIM), jnp.bfloat16),
        jnp.zeros((2, SEQ), jnp.int32),
        jnp.ones((2,), jnp.int32),
    )["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    state = create_state(model, params, optim_factory(opt.optim, 1))
    eval_step = make_eval_step()
    gather = jax.jit(lambda idx: jnp.take(table, idx, axis=0))

    wx = jnp.asarray(rng.standard_normal((E, 4 * H)), jnp.bfloat16)
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.01, jnp.bfloat16)
    xg_gemm = jax.jit(
        lambda x: jnp.einsum("tbe,eg->tbg", x, wx, preferred_element_type=jnp.bfloat16)
    )
    from vqa_tpu.ops.lstm import lstm_seq

    lstm = jax.jit(lambda xg, m: lstm_seq(xg, m, wh)[0])

    for batch in (1024, 2048):
        idx = jnp.asarray(rng.integers(0, N_IMAGES, batch), jnp.int32)
        q = jnp.asarray(rng.integers(1, NUM_WORDS, (batch, SEQ)), jnp.int32)
        lengths = jnp.full((batch,), SEQ, jnp.int32)
        visual = jax.block_until_ready(gather(idx))
        x = jnp.asarray(rng.standard_normal((SEQ, batch, E)), jnp.bfloat16)
        xg = jax.block_until_ready(xg_gemm(x))
        mask = jnp.ones((SEQ, batch, 1), jnp.bfloat16)
        b_vis = {"question": q, "length": lengths, "visual": visual}
        b_idx = {"question": q, "length": lengths, "image_index": idx}

        rec = {"batch": batch}
        rec["gather_ms"] = round(timed(lambda: gather(idx), lambda o: o[0, 0, 0]) * 1e3, 2)
        rec["xg_ms"] = round(timed(lambda: xg_gemm(x), lambda o: o[0, 0, 0]) * 1e3, 2)
        rec["lstm_ms"] = round(timed(lambda: lstm(xg, mask), lambda o: o[0, 0]) * 1e3, 2)
        rec["model_ms"] = round(
            timed(lambda: eval_step(state, b_vis), lambda o: o["pred"]) * 1e3, 2
        )
        rec["full_ms"] = round(
            timed(lambda: eval_step(state, b_idx, table), lambda o: o["pred"]) * 1e3, 2
        )
        rec["full_qa_s"] = round(batch / (rec["full_ms"] / 1e3), 0)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
