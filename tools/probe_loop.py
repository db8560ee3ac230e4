"""Isolate the bench-loop overhead at batch 2048 (VERDICT r1 item 3).

Variants timed over one pass (16 batches at 2048 / 32 at 1024), single
readback at the end, T=26 throughout:
  same    : one device-resident batch dispatched N times (probe_gather style)
  staged  : N distinct device-resident batches, pre-transferred
  put     : bench.py style — np slices + jax.device_put inside the loop
  thread  : device_put on a background thread (BatchIterator style)
"""

import json
import os
import sys
import time
import threading
import queue

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.utils import enable_compile_cache

enable_compile_cache()

from vqa_tpu.engine.optim import factory as optim_factory
from vqa_tpu.engine.steps import create_state, make_eval_step
from __graft_entry__ import _flagship_model

N_IMAGES = 1024
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
SEQ, REGIONS, DIM = 26, 36, 2048
N_QUESTIONS = 32_768


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

    questions = rng.integers(1, NUM_WORDS, (N_QUESTIONS, SEQ)).astype(np.int32)
    lengths = np.full(N_QUESTIONS, SEQ, np.int32)
    image_index = rng.integers(0, N_IMAGES, N_QUESTIONS).astype(np.int32)

    for batch in (1024, 2048):
        n_batches = N_QUESTIONS // batch

        def np_batch(i):
            sl = slice(i * batch, (i + 1) * batch)
            return {
                "question": questions[sl],
                "length": lengths[sl],
                "image_index": image_index[sl],
            }

        rec = {"batch": batch}

        # same: one device batch, N dispatches
        b0 = jax.device_put(np_batch(0))
        jax.block_until_ready(b0)
        _ = np.asarray(eval_step(state, b0, table)["pred"])
        t0 = time.perf_counter()
        out = None
        for _ in range(n_batches):
            out = eval_step(state, b0, table)
        _ = np.asarray(out["pred"])
        rec["same_qa_s"] = round(N_QUESTIONS / (time.perf_counter() - t0), 0)

        # staged: N distinct device batches, pre-transferred
        staged = [jax.device_put(np_batch(i)) for i in range(n_batches)]
        jax.block_until_ready(staged)
        t0 = time.perf_counter()
        for b in staged:
            out = eval_step(state, b, table)
        _ = np.asarray(out["pred"])
        rec["staged_qa_s"] = round(N_QUESTIONS / (time.perf_counter() - t0), 0)
        del staged

        # put: device_put inside the loop (bench.py style)
        t0 = time.perf_counter()
        for i in range(n_batches):
            out = eval_step(state, jax.device_put(np_batch(i)), table)
        _ = np.asarray(out["pred"])
        rec["put_qa_s"] = round(N_QUESTIONS / (time.perf_counter() - t0), 0)

        # thread: background-thread device_put feeding a queue (pipeline style)
        q: queue.Queue = queue.Queue(maxsize=2)

        def producer():
            for i in range(n_batches):
                q.put(jax.device_put(np_batch(i)))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t0 = time.perf_counter()
        t.start()
        while True:
            b = q.get()
            if b is None:
                break
            out = eval_step(state, b, table)
        _ = np.asarray(out["pred"])
        rec["thread_qa_s"] = round(N_QUESTIONS / (time.perf_counter() - t0), 0)
        t.join()

        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
