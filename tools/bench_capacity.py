"""Real-scale capacity rehearsal for the >HBM feature-table story
(VERDICT r3 item 4): the int8 and row-sharded paths have only ever carried
1024-image toy tables; this tool loads a TRAINVAL-SCALE table and measures.

Two modes:

  --int8 (default; real chip): generate a ~123k-image synthetic table
    (trainval bottom-up scale: 36x2048 per image = ~18.1 GB bf16, over one
    v5e's HBM), per-row-quantize to int8 (~9.1 GB), put it on the chip, and
    run the bench eval loop (mutan flagship bf16, {7,13,26} ladder, VQA
    lengths, batch 1024, best-of-2 passes, single stacked readback) with
    gather indices spanning the WHOLE table. Records device memory stats
    (bytes_in_use / peak) alongside QA/s — the evidence that the capacity
    path actually resides and gathers at scale.

  --rowsharded_cpu: the bf16 equivalent on the 8-device virtual CPU mesh —
    the full-scale 18.1 GB bf16 table row-sharded over the mesh
    (engine.features_sharded layout), one sharded eval step, asserts finite
    preds. Host-RAM-bound rehearsal of the multi-chip >HBM layout.

  --ab_streamed (real chip): streamed-vs-direct put equivalence A/B at a
    sub-threshold table size (~4GB int8, 55k images): same table, both put
    paths, same eval loop — asserts identical preds and records the QA/s
    ratio. Closes the "streamed accumulator gathers like a direct put"
    assumption (mesh._streamed_put).

Usage: python tools/bench_capacity.py [--int8|--rowsharded_cpu|--ab_streamed]
       [--n_images N] [--out FILE]
Env: CAP_APPEND=<file> appends the JSON line. Run tools/device_ready.py
first when recording (tunnel discipline, perf ledger).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
SEQ, REGIONS, DIM = 26, 36, 2048
BATCH = 1024
N_QUESTIONS = 32_768
BUCKETS = (7, 13, SEQ)


def _gen_questions(rng, n_images):
    import numpy as np

    questions = rng.integers(1, NUM_WORDS, (N_QUESTIONS, SEQ), dtype=np.int32)
    lengths = np.clip(np.round(rng.normal(6.2, 2.2, N_QUESTIONS)), 3, SEQ).astype(np.int32)
    questions *= (np.arange(SEQ)[None, :] < lengths[:, None]).astype(np.int32)
    image_index = rng.integers(0, n_images, N_QUESTIONS).astype(np.int32)
    order = np.argsort(lengths, kind="stable")
    return questions[order], lengths[order], image_index[order]


def _gen_int8_table(rng, n_images, chunk=4096):
    """Chunked generation + per-row quantization: never materializes the
    full f32 table (123k x 36 x 2048 f32 would be 36 GB host RAM)."""
    import numpy as np

    values = np.empty((n_images, REGIONS, DIM), np.int8)
    scales = np.empty((n_images, REGIONS, 1), np.float32)
    from vqa_tpu.engine.steps import quantize_features

    for start in range(0, n_images, chunk):
        stop = min(start + chunk, n_images)
        block = rng.standard_normal((stop - start, REGIONS, DIM), dtype=np.float32)
        v, s = quantize_features(block)
        values[start:stop], scales[start:stop] = v, s
    return values, scales


def _flagship_state(mesh):
    import jax
    import jax.numpy as jnp

    from vqa_tpu.engine.optim import factory as optim_factory
    from vqa_tpu.engine.steps import create_state
    from vqa_tpu.parallel.mesh import replicated
    from __graft_entry__ import _flagship_model

    model, opt = _flagship_model(NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")
    params = model.init(
        jax.random.key(0),
        jnp.zeros((2, REGIONS, DIM), jnp.bfloat16),
        jnp.zeros((2, SEQ), jnp.int32),
        jnp.ones((2,), jnp.int32),
    )["params"]
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    state = create_state(model, params, optim_factory(opt.optim, 1))
    return jax.device_put(state, replicated(mesh))


def _eval_batches(questions, lengths, image_index, in_shard):
    import jax

    n_batches = N_QUESTIONS // BATCH
    for i in range(n_batches):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        tmax = int(lengths[sl].max())
        t_b = next(b for b in BUCKETS if b >= tmax)
        yield jax.device_put(
            {"question": questions[sl, :t_b], "length": lengths[sl],
             "image_index": image_index[sl]},
            in_shard,
        )


def run_int8(n_images: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.engine.steps import make_eval_step
    from vqa_tpu.parallel.mesh import (
        batch_sharding, make_mesh, put_replicated_table,
    )

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    questions, lengths, image_index, = _gen_questions(rng, n_images)
    t0 = time.perf_counter()
    values, scales = _gen_int8_table(rng, n_images)
    gen_s = time.perf_counter() - t0
    table_gb = (values.nbytes + scales.nbytes) / 1e9

    # canonical row-major put (mesh.table_format): the default put layout
    # costs a full-table in-program relayout copy — at 9GB that copy alone
    # OOMs the 16GB v5e (root-caused r4 session 10)
    t0 = time.perf_counter()
    features = (
        put_replicated_table(values, mesh),
        put_replicated_table(scales.astype(jnp.bfloat16), mesh),
    )
    jax.block_until_ready(features)
    put_s = time.perf_counter() - t0
    del values, scales

    state = _flagship_state(mesh)
    eval_step = make_eval_step()
    in_shard = batch_sharding(mesh)

    out = None  # warmup pass: compile every bucket + drain
    for b in _eval_batches(questions, lengths, image_index, in_shard):
        out = eval_step(state, b, features)
    _ = np.asarray(out["pred"])

    stack = jax.jit(jnp.stack)

    def timed_pass():
        t0 = time.perf_counter()
        preds = [
            eval_step(state, b, features)["pred"]
            for b in _eval_batches(questions, lengths, image_index, in_shard)
        ]
        preds = np.asarray(stack(preds))
        assert preds.shape == (N_QUESTIONS // BATCH, BATCH)
        return N_QUESTIONS / (time.perf_counter() - t0)

    qa_per_sec = max(timed_pass(), timed_pass())
    stats = jax.devices()[0].memory_stats() or {}
    return {
        "metric": "capacity_int8_eval",
        "platform": jax.devices()[0].platform,
        "n_images": n_images,
        "table_gb_int8": round(table_gb, 2),
        "table_gb_bf16_equiv": round(n_images * REGIONS * DIM * 2 / 1e9, 2),
        "gen_s": round(gen_s, 1),
        "device_put_s": round(put_s, 1),
        "qa_per_sec": round(qa_per_sec, 1),
        # the axon plugin returns empty/zero memory_stats (probed r4s17) —
        # record null rather than a misleading 0.0; the residency evidence is
        # then the run itself (a 2x-table program cannot compile on 16GB)
        "hbm_bytes_in_use_gb": round(stats["bytes_in_use"] / 1e9, 2)
        if stats.get("bytes_in_use") else None,
        "hbm_peak_gb": round(stats["peak_bytes_in_use"] / 1e9, 2)
        if stats.get("peak_bytes_in_use") else None,
    }


def run_ab_streamed(n_images: int) -> dict:
    """Streamed-put equivalence A/B (VERDICT r4 item 7): at a sub-threshold
    size where device_put still honors the row-major Format (~4GB int8 at
    55k images; the drop threshold probed in (4.4, 9.1] GB), put the SAME
    table via the direct Format put and via a forced _streamed_put, run the
    same eval loop over both, and assert byte-identical preds + QA/s parity.
    Closes the last assumption in the >HBM capacity path: that the streamed
    accumulator's committed layout gathers exactly like a direct put.
    Both legs run back-to-back in one process (tunnel variance minimized)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.engine.steps import make_eval_step
    from vqa_tpu.parallel import mesh as mesh_mod
    from vqa_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated, table_format,
    )

    mesh = make_mesh()
    rng = np.random.default_rng(0)
    questions, lengths, image_index = _gen_questions(rng, n_images)
    values, scales = _gen_int8_table(rng, n_images)
    scales = scales.astype(jnp.bfloat16)
    table_gb = (values.nbytes + scales.nbytes) / 1e9

    state = _flagship_state(mesh)
    eval_step = make_eval_step()
    in_shard = batch_sharding(mesh)
    sharding = replicated(mesh)

    def run_leg(put_fn):
        t0 = time.perf_counter()
        features = (put_fn(values), put_fn(scales))
        jax.block_until_ready(features)
        put_s = time.perf_counter() - t0
        layouts = tuple(f.format.layout.major_to_minor for f in features)
        out = None
        for b in _eval_batches(questions, lengths, image_index, in_shard):
            out = eval_step(state, b, features)
        _ = np.asarray(out["pred"])  # warmup + drain
        stack = jax.jit(jnp.stack)

        def timed_pass():
            t0 = time.perf_counter()
            preds = [
                eval_step(state, b, features)["pred"]
                for b in _eval_batches(questions, lengths, image_index, in_shard)
            ]
            preds = np.asarray(stack(preds))
            return preds, N_QUESTIONS / (time.perf_counter() - t0)

        preds, r1 = timed_pass()
        _, r2 = timed_pass()
        for f in features:
            f.delete()
        return preds, max(r1, r2), put_s, layouts

    def direct_put(x):
        out = jax.device_put(x, table_format(sharding, x.ndim))
        got = out.format.layout.major_to_minor
        assert got == tuple(range(x.ndim)), f"direct put dropped layout: {got}"
        return out

    def streamed_put(x):
        return mesh_mod._streamed_put(x, table_format(sharding, x.ndim))

    preds_d, qa_direct, put_d, lay_d = run_leg(direct_put)
    preds_s, qa_streamed, put_s_, lay_s = run_leg(streamed_put)
    assert lay_d == lay_s, f"layout mismatch: {lay_d} vs {lay_s}"
    preds_identical = bool((preds_d == preds_s).all())
    return {
        "metric": "capacity_streamed_put_ab",
        "platform": jax.devices()[0].platform,
        "n_images": n_images,
        "table_gb_int8": round(table_gb, 2),
        "qa_per_sec_direct": round(qa_direct, 1),
        "qa_per_sec_streamed": round(qa_streamed, 1),
        "streamed_over_direct": round(qa_streamed / qa_direct, 4),
        "put_s_direct": round(put_d, 1),
        "put_s_streamed": round(put_s_, 1),
        "preds_identical": preds_identical,
    }


def run_rowsharded_cpu(n_images: int, n_devices: int = 8) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)
    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()  # AFTER the platform is known (ISA-keyed CPU dir)
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.engine.steps import make_eval_step
    from vqa_tpu.parallel.mesh import (
        batch_sharding, make_mesh, shard_feature_table,
    )

    mesh = make_mesh(jax.devices()[:n_devices])
    rng = np.random.default_rng(0)
    # full-scale bf16 table, generated in chunks straight into bf16 host RAM
    table = np.empty((n_images, REGIONS, DIM), jnp.bfloat16)
    for start in range(0, n_images, 4096):
        stop = min(start + 4096, n_images)
        table[start:stop] = rng.standard_normal(
            (stop - start, REGIONS, DIM), dtype=np.float32
        ).astype(jnp.bfloat16)
    table_gb = table.nbytes / 1e9
    t0 = time.perf_counter()
    features = shard_feature_table(table, mesh)
    jax.block_until_ready(features)
    shard_s = time.perf_counter() - t0
    per_device_gb = features.nbytes / n_devices / 1e9
    del table

    state = _flagship_state(mesh)
    eval_step = make_eval_step(sharded_features=True)
    questions, lengths, image_index = _gen_questions(rng, n_images)
    batch = next(iter(_eval_batches(questions, lengths, image_index,
                                    batch_sharding(mesh))))
    out = eval_step(state, batch, features)
    pred = np.asarray(out["pred"])
    assert pred.shape == (BATCH,) and (pred >= 0).all() and (pred < NUM_ANSWERS).all()
    return {
        "metric": "capacity_rowsharded_bf16",
        "platform": "cpu_virtual_mesh",
        "n_images": n_images,
        "devices": n_devices,
        "table_gb_bf16": round(table_gb, 2),
        "per_device_gb": round(per_device_gb, 2),
        "shard_put_s": round(shard_s, 1),
        "sharded_eval_step_ok": True,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--rowsharded_cpu", action="store_true")
    p.add_argument("--ab_streamed", action="store_true",
                   help="streamed-vs-direct put equivalence A/B (sub-"
                        "threshold int8 table; default 55k images ~4GB)")
    p.add_argument("--n_images", type=int, default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from vqa_tpu.utils import enable_compile_cache

    if args.rowsharded_cpu:
        rec = run_rowsharded_cpu(args.n_images or 123_000)
    elif args.ab_streamed:
        enable_compile_cache()
        rec = run_ab_streamed(args.n_images or 55_000)
    else:
        enable_compile_cache()
        rec = run_int8(args.n_images or 123_000)
    line = json.dumps(rec)
    print(line, flush=True)
    for path in (args.out, os.environ.get("CAP_APPEND")):
        if path:
            with open(path, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
