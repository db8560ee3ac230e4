"""Ablation profile of the flagship train step (where wall-clock lives —
SURVEY.md C16; VERDICT r1 item 4's "written compute-bound analysis" as a
per-round artifact instead of git-history notes).

Times four jitted variants of the MutanAtt step at flagship dims and derives
the component breakdown by subtraction:

  fwd          loss forward only (train=True, dropout on)
  grads        value_and_grad, optimizer skipped     -> bwd  = grads - fwd
  grads_femb   same but embedding grads stopped      -> embedding-grad
                                                        scatter = grads - grads_femb
  full         the real step (grads + adam update)   -> adam = full - grads

Finer bwd decomposition (r3, VERDICT r2 weak 3 — where the bwd:fwd 2.3 vs
the matmul-AD-ideal 2.0 lives), via stop_gradient on whole param subtrees
(XLA dead-code-eliminates every backward op that only feeds stopped grads;
question ids are integers so a fully-stopped encoder removes its entire
backward chain):

  grads_fenc     encoder (embed+lstm) stopped   -> encoder bwd = grads - this
  grads_fencatt  + attention fusion stopped     -> attention bwd = fenc - this
  grads_nodrop   dropout-free model, same params -> dropout cost = grads - this
                 (rates zeroed, train=True kept, so the custom-vjp dispatch
                 is unchanged and the delta is pure mask-gen + apply)

Timing is pipelined best-of-2 (dispatch STEPS, read back once) — the
tunneled device makes per-dispatch syncs latency-bound and single passes
noisy (perf ledger). Writes PROFILE_r{NN}.json at the repo root when
PROFILE_OUT is set, else prints the JSON line.

Usage: python tools/profile_train.py   (BENCH_BATCH/BENCH_STEPS as in
tools/bench_train.py; PROFILE_OUT=PROFILE_r02.json to write the artifact)
"""

import json
from functools import partial
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
SEQ_ENV = os.environ.get("BENCH_SEQ")
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
SEQ, REGIONS, DIM = 26, 36, 2048

# per-arch profile config: YAML + which param subtrees the finer ablation
# freezes ("mid" isolates the arch's middle stage: attention for the att
# family, the relation chain for CoR, the co-attention stack for MFB)
ARCHS = {
    "mutan": {"yaml": "mutan_att.yaml", "mid": ("attention",)},
    "cor": {"yaml": "cor.yaml",
            "mid": ("obj_proj", "chain", "step_gates")},
    "mfb": {"yaml": "mfb_coatt.yaml",
            "mid": ("q_attention", "v_attention")},
    "mfh": {"yaml": "mfh_coatt.yaml",
            "mid": ("q_attention", "v_attention")},
}


def main() -> None:
    from vqa_tpu.config import load_options
    from vqa_tpu.engine.optim import criterion_factory, factory as optim_factory
    from vqa_tpu.engine.steps import create_state
    from vqa_tpu.models import factory
    from vqa_tpu.utils import enable_compile_cache

    enable_compile_cache()
    jax.config.update("jax_default_prng_impl", os.environ.get("BENCH_RNG", "rbg"))
    arch = sys.argv[1] if len(sys.argv) > 1 else "mutan"
    cfg = ARCHS[arch]
    global SEQ
    if SEQ_ENV:
        SEQ = int(SEQ_ENV)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_options(os.path.join(repo, "options/vqa2", cfg["yaml"]))
    model = factory(opt.model, NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")
    criterion = criterion_factory()

    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(rng.standard_normal((BATCH, REGIONS, DIM)), jnp.bfloat16),
        "question": jnp.asarray(rng.integers(1, NUM_WORDS, (BATCH, SEQ)), jnp.int32),
        "length": jnp.asarray(rng.integers(5, SEQ + 1, BATCH), jnp.int32),
        "answer": jnp.asarray(rng.integers(0, NUM_ANSWERS, BATCH), jnp.int32),
    }
    params = model.init(
        jax.random.key(0), batch["visual"][:2], batch["question"][:2],
        batch["length"][:2],
    )["params"]
    state0 = create_state(model, params, optim_factory(opt.optim, 1))
    key = jax.random.key(0)

    # dropout-free twin at identical dims: same param tree, rates zeroed
    # (flax Dropout short-circuits at rate 0, train=True kept so the
    # custom-vjp dispatch matches the real step)
    nodrop_overrides = []
    for sec in ("seq2vec", "attention", "fusion", "classif"):
        for k in (getattr(opt.model, sec) or {}):
            if "dropout" in k:
                nodrop_overrides.append((f"model.{sec}.{k}", 0.0))
    opt_nd = load_options(
        os.path.join(repo, "options/vqa2", cfg["yaml"]), nodrop_overrides
    )
    model_nd = factory(opt_nd.model, NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")

    def _stop(params, paths):
        """stop_gradient the subtrees at '/'-separated paths (copy-on-write)."""

        def rebuild(node, parts):
            if not parts:
                return jax.tree.map(jax.lax.stop_gradient, node)
            node = dict(node)
            node[parts[0]] = rebuild(node[parts[0]], parts[1:])
            return node

        for path in paths:
            params = rebuild(params, path.split("/"))
        return params

    # params/batch/state MUST be jit ARGUMENTS, not closures — closed-over
    # arrays embed as HLO constants and the 56M-param graph overflows this
    # image's remote-compile request (HTTP 413)
    def loss_fn(params, batch, stop=(), apply_fn=None):
        if stop:
            params = _stop(params, stop)
        logits = (apply_fn or state0.apply_fn)(
            {"params": params}, batch["visual"], batch["question"],
            batch["length"], train=True,
            rngs={"dropout": jax.random.fold_in(key, 0)},
        )
        return criterion(logits, batch["answer"]).mean()

    @jax.jit
    def fwd(params, batch, carry):
        return carry + loss_fn(params, batch)

    import optax

    # consume EVERY grad leaf (global_norm) — reducing to one element lets
    # XLA dead-code-eliminate most of the backward and fakes the ablation
    @jax.jit
    def grads(params, batch, carry):
        g = jax.grad(loss_fn)(params, batch)
        return carry + optax.global_norm(g).astype(jnp.float32)

    @jax.jit
    def grads_femb(params, batch, carry):
        g = jax.grad(lambda p: loss_fn(p, batch, stop=("encoder/embed",)))(params)
        return carry + optax.global_norm(g).astype(jnp.float32)

    @jax.jit
    def grads_fenc(params, batch, carry):
        g = jax.grad(lambda p: loss_fn(p, batch, stop=("encoder",)))(params)
        return carry + optax.global_norm(g).astype(jnp.float32)

    @jax.jit
    def grads_fencatt(params, batch, carry):
        g = jax.grad(
            lambda p: loss_fn(p, batch, stop=("encoder",) + cfg["mid"])
        )(params)
        return carry + optax.global_norm(g).astype(jnp.float32)

    @jax.jit
    def grads_nodrop(params, batch, carry):
        g = jax.grad(lambda p: loss_fn(p, batch, apply_fn=model_nd.apply))(params)
        return carry + optax.global_norm(g).astype(jnp.float32)

    # donated like the real engine step — undonated, the optimizer-state
    # allocation churn dominates and misattributes ~40ms to "adam"
    @partial(jax.jit, donate_argnums=0)
    def full(state, batch):
        g = jax.grad(loss_fn)(state.params, batch)
        return state.apply_gradients(grads=g)

    def clock(name, fn, init):
        t0 = time.perf_counter()
        out = fn(init)
        jax.block_until_ready(out)
        print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(2):  # best-of-2: tunneled-device queue contamination
            cur = out
            t0 = time.perf_counter()
            for _ in range(STEPS):
                cur = fn(cur)
            np.asarray(jax.tree.leaves(cur)[0].ravel()[0])  # honest readback
            best = min(best, (time.perf_counter() - t0) / STEPS)
            out = cur  # donated fns invalidate older buffers — chain forward
        print(f"[{name}] {best*1e3:.2f} ms/step", file=sys.stderr, flush=True)
        return best * 1e3  # ms/step

    t_fwd = clock("fwd", lambda c: fwd(params, batch, c), jnp.float32(0.0))
    t_grads = clock("fwd_bwd", lambda c: grads(params, batch, c), jnp.float32(0.0))
    t_femb = clock(
        "fwd_bwd_frozen_emb", lambda c: grads_femb(params, batch, c), jnp.float32(0.0)
    )
    t_fenc = clock(
        "fwd_bwd_frozen_encoder", lambda c: grads_fenc(params, batch, c),
        jnp.float32(0.0),
    )
    t_fencatt = clock(
        "fwd_bwd_frozen_enc_att", lambda c: grads_fencatt(params, batch, c),
        jnp.float32(0.0),
    )
    t_nodrop = clock(
        "fwd_bwd_nodropout", lambda c: grads_nodrop(params, batch, c),
        jnp.float32(0.0),
    )
    t_full = clock("full_step", lambda s: full(s, batch), state0)

    report = {
        "metric": f"train_step_profile_{arch}",
        "batch": BATCH,
        "seq": SEQ,
        "ms_per_step": {
            "fwd": round(t_fwd, 2),
            "fwd_bwd": round(t_grads, 2),
            "full": round(t_full, 2),
        },
        "derived_ms": {
            "bwd": round(t_grads - t_fwd, 2),
            "embedding_grad_scatter": round(t_grads - t_femb, 2),
            "adam_update": round(t_full - t_grads, 2),
            # finer bwd decomposition (r3): deltas of frozen-subtree variants
            "encoder_bwd_incl_scatter": round(t_grads - t_fenc, 2),
            "mid_bwd": round(t_fenc - t_fencatt, 2),
            "tail_bwd": round(t_fencatt - t_fwd, 2),
            "dropout_total": round(t_grads - t_nodrop, 2),
            "mid_is": "+".join(cfg["mid"]),
        },
        "derived_pct_of_full": {
            "fwd": round(100 * t_fwd / t_full, 1),
            "bwd": round(100 * (t_grads - t_fwd) / t_full, 1),
            "embedding_grad_scatter": round(100 * (t_grads - t_femb) / t_full, 1),
            "adam_update": round(100 * (t_full - t_grads) / t_full, 1),
        },
        "qa_per_sec_full": round(BATCH / (t_full / 1e3), 1),
        "steps_timed": STEPS,
    }
    line = json.dumps(report)
    print(line)
    out = os.environ.get("PROFILE_OUT")
    if out:
        with open(os.path.join(repo, out), "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
