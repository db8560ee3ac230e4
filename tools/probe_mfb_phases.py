"""Per-phase eval probe for MFB/MFH co-attention (VERDICT r3 item 3: close
mfb/mfh the way mutan was closed — SOL_r03 has them at 63/69% of sustained
with no phase-level decomposition).

Times, pipelined (dispatch ITERS, one readback — tunnel discipline), at
bench shapes (B=1024, bf16, 36x2048 regions, the {7,26} bucket endpoints):

  model-bound phases (real params, same module code as the bench):
    enc    : encoder -> seq [B, T, 1024]
    qatt   : question self-attention -> [B, 2048]
    vatt   : MFB glimpse attention   -> [B, 4096]
    tail   : final fusion + classifier
    full   : whole-model eval forward

  standalone sub-phases of vatt (random weights, exact shapes):
    vproj  : [B*36, 2048] x [2048, 5000] — the dominant GEMM (~82% of
             audited eval FLOPs) -> achieved TFLOPs
    qproj  : [B, 2048] x [2048, 5000]
    pool   : qh * vh -> mfb_pool(k=5) -> [B, 36, 1000] (bandwidth phase:
             reads 2x[B,36,5000] bf16, writes [B,36,1000])
    gtail  : hidden Dense [B,36,1000]->512 + glimpse logits/softmax/
             weighted sums -> [B, 4096]

Usage: python tools/probe_mfb_phases.py [mfb|mfh] [--platform cpu|tpu]
  (env: BENCH_ITERS, BENCH_BATCH)
Run tools/device_ready.py first when recording numbers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vqa_tpu.utils import enable_compile_cache, force_platform

if "--platform" in sys.argv:  # sitecustomize ignores JAX_PLATFORMS (ledger)
    i = sys.argv.index("--platform")
    force_platform(sys.argv[i + 1])
    del sys.argv[i : i + 2]
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
NUM_WORDS, NUM_ANSWERS = 12_000, 2_000
REGIONS, DIM = 36, 2048
ITERS = int(os.environ.get("BENCH_ITERS", 16))
K, DMM = 5, 1000  # pool factor, joint dim (graded config #4)
DQ = 2 * 1024     # q after 2-glimpse self-attention over H=1024
DVA = 2 * 2048    # v after 2-glimpse attention


def timed(fn, readback):
    _ = np.asarray(readback(fn()))  # warm + drain
    t0 = time.perf_counter()
    out = None
    for _ in range(ITERS):
        out = fn()
    _ = np.asarray(readback(out))
    return (time.perf_counter() - t0) / ITERS


def main() -> None:
    from vqa_tpu.config import load_options
    from vqa_tpu.models import factory
    from vqa_tpu.ops.mfb_pool import mfb_pool

    arch = sys.argv[1] if len(sys.argv) > 1 else "mfb"
    yaml = {"mfb": "mfb_coatt.yaml", "mfh": "mfh_coatt.yaml"}[arch]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opt = load_options(os.path.join(repo, "options/vqa2", yaml))
    model = factory(opt.model, NUM_WORDS, NUM_ANSWERS, dtype="bfloat16")

    rng = np.random.default_rng(0)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((2, REGIONS, DIM), jnp.bfloat16),
        jnp.zeros((2, 26), jnp.int32),
        jnp.ones((2,), jnp.int32),
    )
    variables = jax.tree.map(lambda p: p.astype(jnp.bfloat16), variables)

    # model-bound phase fns (bound submodules see the real param tree)
    enc = jax.jit(lambda q, l: model.apply(
        variables, q, l, method=lambda m, qq, ll: m.encoder(qq, ll)))
    qatt = jax.jit(lambda seq, mask: model.apply(
        variables, seq, mask, method=lambda m, s, k: m.q_attention(s, k)))
    vatt = jax.jit(lambda qv, vis: model.apply(
        variables, qv, vis, method=lambda m, a, b: m.v_attention(a, b)[0]))

    def _tail(m, qv, va):
        z = m.final_fusion(qv, va)
        if isinstance(z, tuple):
            z = z[0]
        return m.classifier(z)

    tail = jax.jit(lambda qv, va: model.apply(variables, qv, va, method=_tail))
    full = jax.jit(lambda vis, q, l: model.apply(variables, vis, q, l))

    # standalone sub-phases of vatt (random weights, exact shapes)
    wq = jnp.asarray(rng.standard_normal((DQ, K * DMM)) * 0.02, jnp.bfloat16)
    wv = jnp.asarray(rng.standard_normal((DIM, K * DMM)) * 0.02, jnp.bfloat16)
    wh = jnp.asarray(rng.standard_normal((DMM, 512)) * 0.05, jnp.bfloat16)
    wg = jnp.asarray(rng.standard_normal((512, 2)) * 0.05, jnp.bfloat16)
    vproj = jax.jit(lambda v: jnp.einsum(
        "brd,dk->brk", v, wv, preferred_element_type=jnp.bfloat16))
    qproj = jax.jit(lambda q: jnp.dot(q, wq, preferred_element_type=jnp.bfloat16))

    def _pool(qh, vh):
        return mfb_pool(qh[:, None, :] * vh, K)

    pool = jax.jit(_pool)

    def _gtail(joint, v):
        h = jax.nn.relu(jnp.einsum(
            "brm,mh->brh", joint, wh, preferred_element_type=jnp.bfloat16))
        logits = jnp.einsum("brh,hg->brg", h, wg,
                            preferred_element_type=jnp.bfloat16)
        alpha = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        att = jnp.einsum("brg,brd->bgd", alpha.astype(jnp.bfloat16), v)
        return att.reshape(att.shape[0], -1)

    gtail = jax.jit(_gtail)

    visual = jnp.asarray(
        rng.standard_normal((BATCH, REGIONS, DIM), dtype=np.float32), jnp.bfloat16)
    qh = jnp.asarray(rng.standard_normal((BATCH, K * DMM)), jnp.bfloat16)
    vh = jnp.asarray(
        rng.standard_normal((BATCH, REGIONS, K * DMM), dtype=np.float32), jnp.bfloat16)
    joint = jnp.asarray(
        rng.standard_normal((BATCH, REGIONS, DMM), dtype=np.float32), jnp.bfloat16)
    qvec = jnp.asarray(rng.standard_normal((BATCH, DQ)), jnp.bfloat16)
    vavec = jnp.asarray(rng.standard_normal((BATCH, DVA)), jnp.bfloat16)

    for T in (7, 26):
        q = jnp.asarray(rng.integers(1, NUM_WORDS, (BATCH, T)), jnp.int32)
        lengths = jnp.full((BATCH,), T, jnp.int32)
        seq = jax.block_until_ready(enc(q, lengths))
        mask = q != 0

        rec = {"arch": arch, "batch": BATCH, "T": T}
        rec["enc_ms"] = round(timed(lambda: enc(q, lengths), lambda o: o[0, 0, 0]) * 1e3, 2)
        rec["qatt_ms"] = round(timed(lambda: qatt(seq, mask), lambda o: o[0, 0]) * 1e3, 2)
        rec["vatt_ms"] = round(timed(lambda: vatt(qvec, visual), lambda o: o[0, 0]) * 1e3, 2)
        rec["tail_ms"] = round(timed(lambda: tail(qvec, vavec), lambda o: o[0, 0]) * 1e3, 2)
        rec["full_ms"] = round(
            timed(lambda: full(visual, q, lengths), lambda o: o[0, 0]) * 1e3, 2)
        rec["sum_phases_ms"] = round(
            rec["enc_ms"] + rec["qatt_ms"] + rec["vatt_ms"] + rec["tail_ms"], 2)
        if T == 7:  # length-independent sub-phases: record once
            rec["vproj_ms"] = round(timed(lambda: vproj(visual), lambda o: o[0, 0, 0]) * 1e3, 2)
            flops = 2 * BATCH * REGIONS * DIM * K * DMM
            rec["vproj_tflops"] = round(flops / (rec["vproj_ms"] / 1e3) / 1e12, 1)
            rec["qproj_ms"] = round(timed(lambda: qproj(qvec), lambda o: o[0, 0]) * 1e3, 2)
            rec["pool_ms"] = round(timed(lambda: pool(qh, vh), lambda o: o[0, 0, 0]) * 1e3, 2)
            pool_bytes = 2 * BATCH * REGIONS * K * DMM * 2 + BATCH * REGIONS * DMM * 2
            rec["pool_gbps"] = round(pool_bytes / (rec["pool_ms"] / 1e3) / 1e9, 0)
            rec["gtail_ms"] = round(
                timed(lambda: gtail(joint, visual), lambda o: o[0, 0]) * 1e3, 2)
        rec["full_qa_s"] = round(BATCH / (rec["full_ms"] / 1e3), 0)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
