"""Real-TPU spot check + microbenchmark for the Pallas kernel layer.

Usage: python tools/check_kernels.py   (requires the TPU backend)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.ops import flags
from vqa_tpu.ops.attention import _pallas_fwd as att_pallas, glimpse_attend_reference
from vqa_tpu.ops.lstm import _pallas_fwd as lstm_pallas, lstm_seq_reference
from vqa_tpu.ops.mfb_pool import _pallas_fwd as mfb_pallas, mfb_pool_reference


def timeit(f, *a, n=5):
    out = f(*a)
    _ = jax.tree.map(np.asarray, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _ = jax.tree.map(np.asarray, out)
    return (time.perf_counter() - t0) / n * 1000


def check(name, pallas_out, ref_out, atol):
    p = jax.tree.map(lambda x: np.asarray(x, np.float32), pallas_out)
    r = jax.tree.map(lambda x: np.asarray(x, np.float32), ref_out)
    err = max(
        float(np.max(np.abs(pp - rr)))
        for pp, rr in zip(jax.tree.leaves(p), jax.tree.leaves(r))
    )
    status = "OK " if err <= atol else "FAIL"
    print(f"{status} {name}: max|err|={err:.2e} (atol {atol})")
    return err <= atol


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    ok = True

    # glimpse attention, bench shapes
    B, R, G, D = 1024, 36, 2, 2048
    logits = jnp.asarray(rng.standard_normal((B, R, G)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, R, D)), jnp.bfloat16)
    f_p = jax.jit(lambda l, vv: att_pallas(l, vv))
    f_r = jax.jit(glimpse_attend_reference)
    ok &= check("glimpse_attend", f_p(logits, v), f_r(logits, v), atol=0.05)
    print(f"    pallas {timeit(f_p, logits, v):.2f} ms | xla {timeit(f_r, logits, v):.2f} ms")

    # mfb pool, config-#4 shapes
    z = jnp.asarray(rng.standard_normal((B * R, 5000)), jnp.bfloat16)
    g_p = jax.jit(lambda zz: mfb_pallas(zz, 5))
    g_r = jax.jit(lambda zz: mfb_pool_reference(zz, 5))
    ok &= check("mfb_pool", g_p(z), g_r(z), atol=0.05)
    print(f"    pallas {timeit(g_p, z):.2f} ms | xla {timeit(g_r, z):.2f} ms")

    # lstm sequence at a VMEM-eligible hidden size (H>=1024 dispatches to
    # the measured-equal XLA scan; see ops/lstm.py budget notes)
    T, H = 26, 512
    xg = jnp.asarray(rng.standard_normal((T, B, 4 * H)) * 0.3, jnp.bfloat16)
    lengths = rng.integers(5, T + 1, B)
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)[..., None],
        jnp.bfloat16,
    )
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.02, jnp.bfloat16)
    from vqa_tpu.ops.lstm import _vmem_budget_block_b

    bb = _vmem_budget_block_b(T, H, 2)
    h_p = jax.jit(lambda a, m, w: lstm_pallas(a, m, w, block_b=bb))
    h_r = jax.jit(lstm_seq_reference)
    ok &= check("lstm_seq", h_p(xg, mask, wh), h_r(xg, mask, wh), atol=0.08)
    print(f"    pallas {timeit(h_p, xg, mask, wh):.2f} ms | xla {timeit(h_r, xg, mask, wh):.2f} ms")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
