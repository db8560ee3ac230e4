"""A/B the eval recurrences: gru_seq_reference vs lstm_seq_reference.

EVAL_r03 showed mutan_st (GRU, 3 gates) 9% SLOWER than mutan (LSTM, 4
gates) at identical 620/2400 dims, though the GRU does 25% fewer
recurrence FLOPs. This probe times the two scan recurrences in isolation
(pipelined dispatch, one readback, best-of-N) to locate the gap.

Usage: python tools/probe_gru_vs_lstm.py [T] [B] [H]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vqa_tpu.ops.gru import gru_seq_reference
from vqa_tpu.ops.lstm import lstm_seq_reference
from vqa_tpu.utils import enable_compile_cache

enable_compile_cache()

REPS, ROUNDS = 16, 3


def time_fn(fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)  # compile + drain
    _ = np.asarray(jax.tree.leaves(out)[0][:1])
    best = float("inf")
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        out = None
        for _ in range(REPS):  # keep only the last output live (HBM)
            out = fn_j(*args)
        _ = np.asarray(jax.tree.leaves(out)[0][:1])  # one forced readback
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    H = int(sys.argv[3]) if len(sys.argv) > 3 else 2400
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    mask = jnp.asarray(np.ones((T, B, 1)), dt)
    gx3 = jnp.asarray(rng.standard_normal((T, B, 3 * H)), dt)
    gx4 = jnp.asarray(rng.standard_normal((T, B, 4 * H)), dt)
    wh3 = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.01, dt)
    wh4 = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.01, dt)
    bh3 = jnp.zeros((3 * H,), dt)

    # arrays as ARGUMENTS, never closure constants (remote-compile 413 trap).
    # h_last-only variants let XLA DCE the [T,B,H] seq stacking — the
    # return_sequence=False shape mutan's encoder runs; 'full' keeps seq
    # (what return_sequence=True co-attention models consume).
    fl_gru = 2.0 * T * B * H * 3 * H
    fl_lstm = 2.0 * T * B * H * 4 * H
    for tag, keep_seq in (("hlast", False), ("full", True)):
        pick = (lambda o: o) if keep_seq else (lambda o: o[0])
        ms_gru = time_fn(
            lambda gx, m, w, b: pick(gru_seq_reference(gx, m, w, b)),
            gx3, mask, wh3, bh3,
        )
        ms_lstm = time_fn(
            lambda xg, m, w: pick(lstm_seq_reference(xg, m, w)), gx4, mask, wh4
        )
        print(
            f"T={T} B={B} H={H} [{tag}]: gru {ms_gru:.2f}ms"
            f" ({fl_gru/ms_gru/1e9:.1f} TFLOPs)"
            f" | lstm {ms_lstm:.2f}ms ({fl_lstm/ms_lstm/1e9:.1f} TFLOPs)"
            f" | gru/lstm {ms_gru/ms_lstm:.2f}"
        )


if __name__ == "__main__":
    main()
