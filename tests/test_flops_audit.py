"""Guards for tools/flops_audit.py (the SOL accounting artifact generator)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from tools.flops_audit import bucket_shares, load_measured, lowered_flops


def test_bucket_shares_sum_to_one_and_match_bench_distribution():
    shares = bucket_shares()
    assert set(shares) == {7, 13, 26}
    assert abs(sum(shares.values()) - 1.0) < 1e-9
    # the bench's N(6.2, 2.2) clip[3,26] puts most mass at or below 7 tokens
    assert shares[7] > 0.6
    assert shares[26] < 0.01


def test_lowered_flops_counts_a_known_matmul():
    m, n, k = 128, 256, 512
    a = jax.ShapeDtypeStruct((m, k), jnp.float32)
    b = jax.ShapeDtypeStruct((k, n), jnp.float32)
    flops = lowered_flops(lambda x, y: x @ y, a, b)
    assert flops == 2 * m * n * k  # XLA counts one dot as 2mnk


def test_lowered_flops_grad_roughly_triples_forward():
    # value_and_grad of x@w wrt w adds the dL/dw and dL/dx GEMMs: the
    # classic 3x-forward FLOP count the train accounting relies on
    m, n, k = 64, 64, 64
    x = np.ones((m, k), np.float32)
    w = jax.ShapeDtypeStruct((k, n), jnp.float32)

    def loss(wv):
        return jnp.sum(x @ wv)

    fwd = lowered_flops(loss, w)
    both = lowered_flops(lambda wv: jax.value_and_grad(loss)(wv), w)
    assert 1.5 * fwd < both <= 3.5 * fwd


def test_load_measured_reads_both_artifact_formats(tmp_path):
    # r3 style: one structured object with a "families" map
    r3_eval = tmp_path / "eval_r3.json"
    r3_eval.write_text(json.dumps({"families": {"mutan": 132081.7}}))
    r3_train = tmp_path / "train_r3.json"
    r3_train.write_text(json.dumps(
        {"families": {"mutan": {"blended_vqa": 43482.7}}}))
    assert load_measured(str(r3_eval), "eval") == {"mutan": 132081.7}
    assert load_measured(str(r3_train), "train") == {"mutan": 43482.7}

    # r5 style: JSONL append files, possibly several lines per arch at
    # different batches — batch==1024 (the analysis batch) must win, and a
    # lone non-1024 line must still be picked up rather than dropped
    lines = [
        {"metric": "train_step_throughput_mutan", "value": 16766.7,
         "bucketed_blend": {"vqa_like": 31624.2}, "batch": 256},
        {"metric": "train_step_throughput_mutan", "value": 20000.0,
         "bucketed_blend": {"vqa_like": 43900.0}, "batch": 1024},
        {"metric": "train_step_throughput_cor", "value": 21673.6,
         "bucketed_blend": {"vqa_like": 24598.2}, "batch": 256},
        {"metric": "eval_throughput_mutan", "value": 134383.6, "batch": 1024},
    ]
    r5 = tmp_path / "train_r5.json"
    r5.write_text("\n".join(json.dumps(l) for l in lines) + "\n")
    assert load_measured(str(r5), "train") == {
        "mutan": 43900.0, "cor": 24598.2}
    assert load_measured(str(r5), "eval") == {"mutan": 134383.6}

    assert load_measured(str(tmp_path / "missing.json"), "eval") == {}
