"""Guards for tools/flops_audit.py (the SOL accounting artifact generator)."""

import jax
import jax.numpy as jnp
import numpy as np

from tools.flops_audit import bucket_shares, lowered_flops


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
