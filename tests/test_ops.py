"""Pallas kernels vs jnp references (SURVEY.md section 4 "Pallas kernels vs
jnp reference implementations"). On the CPU test backend the kernels run in
TPU interpret mode; a real-TPU spot check lives in tools/check_kernels.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vqa_tpu.ops import flags
from vqa_tpu.ops.attention import glimpse_attend, glimpse_attend_reference
from vqa_tpu.ops.lstm import lstm_seq, lstm_seq_reference, _pallas_fwd as lstm_pallas
from vqa_tpu.ops.mfb_pool import mfb_pool, mfb_pool_reference
from vqa_tpu.ops.attention import _pallas_fwd as att_pallas
from vqa_tpu.ops.mfb_pool import _pallas_fwd as mfb_pallas


@pytest.fixture(autouse=True)
def _interpret_kernels():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_glimpse_attend_matches_reference():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((8, 36, 2)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 36, 64)), jnp.float32)
    out = att_pallas(logits, v, block_b=8)
    ref = glimpse_attend_reference(logits, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_glimpse_attend_grad_matches_reference():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal((8, 12, 2)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 12, 16)), jnp.float32)
    flags.set_pallas("off")  # grad path: custom_vjp backward vs autodiff
    try:
        f = lambda l, vv: (glimpse_attend(l, vv) ** 2).sum()
        r = lambda l, vv: (glimpse_attend_reference(l, vv) ** 2).sum()
        gl, gv = jax.grad(f, argnums=(0, 1))(logits, v)
        rl, rv = jax.grad(r, argnums=(0, 1))(logits, v)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(rl), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-5, atol=1e-6)
    finally:
        flags.set_pallas("auto")


def test_glimpse_head_matches_reference():
    from vqa_tpu.ops.attention import _head_pallas, glimpse_head_reference

    rng = np.random.default_rng(6)
    joint = jnp.asarray(rng.standard_normal((8, 36, 48)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((48, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2,)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 36, 64)), jnp.float32)
    out, logits = _head_pallas(joint, w, b, v, block_b=8)
    ref_out, ref_logits = glimpse_head_reference(joint, w, b, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-5
    )


def test_glimpse_head_grad_matches_reference():
    from vqa_tpu.ops.attention import glimpse_head, glimpse_head_reference

    rng = np.random.default_rng(7)
    joint = jnp.asarray(rng.standard_normal((4, 9, 12)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((12, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2,)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((4, 9, 8)), jnp.float32)
    flags.set_pallas("off")
    try:
        f = lambda *a: (glimpse_head(*a)[0] ** 2).sum()
        r = lambda *a: (glimpse_head_reference(*a)[0] ** 2).sum()
        for gi, ri in zip(
            jax.grad(f, argnums=(0, 1, 2, 3))(joint, w, b, v),
            jax.grad(r, argnums=(0, 1, 2, 3))(joint, w, b, v),
        ):
            np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), rtol=1e-5, atol=1e-6)
    finally:
        flags.set_pallas("auto")


def test_gather_rows_matches_reference():
    from vqa_tpu.ops.gather import _pallas_fwd as gather_pallas, gather_rows_reference

    rng = np.random.default_rng(10)
    table = jnp.asarray(rng.standard_normal((10, 4, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 10, 24), jnp.int32)  # with repeats
    out = gather_pallas(table, idx)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(gather_rows_reference(table, idx))
    )


def test_gather_rows_grad_flows_to_table():
    from vqa_tpu.ops.gather import gather_rows, gather_rows_reference

    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)
    idx = jnp.asarray([1, 1, 4], jnp.int32)
    flags.set_pallas("off")
    try:
        g = jax.grad(lambda t: (gather_rows(t, idx) ** 2).sum())(table)
        r = jax.grad(lambda t: (gather_rows_reference(t, idx) ** 2).sum())(table)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6)
    finally:
        flags.set_pallas("auto")


def test_relation_attend_matches_reference():
    from vqa_tpu.ops.relation import _pallas_fwd as rel_pallas, relation_attend_reference

    rng = np.random.default_rng(8)
    pg = jnp.asarray(rng.standard_normal((8, 36, 64)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((8, 36, 64)), jnp.float32)
    out = rel_pallas(pg, r, block_b=8)
    ref = relation_attend_reference(pg, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_relation_attend_grad_matches_reference():
    from vqa_tpu.ops.relation import relation_attend, relation_attend_reference

    rng = np.random.default_rng(9)
    pg = jnp.asarray(rng.standard_normal((4, 6, 12)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((4, 6, 12)), jnp.float32)
    flags.set_pallas("off")
    try:
        f = lambda *a: (relation_attend(*a) ** 2).sum()
        ref = lambda *a: (relation_attend_reference(*a) ** 2).sum()
        for gi, ri in zip(
            jax.grad(f, argnums=(0, 1))(pg, r), jax.grad(ref, argnums=(0, 1))(pg, r)
        ):
            np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), rtol=1e-5, atol=1e-6)
    finally:
        flags.set_pallas("auto")


def test_mfb_pool_matches_reference():
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal((128, 40)), jnp.float32)
    out = mfb_pallas(z, k=5)
    ref = mfb_pool_reference(z, k=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # leading dims preserved
    z3 = z.reshape(4, 32, 40)
    out3 = mfb_pallas(z3, k=5)
    np.testing.assert_allclose(
        np.asarray(out3), np.asarray(mfb_pool_reference(z3, k=5)), rtol=1e-5, atol=1e-6
    )


def test_mfb_pool_grad():
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((8, 20)), jnp.float32)
    flags.set_pallas("off")
    try:
        g = jax.grad(lambda zz: mfb_pool(zz, 4).sum())(z)
        r = jax.grad(lambda zz: mfb_pool_reference(zz, 4).sum())(z)
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6)
    finally:
        flags.set_pallas("auto")


def test_lstm_seq_matches_reference():
    rng = np.random.default_rng(4)
    T, B, H = 5, 8, 16
    xg = jnp.asarray(rng.standard_normal((T, B, 4 * H)), jnp.float32)
    lengths = np.asarray([5, 3, 1, 5, 2, 4, 5, 5])
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None, :]).astype(np.float32)[..., None]
    )
    wh = jnp.asarray(rng.standard_normal((H, 4 * H)) * 0.1, jnp.float32)
    h_pal, seq_pal = lstm_pallas(xg, mask, wh, block_b=8)
    h_ref, seq_ref = lstm_seq_reference(xg, mask, wh)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq_pal), np.asarray(seq_ref), rtol=1e-4, atol=1e-5)


def test_dispatch_falls_back_off_tpu():
    """With pallas=auto on the CPU backend, public entry points use jnp."""
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.standard_normal((3, 7, 2)), jnp.float32)  # odd B
    v = jnp.asarray(rng.standard_normal((3, 7, 8)), jnp.float32)
    out = glimpse_attend(logits, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(glimpse_attend_reference(logits, v)), rtol=1e-6
    )
    z = jnp.asarray(rng.standard_normal((3, 20)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(mfb_pool(z, 4)), np.asarray(mfb_pool_reference(z, 4)), rtol=1e-6
    )


def test_lstm_bigmatmul_bwd_matches_native_ad():
    """The hand-written big-matmul LSTM backward (ops.lstm._lstm_seq_bigmatmul,
    the train-path option) must reproduce native scan-AD gradients exactly —
    including masked (padded) steps and both outputs (h_last, seq)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.ops.lstm import _lstm_seq_bigmatmul, lstm_seq_reference

    T, B, H, E4 = 7, 4, 5, 20
    rng = np.random.default_rng(0)
    xg = jnp.asarray(rng.standard_normal((T, B, E4)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((H, E4)) * 0.3, jnp.float32)
    lengths = np.asarray([T, 4, 1, 6])
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None]).astype(np.float32)[..., None]
    )

    def loss(fn, xg, wh):
        h_last, seq = fn(xg, mask, wh)
        # exercise BOTH outputs with asymmetric weights
        return (h_last * jnp.arange(1, H + 1)).sum() + (seq**2).sum() * 0.5

    ref_val, (ref_dxg, ref_dwh) = jax.value_and_grad(
        lambda a, w: loss(lstm_seq_reference, a, w), argnums=(0, 1)
    )(xg, wh)
    got_val, (got_dxg, got_dwh) = jax.value_and_grad(
        lambda a, w: loss(_lstm_seq_bigmatmul, a, w), argnums=(0, 1)
    )(xg, wh)

    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dxg), np.asarray(ref_dxg),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dwh), np.asarray(ref_dwh),
                               rtol=1e-5, atol=1e-6)


def test_gru_bigmatmul_bwd_matches_native_ad():
    """ops.gru big-matmul backward == native scan AD (incl. masked steps,
    both outputs, and the hidden-side bias grad)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.ops.gru import _gru_seq_bigmatmul, gru_seq_reference

    T, B, H, G3 = 6, 3, 4, 12
    rng = np.random.default_rng(2)
    gx = jnp.asarray(rng.standard_normal((T, B, G3)), jnp.float32)
    wh = jnp.asarray(rng.standard_normal((H, G3)) * 0.3, jnp.float32)
    bh = jnp.asarray(rng.standard_normal(G3) * 0.1, jnp.float32)
    lengths = np.asarray([T, 3, 5])
    mask = jnp.asarray(
        (np.arange(T)[:, None] < lengths[None]).astype(np.float32)[..., None]
    )

    def loss(fn, gx, wh, bh):
        h_last, seq = fn(gx, mask, wh, bh)
        return (h_last * jnp.arange(1, H + 1)).sum() + (seq**2).sum() * 0.5

    ref = jax.value_and_grad(
        lambda a, w, b: loss(gru_seq_reference, a, w, b), argnums=(0, 1, 2)
    )(gx, wh, bh)
    got = jax.value_and_grad(
        lambda a, w, b: loss(_gru_seq_bigmatmul, a, w, b), argnums=(0, 1, 2)
    )(gx, wh, bh)

    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-6)
    for g_got, g_ref in zip(got[1], ref[1]):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)


def test_eval_graph_has_no_custom_vjp_barrier():
    """Regression guard for the fusion-barrier trap (perf ledger): the eval
    forward must contain NO custom_vjp wrapper (costs ~15% eval when it
    sneaks into the XLA dispatch path); the train forward SHOULD contain the
    big-matmul recurrence vjp (the default engine.rnn_bwd)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.config import ModelOptions
    from vqa_tpu.models import factory

    opt = ModelOptions(
        arch="MutanAtt",
        seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 10},
        attention={"nb_glimpses": 2, "dim_hq": 6, "dim_hv": 6, "dim_mm": 8, "R": 2},
        fusion={"arch": "mutan", "dim_hq": 6, "dim_hv": 6, "dim_mm": 8, "R": 2},
    )
    model = factory(opt, 17, 9)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((2, 4, 12)), jnp.float32)
    q = jnp.asarray(rng.integers(1, 17, (2, 5)), jnp.int32)
    lengths = jnp.full((2,), 5, jnp.int32)
    params = model.init(jax.random.key(0), v, q, lengths)

    def prims(train):
        kwargs = {"rngs": {"dropout": jax.random.key(1)}} if train else {}
        jaxpr = jax.make_jaxpr(
            lambda p: model.apply(p, v, q, lengths, train=train, **kwargs)
        )(params)
        names = set()

        def walk(jx):
            for eqn in jx.eqns:
                names.add(eqn.primitive.name)
                for sub in jax.core.jaxprs_in_params(eqn.params):
                    walk(sub)
        walk(jaxpr.jaxpr)
        return names

    assert not any("custom_vjp" in n for n in prims(train=False))
    assert any("custom_vjp" in n for n in prims(train=True))


def test_gru_bigmatmul_bwd_mixed_dtype_cotangents():
    """bf16 compute with a raw f32 hidden bias (exactly what GRULayer passes
    on the bf16 path): cotangent dtypes must match the primals' — dbh stays
    f32 (an earlier draft rounded it to bf16) — and values track native AD
    at bf16 tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vqa_tpu.ops.gru import _gru_seq_bigmatmul, gru_seq_reference

    T, B, H, G3 = 5, 2, 4, 12
    rng = np.random.default_rng(3)
    gx = jnp.asarray(rng.standard_normal((T, B, G3)), jnp.bfloat16)
    wh = jnp.asarray(rng.standard_normal((H, G3)) * 0.3, jnp.bfloat16)
    bh = jnp.asarray(rng.standard_normal(G3) * 0.1, jnp.float32)
    mask = jnp.ones((T, B, 1), jnp.bfloat16)

    def loss(fn, gx, wh, bh):
        h_last, seq = fn(gx, mask, wh, bh)
        return (h_last.astype(jnp.float32) ** 2).sum() + (
            seq.astype(jnp.float32) ** 2
        ).sum()

    ref = jax.grad(lambda *a: loss(gru_seq_reference, *a), argnums=(0, 1, 2))(gx, wh, bh)
    got = jax.grad(lambda *a: loss(_gru_seq_bigmatmul, *a), argnums=(0, 1, 2))(gx, wh, bh)
    for g_got, g_ref, primal in zip(got, ref, (gx, wh, bh)):
        assert g_got.dtype == primal.dtype == g_ref.dtype
        np.testing.assert_allclose(
            np.asarray(g_got, np.float32), np.asarray(g_ref, np.float32),
            rtol=0.1, atol=0.05,
        )
