"""Multi-device training evidence (SURVEY.md section 2.3/5.8; VERDICT r1 item 8).

- K-step data-parallel training on 8 virtual devices matches single-device
  numerics within float tolerance (XLA's psum gradient reduction is exact up
  to reduction order).
- Checkpoint save -> restore -> continue round-trips across sharding layouts
  (trained under DP, resumed under TP) with no numeric drift vs an
  uninterrupted run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.config import ModelOptions, OptimOptions
from vqa_tpu.engine.checkpoint import CheckpointManager
from vqa_tpu.engine.optim import criterion_factory, factory as optim_factory
from vqa_tpu.engine.steps import create_state, make_train_step
from vqa_tpu.models import factory
from vqa_tpu.parallel import batch_sharding, make_mesh, replicated, shard_state_tp

B, R, DV, T, VOCAB, NANS = 16, 5, 16, 6, 31, 11
K_STEPS = 4


def _setup():
    model = factory(
        ModelOptions(
            arch="MLBAtt",
            seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 16},
            attention={"nb_glimpses": 2, "dim_h": 16},
            fusion={"arch": "mlb", "dim_h": 16},
        ),
        VOCAB, NANS,
    )
    rng = np.random.default_rng(3)
    batches = [
        {
            "visual": jnp.asarray(rng.standard_normal((B, R, DV)), jnp.float32),
            "question": jnp.asarray(rng.integers(1, VOCAB, (B, T)), jnp.int32),
            "length": jnp.full((B,), T, jnp.int32),
            "answer": jnp.asarray(rng.integers(0, NANS, (B,)), jnp.int32),
        }
        for _ in range(K_STEPS)
    ]
    params = model.init(
        jax.random.key(0), batches[0]["visual"], batches[0]["question"],
        batches[0]["length"],
    )["params"]
    # sgd: cross-layout float noise stays proportional (see test_tensor_parallel)
    tx = optim_factory(OptimOptions(lr=0.1, optimizer="sgd", momentum=0.0), 1)
    return create_state(model, params, tx), batches


def _run(state, batches, mesh, place):
    step = make_train_step(criterion_factory(), donate=False)
    rng = jax.random.key(7)
    state = place(state)
    losses = []
    for batch in batches:
        state, metrics = step(state, jax.device_put(batch, batch_sharding(mesh)), rng)
        losses.append(float(metrics["loss"]))
    return state, losses


def test_dp8_k_steps_matches_single_device():
    state, batches = _setup()
    mesh1 = make_mesh(jax.devices()[:1])
    mesh8 = make_mesh(jax.devices()[:8])
    final1, losses1 = _run(state, batches, mesh1, lambda s: jax.device_put(s, replicated(mesh1)))
    final8, losses8 = _run(state, batches, mesh8, lambda s: jax.device_put(s, replicated(mesh8)))
    np.testing.assert_allclose(losses1, losses8, rtol=1e-5)
    for x, y in zip(
        jax.tree.leaves(jax.device_get(final1.params)),
        jax.tree.leaves(jax.device_get(final8.params)),
    ):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-5)


def test_sharded_feature_table_matches_replicated():
    """engine.features_sharded: the table row-sharded over all 8 devices
    (uneven rows padded) gives the same numbers as the replicated table —
    XLA partitions the in-step gather with collectives."""
    from vqa_tpu.engine.steps import make_eval_step
    from vqa_tpu.parallel.mesh import shard_feature_table

    state, batches = _setup()
    mesh = make_mesh(jax.devices()[:8])
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(5)
    n_images = 11  # deliberately not divisible by 8 -> padded rows
    table = rng.standard_normal((n_images, R, DV)).astype(np.float32)
    idx = rng.integers(0, n_images, B).astype(np.int32)

    batch = dict(batches[0])
    del batch["visual"]
    batch["image_index"] = jnp.asarray(idx)
    batch = jax.device_put(batch, batch_sharding(mesh))

    rep = make_eval_step()(state, batch, jax.device_put(jnp.asarray(table), replicated(mesh)))
    shd = make_eval_step(sharded_features=True)(
        state, batch, shard_feature_table(table, mesh)
    )
    np.testing.assert_array_equal(np.asarray(rep["pred"]), np.asarray(shd["pred"]))
    assert int(rep["correct1"]) == int(shd["correct1"])


def test_put_table_row_major_layout_and_values():
    """mesh.put_replicated_table pins the canonical row-major layout (the
    PJRT default for [N,R,D] is (1,0,2), which costs a full-table in-program
    relayout copy per step — OOM at trainval scale, see mesh.table_format)
    and is value-identical to a plain device_put through the eval step."""
    from vqa_tpu.engine.steps import make_eval_step
    from vqa_tpu.parallel.mesh import put_replicated_table

    state, batches = _setup()
    mesh = make_mesh(jax.devices()[:8])
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(7)
    table = rng.standard_normal((11, R, DV)).astype(np.float32)
    idx = rng.integers(0, 11, B).astype(np.int32)

    batch = dict(batches[0])
    del batch["visual"]
    batch["image_index"] = jnp.asarray(idx)
    batch = jax.device_put(batch, batch_sharding(mesh))

    canon = put_replicated_table(table, mesh)
    assert canon.format.layout.major_to_minor == (0, 1, 2)
    ref = make_eval_step()(state, batch, jax.device_put(jnp.asarray(table), replicated(mesh)))
    out = make_eval_step()(state, batch, canon)
    np.testing.assert_array_equal(np.asarray(ref["pred"]), np.asarray(out["pred"]))


def test_put_table_streaming_fallback_matches_direct():
    """Tables above mesh._STREAM_PUT_BYTES stream through the donated
    dynamic_update_slice path (device_put SILENTLY drops a custom Format
    above ~4.4-9.1GB on the TPU image — the r4s17 root cause of the
    trainval-scale int8 OOM). Forced small here: the streamed result must be
    bit-identical to a direct put, row-major, and correct through eval."""
    from vqa_tpu import parallel
    from vqa_tpu.engine.steps import make_eval_step
    from vqa_tpu.parallel import mesh as mesh_mod

    state, batches = _setup()
    mesh = make_mesh(jax.devices()[:8])
    state = jax.device_put(state, replicated(mesh))
    rng = np.random.default_rng(11)
    table = rng.standard_normal((11, R, DV)).astype(np.float32)
    idx = rng.integers(0, 11, B).astype(np.int32)

    batch = dict(batches[0])
    del batch["visual"]
    batch["image_index"] = jnp.asarray(idx)
    batch = jax.device_put(batch, batch_sharding(mesh))

    direct = mesh_mod.put_replicated_table(table, mesh)
    old = mesh_mod._STREAM_PUT_BYTES
    mesh_mod._STREAM_PUT_BYTES = 1  # force streaming for any real table
    try:
        streamed = mesh_mod.put_replicated_table(table, mesh)
    finally:
        mesh_mod._STREAM_PUT_BYTES = old
    assert streamed.format.layout.major_to_minor == (0, 1, 2)
    np.testing.assert_array_equal(np.asarray(streamed), np.asarray(direct))

    ref = make_eval_step()(state, batch, direct)
    out = make_eval_step()(state, batch, streamed)
    np.testing.assert_array_equal(np.asarray(ref["pred"]), np.asarray(out["pred"]))

    # multi-slab path: chunk smaller than the table forces >1 donated update
    fmt = mesh_mod.table_format(replicated(mesh), 3)
    multi = mesh_mod._streamed_put(table, fmt, chunk_bytes=table.nbytes // 3)
    np.testing.assert_array_equal(np.asarray(multi), np.asarray(direct))


def test_checkpoint_roundtrip_across_layouts(tmp_path):
    """Train 2 steps under 8-way DP, checkpoint, restore, continue 2 steps
    under a 4x2 TP layout — final params match the uninterrupted DP run."""
    state, batches = _setup()
    mesh_dp = make_mesh(jax.devices()[:8])
    place_dp = lambda s: jax.device_put(s, replicated(mesh_dp))

    # uninterrupted reference run
    ref_final, _ = _run(state, batches, mesh_dp, place_dp)

    # interrupted: 2 steps DP -> save -> restore -> 2 steps TP
    half, _ = _run(state, batches[:2], mesh_dp, place_dp)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(jax.device_get(half), epoch=0, acc=0.1)
    restored, epoch = ckpt.restore(jax.device_get(half), "best")
    assert epoch == 0
    mesh_tp = make_mesh(jax.devices()[:8], model_parallel=2)
    resumed, _ = _run(
        restored, batches[2:], mesh_tp, lambda s: shard_state_tp(s, mesh_tp, min_size=64)
    )

    assert int(resumed.step) == int(ref_final.step)
    for x, y in zip(
        jax.tree.leaves(jax.device_get(ref_final.params)),
        jax.tree.leaves(jax.device_get(resumed.params)),
    ):
        np.testing.assert_allclose(x, y, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("n_devices,tp", [(8, 2), (16, 4), (32, 4)])
def test_dryrun_multichip_mesh_sizes(n_devices, tp):
    """The driver's dryrun contract at 8/16/32 virtual devices with real
    tp shardings (VERDICT r3 item 6: make the '16/32-device spot-checks'
    claim reproducible evidence). Subprocess: jax_num_cpu_devices is fixed
    at backend init, so each mesh size needs a fresh process."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_devices}"
        # starved-host rendezvous abort protection (see tests/conftest.py)
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200"
    )
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; "
         f"g.dryrun_multichip({n_devices}, model_parallel={tp})"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert f"dryrun_multichip({n_devices}, tp={tp}): ok" in proc.stdout
