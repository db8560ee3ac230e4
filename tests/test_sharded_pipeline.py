"""Per-host input sharding + bf16 step (SURVEY.md sections 2.3/5.8)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqa_tpu.config import load_options
from vqa_tpu.datasets import factory
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.datasets.pipeline import BatchIterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def val_set(tmp_path_factory):
    d = tmp_path_factory.mktemp("shardfix")
    generate(str(d), n_images=8, n_questions=50, seed=3)
    opt = load_options(
        os.path.join(REPO, "options/vqa2/concat_att.yaml"),
        overrides=[f"vqa.dir={d}/vqa2", f"coco.dir={d}/coco", "vqa.nans=20"],
    )
    return factory("val", opt)


def test_shards_are_disjoint_and_cover(val_set):
    qids = []
    for i in range(3):
        it = BatchIterator(
            val_set, batch_size=8, shuffle=True, seed=4,
            shard_index=i, shard_count=3, pad_last=True,
        )
        for b in it.epoch(2):
            qids.append(b["question_id"][b["valid"]])
    allq = np.concatenate(qids)
    assert len(allq) == 50
    assert len(set(allq.tolist())) == 50


def test_shard_sizes_balanced(val_set):
    sizes = []
    for i in range(3):
        it = BatchIterator(val_set, 8, shard_index=i, shard_count=3, pad_last=True)
        sizes.append(sum(int(b["valid"].sum()) for b in it.epoch(0)))
    assert sum(sizes) == 50 and max(sizes) - min(sizes) <= 1


def test_bad_shard_index_rejected(val_set):
    with pytest.raises(ValueError):
        BatchIterator(val_set, 8, shard_index=3, shard_count=3)


def test_shard_even_equalizes_step_counts(val_set):
    """shard_even: every shard yields exactly floor(N/count) rows -> the same
    batch count on every host (SPMD requirement, parallel/distributed.py);
    50 examples / 3 shards / batch 8 -> 16 rows, 2 full batches each."""
    counts, rows = [], []
    for i in range(3):
        it = BatchIterator(
            val_set, 8, shuffle=True, seed=4, drop_last=True,
            shard_index=i, shard_count=3, shard_even=True,
        )
        assert it.steps_per_epoch() == 2
        batches = list(it.epoch(1))
        counts.append(len(batches))
        rows.extend(b["question_id"].tolist() for b in batches)
    assert counts == [2, 2, 2]
    flat = [q for batch in rows for q in batch]
    assert len(flat) == len(set(flat)) == 48  # disjoint; 50-3*16=2 never drawn


def test_bf16_train_step_learns():
    from vqa_tpu.config import ModelOptions, OptimOptions
    from vqa_tpu.engine.optim import criterion_factory, factory as optim_factory
    from vqa_tpu.engine.steps import create_state, make_train_step
    from vqa_tpu.models import factory as model_factory

    model = model_factory(
        ModelOptions(
            arch="MutanAtt",
            seq2vec={"arch": "lstm", "emb_size": 8, "hidden_size": 12},
            attention={"nb_glimpses": 2, "dim_hq": 6, "dim_hv": 6, "dim_mm": 8, "R": 2},
            fusion={"arch": "mutan", "dim_hq": 6, "dim_hv": 6, "dim_mm": 8, "R": 2},
        ),
        19, 7, dtype="bfloat16",
    )
    rng = np.random.default_rng(0)
    batch = {
        "visual": jnp.asarray(rng.standard_normal((8, 5, 12)), jnp.bfloat16),
        "question": jnp.asarray(rng.integers(1, 19, (8, 6)), jnp.int32),
        "length": jnp.full((8,), 6, jnp.int32),
        "answer": jnp.asarray(rng.integers(0, 7, (8,)), jnp.int32),
    }
    params = model.init(
        jax.random.key(0), batch["visual"], batch["question"], batch["length"]
    )["params"]
    state = create_state(model, params, optim_factory(OptimOptions(lr=0.02), 1))
    step = make_train_step(criterion_factory(), donate=False)
    key = jax.random.key(0)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
