"""Fixture -> prep -> factory -> pipeline integration (SURVEY.md section 4)."""

import numpy as np
import pytest

from vqa_tpu.config import load_options
from vqa_tpu.datasets import factory
from vqa_tpu.datasets.fixtures import generate
from vqa_tpu.datasets.pipeline import BatchIterator, epoch_order


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("vqafix")
    generate(str(d), n_images=16, n_questions=64, seed=7)
    return str(d)


@pytest.fixture(scope="module")
def opt(fixture_dir):
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return load_options(
        os.path.join(repo, "options/vqa2/concat_att.yaml"),
        overrides=[
            f"vqa.dir={fixture_dir}/vqa2",
            f"coco.dir={fixture_dir}/coco",
            "vqa.nans=30",
        ],
    )


def test_factory_builds_and_reuses_prep(opt):
    train = factory("train", opt)
    val = factory("val", opt)
    test = factory("test", opt)
    assert len(train) > 0 and len(val) == 64 and len(test) == 64
    assert train.feature_shape == (36, 2048)
    assert train.num_answers <= 30 and train.num_words > 10
    # train rows whose consensus answer is OOV were dropped
    assert (train.split.answers >= 0).all()


def test_batch_contents(opt):
    val = factory("val", opt)
    batch = val.batch(np.arange(8))
    assert batch["visual"].shape == (8, 36, 2048)
    assert batch["question"].shape == (8, 26)
    assert batch["answer"].shape == (8,)
    assert batch["question_id"].shape == (8,)
    # same indices -> identical batch (determinism)
    again = val.batch(np.arange(8))
    np.testing.assert_array_equal(batch["visual"], again["visual"])


def test_sampling_answers_only_from_pool(opt):
    train = factory("train", opt)
    assert train.sampling
    rng = np.random.default_rng(0)
    idx = np.arange(min(32, len(train)))
    batch = train.batch(idx, rng=rng)
    pool = train.split.answer_pool[idx]
    for row_ans, row_pool, consensus in zip(
        batch["answer"], pool, train.split.answers[idx]
    ):
        assert row_ans in row_pool[row_pool >= 0] or row_ans == consensus


def test_epoch_order_deterministic():
    a = epoch_order(100, seed=3, epoch=5, shuffle=True)
    b = epoch_order(100, seed=3, epoch=5, shuffle=True)
    c = epoch_order(100, seed=3, epoch=6, shuffle=True)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(100))


def test_batch_iterator_epoch(opt):
    val = factory("val", opt)
    it = BatchIterator(val, batch_size=10, shuffle=True, seed=1, pad_last=True)
    batches = list(it.epoch(0))
    assert len(batches) == it.steps_per_epoch() == 7
    assert all(b["question"].shape == (10, 26) for b in batches)
    # padded tail is masked
    assert batches[-1]["valid"].sum() == 64 - 6 * 10
    # all question ids covered exactly once among valid rows
    qids = np.concatenate([b["question_id"][b["valid"]] for b in batches])
    assert len(set(qids.tolist())) == 64


def test_bucketed_shuffle_covers_and_shortens(opt):
    """Train-time bucketed shuffling (engine.train_bucketing): every example
    exactly once, batches length-homogeneous + truncated, order deterministic
    per (seed, epoch) and different across epochs."""
    train = factory("train", opt)
    kw = dict(
        batch_size=8, shuffle=True, seed=4, drop_last=True,
        bucket_window=2, length_buckets=(13, 26),
    )
    it = BatchIterator(train, **kw)
    batches = list(it.epoch(0))
    n_full = len(train) // 8
    assert len(batches) == n_full
    qids = np.concatenate([b["question_id"] for b in batches])
    assert len(set(qids.tolist())) == len(qids)  # no example twice
    # fixture questions are short: sorting inside windows must truncate most
    # batches to the 13-bucket
    widths = {b["question"].shape[1] for b in batches}
    assert 13 in widths and widths <= {13, 26}
    for b in batches:  # truncation never cuts real tokens
        assert int(b["length"].max()) <= b["question"].shape[1]
    # determinism + epoch variation
    again = [b["question_id"] for b in BatchIterator(train, **kw).epoch(0)]
    np.testing.assert_array_equal(qids, np.concatenate(again))
    other = np.concatenate(
        [b["question_id"] for b in BatchIterator(train, **kw).epoch(1)]
    )
    assert not np.array_equal(qids, other)


def test_bucketed_shuffle_drop_last_is_uniform(opt):
    """code-review r2: with drop_last the dropped tail must be a uniform
    random subset (pre-sort), never systematically the longest questions."""
    train = factory("train", opt)
    n, bs = len(train), 8
    if n % bs == 0:
        bs = 7  # force a partial batch
    kw = dict(batch_size=bs, shuffle=True, seed=11, drop_last=True,
              bucket_window=2, length_buckets=(13, 26))
    dropped_lengths = []
    for epoch in range(6):
        seen = set()
        for b in BatchIterator(train, **kw).epoch(epoch):
            seen.update(b["question_id"].tolist())
        dropped = [i for i in range(n) if int(train.split.question_ids[i]) not in seen]
        dropped_lengths.extend(int(train.split.lengths[i]) for i in dropped)
    # if the longest-of-window were always dropped, the dropped mean would
    # sit near the max; uniform dropping keeps it near the dataset mean
    mean_all = float(np.mean(train.split.lengths))
    assert abs(float(np.mean(dropped_lengths)) - mean_all) < 2.0, (
        np.mean(dropped_lengths), mean_all)


def test_normalize_buckets_validation():
    from vqa_tpu.datasets.pipeline import normalize_buckets

    assert normalize_buckets((7, 13), 26) == (7, 13, 26)
    assert normalize_buckets((7, 30), 26) == (7, 26)   # oversized dropped
    assert normalize_buckets((26,), 26) == (26,)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        normalize_buckets((13, 7), 26)
    with _pytest.raises(ValueError):
        normalize_buckets((0, 7), 26)


def test_batch_iterator_transform_and_threading(opt):
    val = factory("val", opt)
    it = BatchIterator(
        val, batch_size=16, transform=lambda b: b["question"].sum(), prefetch=2
    )
    sums = list(it.epoch(0))
    assert len(sums) == 4
