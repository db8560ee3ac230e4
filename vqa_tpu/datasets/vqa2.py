"""VQA v2 dataset: processed arrays joined with the feature store (SURVEY.md C5).

A dataset here is columnar (dense numpy arrays), not per-item: batches are
assembled by fancy-indexing, which keeps the host side fast enough to feed the
TPU (SURVEY.md section 7 bottleneck note). A Grain adapter is provided for
users who want the map-style per-item view.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vqa_tpu.config import VQAOptions
from vqa_tpu.datasets.features import FeatureStore
from vqa_tpu.datasets.processed import ProcessedSplit, Vocabs


class VQA2Dataset:
    def __init__(
        self,
        split: ProcessedSplit,
        vocabs: Vocabs,
        features: FeatureStore,
        opt: VQAOptions,
        name: str,
        sampling: bool = False,
        visual_mode: str = "gather",
    ):
        if visual_mode not in ("gather", "index"):
            raise ValueError(f"visual_mode must be 'gather' or 'index', got {visual_mode!r}")
        self.split = split
        self.vocabs = vocabs
        self.features = features
        self.opt = opt
        self.name = name
        self.sampling = sampling and split.answer_pool is not None
        self.visual_mode = visual_mode
        self.image_index = features.index_of(split.image_names.tolist())

    def __len__(self) -> int:
        return len(self.split)

    @property
    def num_words(self) -> int:
        return self.vocabs.num_words

    @property
    def num_answers(self) -> int:
        return self.vocabs.num_answers

    @property
    def feature_shape(self) -> tuple:
        return self.features.feature_shape

    def batch(
        self, indices: np.ndarray, rng: Optional[np.random.Generator] = None
    ) -> Dict[str, np.ndarray]:
        """Assemble one batch: {visual, question, length, answer?, question_id}.

        With ``sampling`` (train-time ``samplingans`` [K]), the label is drawn
        uniformly from the 10 annotator answers that are in-vocab — equivalent
        to count-weighted sampling over distinct answers — falling back to the
        consensus answer when none are.
        """
        out: Dict[str, np.ndarray] = {
            "question": self.split.questions[indices],
            "length": self.split.lengths[indices],
            "question_id": self.split.question_ids[indices],
        }
        if self.visual_mode == "index":
            # HBM-resident feature mode: ship indices, gather on device
            out["image_index"] = self.image_index[indices]
        else:
            out["visual"] = self.features.get(self.image_index[indices])
        if self.split.answers is not None:
            answers = self.split.answers[indices]
            if self.sampling and rng is not None:
                pool = self.split.answer_pool[indices]          # [B, 10]
                valid = pool >= 0                                # [B, 10]
                n_valid = valid.sum(axis=1)
                # uniform pick over valid slots per row
                pick = (rng.random(len(indices)) * np.maximum(n_valid, 1)).astype(np.int64)
                # index of the pick-th valid slot
                order = np.cumsum(valid, axis=1) - 1             # rank of each slot
                slot = np.argmax(order == pick[:, None], axis=1)
                sampled = pool[np.arange(len(indices)), slot]
                answers = np.where(n_valid > 0, sampled, answers)
            out["answer"] = answers
        return out


class GrainVQA2Source:
    """grain.RandomAccessDataSource view (per-item) over VQA2Dataset.

    Label sampling (``samplingans``) stays active and deterministic: each
    item draws from an rng keyed by (label_seed, epoch, idx), so workers
    agree regardless of sharding/process count. Grain sources don't see the
    epoch number themselves, so per-epoch label resampling (the reference's
    exact semantics) works by building one
    ``grain_loader(..., epoch=e, num_epochs=1)`` per epoch — that re-keys
    BOTH the shuffle order and the label draws. (Mutating a source after a
    worker-backed loader is built would not reach the pickled worker copies,
    so there is deliberately no set_epoch.) epoch=0 reproduces the round-1
    fixed-draw default.
    """

    def __init__(self, dataset: VQA2Dataset, label_seed: int = 0, epoch: int = 0):
        self._ds = dataset
        self._label_seed = label_seed
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx):
        rng = (
            np.random.default_rng(
                np.random.SeedSequence([self._label_seed, self._epoch, int(idx)])
            )
            if self._ds.sampling
            else None
        )
        batch = self._ds.batch(np.asarray([idx]), rng=rng)
        return {k: v[0] for k, v in batch.items()}


def grain_loader(
    dataset: VQA2Dataset,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    worker_count: int = 0,
    epoch: int = 0,
):
    """Grain DataLoader over the per-item source (SURVEY.md C7 equivalent).

    The columnar BatchIterator is the default (faster for RAM-resident
    arrays); this is the multiprocess-worker path for datasets that do real
    per-item IO (h5-streaming FeatureStore, future decode-heavy sources).
    Deterministic: order is a pure function of (seed, epoch) like the
    reference's seeded DataLoader. For the reference's per-epoch answer
    resampling, build one loader per epoch with ``epoch=e, num_epochs=1`` —
    both the shuffle order and the label draws re-key on the epoch.
    """
    import grain.python as grain

    # key the sampler by (seed, epoch) without collisions: seed+epoch would
    # alias (3, 1) with (4, 0) — same trap pipeline.epoch_order avoids
    sampler_seed = int(
        np.random.SeedSequence([seed, epoch]).generate_state(1)[0] & 0x7FFFFFFF
    )
    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.NoSharding(),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=sampler_seed,
    )
    return grain.DataLoader(
        data_source=GrainVQA2Source(dataset, label_seed=seed, epoch=epoch),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=False)],
        worker_count=worker_count,
    )
