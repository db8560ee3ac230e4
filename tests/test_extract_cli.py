"""extract.py smoke test (SURVEY.md C15, call stack 3.5; VERDICT r1 weak
item 8): tiny images -> jitted ResNet -> HDF5 feature shards the FeatureStore
can read back."""

import numpy as np

from vqa_tpu.cli.extract import main as extract_main
from vqa_tpu.datasets.features import FeatureStore


def test_extract_cli_writes_readable_features(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = [f"COCO_val2014_{i:012d}" for i in range(3)]
    for name in names:
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"{name}.jpg")

    out_dir = tmp_path / "coco"
    rc = extract_main([
        "--dir_images", str(img_dir),
        "--dir_out", str(out_dir),
        "--arch", "resnet50",
        "--mode", "noatt",
        "--batch", "2",     # 3 images over batch 2 exercises the pad path
        "--size", "64",
    ])
    assert rc == 0

    store = FeatureStore(str(out_dir), "resnet50", "noatt", "ram")
    feats = store.get(store.index_of(names))
    assert feats.shape[0] == 3
    assert np.isfinite(feats).all()
    # distinct images must give distinct features (order preserved)
    assert not np.allclose(feats[0], feats[1])
