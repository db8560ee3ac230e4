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


def test_extract_cli_loads_params_npz(tmp_path):
    """--params: a flattened 'a/b/c' -> array npz restores the variable tree
    (the documented hook for ImageNet weights when they become available)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from flax.traverse_util import flatten_dict

    from vqa_tpu.models import convnets

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
        img_dir / "COCO_val2014_000000000001.jpg"
    )
    # dump a (random but fixed) param tree in the documented npz layout
    model = convnets.factory("resnet50")
    variables = model.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3), jnp.float32))
    flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(variables).items()}
    params_path = tmp_path / "resnet50.npz"
    np.savez(params_path, **flat)

    out_a = tmp_path / "coco_a"
    out_b = tmp_path / "coco_b"
    for out in (out_a, out_b):
        rc = extract_main([
            "--dir_images", str(img_dir), "--dir_out", str(out),
            "--arch", "resnet50", "--mode", "noatt", "--batch", "1",
            "--size", "64", "--params", str(params_path), "--seed", "9",
        ])
        assert rc == 0
    fa = FeatureStore(str(out_a), "resnet50", "noatt", "ram").get(np.asarray([0]))
    fb = FeatureStore(str(out_b), "resnet50", "noatt", "ram").get(np.asarray([0]))
    # identical loaded weights -> identical features despite different seeds
    np.testing.assert_array_equal(fa, fb)


def test_bench_extract_smoke(capsys):
    """tools/bench_extract.py emits a well-formed JSON line with XLA
    cost-analysis FLOPs (the conv-path throughput artifact's producer)."""
    import json

    from tools.bench_extract import main as bench_main

    bench_main([
        "--arch", "resnet50", "--batch", "1", "--size", "32",
        "--steps", "1", "--dtype", "float32",
    ])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "grid_extract_throughput"
    assert rec["value"] > 0
    assert rec["flops_per_image"] > 0  # cost analysis found the convs
    assert rec["unit"] == "images/sec/chip"
