"""Bottom-up TSV -> FeatureStore conversion (SURVEY.md 3.5)."""

import base64
import os

import numpy as np

from vqa_tpu.datasets.features import FeatureStore


def _write_tsv(path, rows):
    with open(path, "w") as f:
        for image_id, feats, boxes in rows:
            f.write(
                "\t".join(
                    [
                        str(image_id), "640", "480", str(feats.shape[0]),
                        base64.b64encode(boxes.tobytes()).decode(),
                        base64.b64encode(feats.tobytes()).decode(),
                    ]
                )
                + "\n"
            )


def test_tsv_roundtrip(tmp_path):
    from tools.convert_butd_tsv import main

    rng = np.random.default_rng(0)
    rows = [
        (42, rng.standard_normal((36, 64)).astype(np.float32),
         rng.standard_normal((36, 4)).astype(np.float32)),
        (7, rng.standard_normal((36, 64)).astype(np.float32),
         rng.standard_normal((36, 4)).astype(np.float32)),
    ]
    tsv = os.path.join(str(tmp_path), "butd.tsv")
    _write_tsv(tsv, rows)
    out = os.path.join(str(tmp_path), "coco")
    assert main(["--tsv", tsv, "--dir_out", out, "--coco_split", "auto", "--boxes"]) == 0

    store = FeatureStore(out, "bottomup36", "att")
    # auto mode aliases both coco split names to the same features
    idx = store.index_of(
        ["COCO_train2014_000000000042", "COCO_val2014_000000000042"]
    )
    got = store.get(idx)
    np.testing.assert_array_equal(got[0], rows[0][1])
    np.testing.assert_array_equal(got[1], rows[0][1])
    # noatt companion pools regions
    noatt = FeatureStore(out, "bottomup36", "noatt")
    np.testing.assert_allclose(
        noatt.get(noatt.index_of(["COCO_train2014_000000000007"]))[0],
        rows[1][1].mean(axis=0),
        rtol=1e-6,
    )
