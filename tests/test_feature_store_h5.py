"""FeatureStore h5-streaming mode (SURVEY.md C6 low-memory path)."""

import numpy as np

from vqa_tpu.datasets.features import FeatureStore, write_features


def test_h5_mode_handles_duplicates_and_matches_ram(tmp_path):
    names = [f"img_{i}" for i in range(10)]
    feats = np.random.default_rng(0).standard_normal((10, 4, 8)).astype(np.float32)
    write_features(str(tmp_path), "bottomup36", "att", names, feats)

    ram = FeatureStore(str(tmp_path), "bottomup36", "att", cache="ram")
    h5 = FeatureStore(str(tmp_path), "bottomup36", "att", cache="h5")
    # duplicates + unsorted — the batch pattern when questions share images
    idx = np.asarray([7, 2, 2, 9, 0, 7], np.int32)
    np.testing.assert_array_equal(ram.get(idx), h5.get(idx))
    np.testing.assert_array_equal(h5.get(idx)[1], feats[2])
    assert h5.feature_shape == (4, 8)
    h5.close()
