"""DAVIS + saliency dataset loaders on synthetic trees."""
import os

import cv2
import numpy as np
import pytest

from cosnet_tpu.data.davis import DavisDataset
from cosnet_tpu.data.saliency import SaliencyDataset


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("davis"))
    rng = np.random.default_rng(0)
    H, W = 120, 214
    for seq in ["bear", "bmx-bumps"]:
        os.makedirs(os.path.join(root, "JPEGImages", "480p", seq), exist_ok=True)
        os.makedirs(os.path.join(root, "Annotations", "480p", seq), exist_ok=True)
        for i in range(3):
            cv2.imwrite(os.path.join(root, "JPEGImages", "480p", seq, f"{i:05d}.jpg"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            gt = np.zeros((H, W), np.uint8)
            gt[30:90, 50:150] = 255
            cv2.imwrite(os.path.join(root, "Annotations", "480p", seq, f"{i:05d}.png"), gt)
    with open(os.path.join(root, "train_seqs.txt"), "w") as f:
        f.write("bear\nbmx-bumps\n")
    return root


def test_davis_manifest_and_sample(davis_tree):
    ds = DavisDataset(davis_tree, sample_range=1, output_HW=(64, 112), for_training=False,
                      batch_size=1, subset_file=os.path.join(davis_tree, "train_seqs.txt"))
    assert len(ds.index.sequences) == 2 and len(ds.index) == 6
    s = ds[0]
    assert s["target"].shape == (64, 112, 3)
    assert s["target_gt"].shape == (64, 112)
    assert s["search_0"].shape == (64, 112, 3)
    assert set(np.unique(s["target_gt"])).issubset({0, 1})
    # rgb-only: depth channels are placeholder zeros (2-input models ignore them)
    assert s["target_depth"].shape == (1, 1, 1)


def test_davis_train_pairs_same_sequence(davis_tree):
    ds = DavisDataset(davis_tree, sample_range=1, output_HW=(64, 112), for_training=True, batch_size=2, seed=3)
    for i in range(len(ds)):
        s = ds[i]
        assert s["target"].shape == (64, 112, 3)  # static shapes under aug


def test_saliency_self_pair(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(1)
    os.makedirs(os.path.join(root, "DUTS-TR", "Imgs"), exist_ok=True)
    os.makedirs(os.path.join(root, "DUTS-TR", "Masks"), exist_ok=True)
    for i in range(3):
        cv2.imwrite(os.path.join(root, "DUTS-TR", "Imgs", f"im{i}.jpg"), rng.integers(0, 255, (60, 80, 3), dtype=np.uint8))
        m = np.zeros((60, 80), np.uint8)
        m[10:40, 20:60] = 255
        cv2.imwrite(os.path.join(root, "DUTS-TR", "Masks", f"im{i}.png"), m)
    ds = SaliencyDataset(root, {"DUTS-TR": {"images": "DUTS-TR/Imgs", "masks": "DUTS-TR/Masks"}},
                         output_HW=(48, 64), for_training=False, batch_size=1)
    assert len(ds) == 3
    s = ds[0]
    np.testing.assert_array_equal(s["target"], s["search_0"])  # self-pair
    np.testing.assert_array_equal(s["target_gt"], s["search_0_gt"])


def test_test_dataset_config_davis_rederived():
    """serve.py/test.py share cfg.test_dataset_config: the davis config block
    (path/subset_file keys, blank geometry) must parse into the reference's
    hardcoded 480x854 eval geometry instead of KeyError'ing (previously the
    re-derivation lived only in test.py and serve.py crashed on davis)."""
    from cosnet_tpu import config as cfg

    user_config = {"test": {"dataset": {
        "davis": {"model": "ori", "output_WH": "", "path": "/data/davis",
                  "subset_file": "/data/davis/val.txt"},
        "sbmrgbd": {"data_path": "/data/sbm", "sample_range": 2,
                    "image_HW_4_model": "240, 320", "output_WH": "320,240",
                    "subset": None},
    }}}
    ds_cfg, subset_file = cfg.test_dataset_config(user_config, "davis")
    assert ds_cfg.data_path == "/data/davis"
    assert ds_cfg.image_HW_4_model == (480, 854)
    assert ds_cfg.output_WH == (854, 480)
    assert ds_cfg.sample_range == 5 and ds_cfg.subset is None
    assert subset_file == "/data/davis/val.txt"
    ds_cfg, subset_file = cfg.test_dataset_config(user_config, "sbmrgbd")
    assert subset_file is None
    assert ds_cfg.sample_range == 2 and ds_cfg.image_HW_4_model == (240, 320)
