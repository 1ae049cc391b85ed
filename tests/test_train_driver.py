"""Driver-level A/B of the pipelined training loop (train.py).

The train loop dispatches step k+1 before fetching step k's loss so the
per-step host sync (a 3-29 ms relay round-trip on the tunneled TPU) hides
under device compute. This must not change a single emitted line: the
real-TPU ABBA A/B (benchmarks/train_loop_ab.py, results in
docs/evidence/TRAIN_PIPELINE_r03.json) holds the wall-clock evidence; this
test pins output equality in CI by running the ACTUAL train.py main()
twice on a tiny synthetic tree.

Reference contract: the ``===> Epoch[e](i/n): Loss: ...`` stdout/log lines
of /root/reference/train.py:214-216.
"""
import os
import sys

import cv2
import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_tree(root, frames=5):
    rng = np.random.default_rng(3)
    H, W = 120, 160
    for seq in ["Bootstrapping/seqA", "Shadows/seqB"]:
        for sub in ["input", "depth", "groundtruth"]:
            os.makedirs(os.path.join(root, seq, sub), exist_ok=True)
        roi = np.zeros((H, W), np.uint8)
        roi[10:110, 15:145] = 255
        cv2.imwrite(os.path.join(root, seq, "ROI.bmp"), roi)
        for i in range(1, frames + 1):
            fid = f"{i:06d}"
            cv2.imwrite(os.path.join(root, seq, "input", f"in{fid}.png"),
                        rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(root, seq, "depth", f"d{fid}.png"),
                        rng.integers(0, 255, (H, W), dtype=np.uint8))
            gt = np.zeros((H, W), np.uint8)
            gt[30:80, 50:120] = 255
            cv2.imwrite(os.path.join(root, seq, "groundtruth", f"gt{fid}.png"), gt)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train_driver_tree"))
    _build_tree(root)
    return root


def _run_driver(tree, workdir, monkeypatch, pipeline_flag):
    """Run train.py main() in-process with a tiny trunk and return
    (stdout Epoch lines, log-file Epoch lines)."""
    import cosnet_tpu.models as models
    from cosnet_tpu.nn.raa import RGBDSegmentationRAA
    from cosnet_tpu.nn.resnet import Bottleneck

    def tiny(full_name, **kw):
        assert full_name == "resnet_aspp_add"
        kw.pop("remat", None)
        return RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1],
                                   num_blocks_depth=[1, 1, 1, 1],
                                   coattention_backend=kw.get("coattention_backend", "einsum"),
                                   dtype=kw.get("dtype", np.float32))

    with open(os.path.join(REPO, "config.yaml")) as f:
        config = yaml.safe_load(f)
    t = config["train"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["batch_size"] = 2
    t["max_epoches"] = 2
    t["output_HW"] = "32,48"
    t["subset"] = None
    t["checkpoint_file"] = False

    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)

    monkeypatch.setattr(models, "create_model", tiny)
    monkeypatch.chdir(workdir)
    monkeypatch.setenv("COSNET_TRAIN_PIPELINE", pipeline_flag)
    monkeypatch.setenv("COSNET_JAX_CACHE", "off")  # no CPU entries in .jax_cache
    monkeypatch.setattr(sys, "argv", [
        "train.py", "--dataset", "sbmrgbd", "--model", "raa",
        "--gpus", "0,1", "--random-seed", "7",
    ])

    # Import the REPO's train.py by explicit path: golden-parity tests put
    # /root/reference first on sys.path, where a same-named train.py would
    # shadow `import train` (and its import-time yaml.load crashes).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cosnet_repo_train_driver", os.path.join(REPO, "train.py"))
    train_driver = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_driver)
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        train_driver.main()
    stdout_lines = [l for l in buf.getvalue().splitlines() if l.startswith("===> Epoch")]

    logs = []
    for dp, _, fs in os.walk(os.path.join(workdir, "snapshots")):
        logs += [os.path.join(dp, f) for f in fs if f.endswith("train_log.txt")]
    assert len(logs) == 1
    log_lines = [l for l in open(logs[0]) if "Epoch[" in l]
    return stdout_lines, log_lines


def test_pipelined_train_loop_matches_serial(tree, tmp_path, monkeypatch):
    out = {}
    for flag in ("0", "1"):
        with monkeypatch.context() as m:
            out[flag] = _run_driver(tree, str(tmp_path / flag), m, flag)
    serial_stdout, serial_log = out["0"]
    pipe_stdout, pipe_log = out["1"]
    # subset_percentage 0.8 keeps 4 of 5 frames/seq for training
    # (reference _split_dataset, sbm_rgbd_loader.py:470-518):
    # 2 epochs x (2 seqs x 4 frames // batch 2) = 8 steps
    assert len(serial_stdout) == 8
    assert serial_stdout == pipe_stdout    # loss/lr sequence byte-identical
    assert serial_log == pipe_log          # log-file Epoch lines too
