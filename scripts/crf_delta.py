#!/usr/bin/env python
"""Measure the dense-CRF refinement's effect with a TRAINED checkpoint.

On a fresh init the masks are ~0.5 noise and the CRF rightly collapses them
to empty (measured: sweep IoU 0.086 -> 0.0) — meaningless as a CRF
assessment. This harness reproduces the round-2 learning proof (train ~48
steps on the synthetic tree until eval IoU reaches ~0.7), then runs the
REAL ``test.py`` twice with the trained ``.pth`` — with and without
``--use_crf 1`` — and records the IoU/F delta as evidence
(docs/evidence/CRF_DELTA_r03.json). Reference CRF intent:
``/root/reference/test.py:38-39,76`` (pydensecrf import, commented out).

Usage: python scripts/crf_delta.py [--epochs 4]
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(REPO, "docs", "evidence")


def run(cmd, workdir, timeout=7200):
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                          text=True, timeout=timeout)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
        sys.exit(f"driver failed ({proc.returncode})")
    return proc


def base_config():
    with open(os.path.join(REPO, "config.yaml")) as f:
        return yaml.safe_load(f)


def eval_once(tree, pth, use_crf):
    config = base_config()
    t = config["test"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["subset"] = None
    config["test"]["model"]["resnet_aspp_add"]["pretrained_params"] = pth
    workdir = tempfile.mkdtemp(prefix=f"cosnet_crf{int(use_crf)}_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    cmd = [sys.executable, os.path.join(REPO, "test.py"), "--dataset", "sbmrgbd",
           "--model", "raa", "--batch_size", "8", "--dtype", "bfloat16",
           "--no-shuffle", "--save_seg_img", ""]
    if use_crf:
        cmd += ["--use_crf", "1"]
    out = run(cmd, workdir).stdout
    m = re.search(r"final IOU: ([\d.eE+-]+)\s+F: ([\d.eE+-]+)", out)
    assert m, out[-1500:]
    return float(m.group(1)), float(m.group(2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(EVIDENCE, "CRF_DELTA_r03.json"))
    args = ap.parse_args()

    tree = "/tmp/cosnet_bench_sbm"
    if not os.path.isdir(os.path.join(tree, "Bootstrapping")):
        sys.path.insert(0, REPO)
        from bench import _build_synthetic_tree

        os.makedirs(tree, exist_ok=True)
        _build_synthetic_tree(tree)

    # -- train ~12 steps/epoch at the round-2 production train config -------
    config = base_config()
    t = config["train"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["batch_size"] = 4
    t["max_epoches"] = args.epochs
    t["output_HW"] = "240,320"
    t["subset"] = None
    t["checkpoint_file"] = False
    workdir = tempfile.mkdtemp(prefix="cosnet_crf_train_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    run([sys.executable, os.path.join(REPO, "train.py"), "--dataset", "sbmrgbd",
         "--model", "raa", "--dtype", "bfloat16", "--random-seed", "7"], workdir)
    pths = sorted(glob.glob(os.path.join(
        workdir, "snapshots", "sbmrgbd", "resnet_aspp_add", "*", "*", "snapshot_*.pth")))
    assert pths, "training produced no .pth snapshot"
    pth = pths[-1]
    print("trained checkpoint:", pth)

    iou0, f0 = eval_once(tree, pth, use_crf=False)
    iou1, f1 = eval_once(tree, pth, use_crf=True)
    report = {
        "trained_epochs": args.epochs,
        "checkpoint": os.path.basename(pth),
        "iou_no_crf": iou0, "f_no_crf": f0,
        "iou_crf": iou1, "f_crf": f1,
        "delta_iou": iou1 - iou0, "delta_f": f1 - f0,
    }
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
