#!/usr/bin/env python
"""Numerics-fingerprint drives with a TRAINED checkpoint (VERDICT r3 #5).

Runs the REAL ``test.py`` on the synthetic tree once per mode — f32 host
path, bf16 host path, int8, --device-preprocess, --frame-pool,
--device-metrics — all loading the shared trained checkpoint
(scripts/train_synth_ckpt.py), and records each mode's final IoU/F plus its
delta vs the bf16 host path. With unsaturated masks the gates can move:
int8 is EXPECTED to drift by a small nonzero amount (dynamic symmetric
quantization), while device-preprocess/frame-pool/device-metrics must stay
bitwise at uint8 scale (they reorder transfers, not arithmetic;
device-metrics is integer-exact by construction, eval/metrics.py).

Reference semantics being fingerprinted: the soft-IoU/F of
``/root/reference/evaluation.py:3-21`` over the eval loop of
``/root/reference/test.py:278-344``.

Usage: python scripts/fingerprint_drives.py [--epochs 4]
Writes docs/evidence/FINGERPRINTS_r04.json.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(REPO, "docs", "evidence")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from train_synth_ckpt import ensure_checkpoint  # noqa: E402

MODES = {
    "f32_host": ["--dtype", "float32"],
    "bf16_host": ["--dtype", "bfloat16"],
    "int8": ["--dtype", "bfloat16", "--quantize", "int8"],
    "int8_static": ["--dtype", "bfloat16", "--quantize", "int8-static"],
    "device_preprocess": ["--dtype", "bfloat16", "--device-preprocess"],
    "frame_pool": ["--dtype", "bfloat16", "--device-preprocess",
                   "--frame-pool", "256"],
    "device_metrics": ["--dtype", "bfloat16", "--device-preprocess",
                       "--frame-pool", "256", "--device-metrics"],
}


def eval_mode(tree: str, pth: str, extra) -> tuple:
    with open(os.path.join(REPO, "config.yaml")) as f:
        config = yaml.safe_load(f)
    t = config["test"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["subset"] = None
    config["test"]["model"]["resnet_aspp_add"]["pretrained_params"] = pth
    workdir = tempfile.mkdtemp(prefix="cosnet_fp_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    cmd = [sys.executable, os.path.join(REPO, "test.py"), "--dataset", "sbmrgbd",
           "--model", "raa", "--batch_size", "8", "--no-shuffle",
           "--save_seg_img", ""] + list(extra)
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                          text=True, timeout=3600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
        sys.exit(f"test.py failed ({proc.returncode})")
    m = re.search(r"final IOU: ([\d.eE+-]+)\s+F: ([\d.eE+-]+)", proc.stdout)
    assert m, proc.stdout[-1500:]
    return float(m.group(1)), float(m.group(2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(EVIDENCE, "FINGERPRINTS_r04.json"))
    args = ap.parse_args()

    pth = ensure_checkpoint(args.epochs)
    print("checkpoint:", pth, flush=True)
    tree = "/tmp/cosnet_bench_sbm"

    report = {"checkpoint": os.path.basename(pth), "trained_epochs": args.epochs,
              "modes": {}}
    for name, extra in MODES.items():
        iou, f = eval_mode(tree, pth, extra)
        report["modes"][name] = {"iou": iou, "f": f}
        print(f"  {name}: IoU={iou:.10f} F={f:.10f}", flush=True)
    ref = report["modes"]["bf16_host"]
    for name, r in report["modes"].items():
        r["delta_iou_vs_bf16_host"] = r["iou"] - ref["iou"]
        r["delta_f_vs_bf16_host"] = r["f"] - ref["f"]
    os.makedirs(EVIDENCE, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
