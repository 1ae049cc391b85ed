#!/usr/bin/env python
"""Bisect int8-static drift across coverage/headroom/granularity configs.

VERDICT r4 #1: int8-static must reach ΔF ≤ 5e-3 vs bf16 (trained-ckpt
fingerprint) at device step ≤ 145 ms. Round-5 measurements so far
(FINGERPRINTS_r05.json, synthetic tree, 4-epoch ckpt):

    dynamic ci512:           ΔF +4.85e-3   (165 ms r4)
    static ci64 per-channel: ΔF +1.02e-2   (150.2 ms)

The static penalty is either COVERAGE (ci64 quantizes every trunk conv;
dynamic's sweet spot only the ≥512 wide ones), HEADROOM (1.1× coarser
scales than dynamic's exact per-batch max), or GRANULARITY. Each config
here drives the REAL ``test.py`` over the bench tree with the trained
checkpoint and reports ΔIoU/ΔF vs the bf16 host fingerprint. Headroom
sweeps reuse one compiled graph (headroom folds into the calibrated
values, nn/quant.py::scales_variables); min-ci/granularity changes
retrace (trace-time branches).

Usage: python scripts/int8_bisect.py [--configs name1,name2,...]
Appends results to docs/evidence/INT8_BISECT_r05.json.
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(REPO, "docs", "evidence")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from fingerprint_drives import eval_mode  # noqa: E402
from train_synth_ckpt import ensure_checkpoint  # noqa: E402

CONFIGS = {
    # name -> env overrides for the int8-static drive
    "ci64_h1.0": {"COSNET_INT8_MIN_CI": "64", "COSNET_INT8_HEADROOM": "1.0"},
    "ci64_h1.05": {"COSNET_INT8_MIN_CI": "64", "COSNET_INT8_HEADROOM": "1.05"},
    "ci64_h1.1": {"COSNET_INT8_MIN_CI": "64", "COSNET_INT8_HEADROOM": "1.1"},
    "ci512_h1.0": {"COSNET_INT8_MIN_CI": "512", "COSNET_INT8_HEADROOM": "1.0"},
    "ci512_h1.1": {"COSNET_INT8_MIN_CI": "512", "COSNET_INT8_HEADROOM": "1.1"},
    "ci256_h1.0": {"COSNET_INT8_MIN_CI": "256", "COSNET_INT8_HEADROOM": "1.0"},
    "ci64_h1.0_pt": {"COSNET_INT8_MIN_CI": "64", "COSNET_INT8_HEADROOM": "1.0",
                     "COSNET_INT8_PER_CHANNEL": "0"},
    # layer1 (narrowest quantized class) falls back to dynamic scales
    "ci64_h1.0_dynlayer1": {"COSNET_INT8_MIN_CI": "64",
                            "COSNET_INT8_HEADROOM": "1.0",
                            "COSNET_INT8_DYNAMIC_SITES": "layer1"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--out", default=os.path.join(EVIDENCE, "INT8_BISECT_r05.json"))
    args = ap.parse_args()

    pth = ensure_checkpoint()
    tree = "/tmp/cosnet_bench_sbm"
    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)

    if "bf16_host" not in report:
        iou, f = eval_mode("sbmrgbd", "raa", tree, pth, ["--dtype", "bfloat16"])
        report["bf16_host"] = {"iou": iou, "f": f}
    ref = report["bf16_host"]

    for name in args.configs.split(","):
        env = CONFIGS[name]
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            iou, f = eval_mode("sbmrgbd", "raa", tree, pth,
                               ["--dtype", "bfloat16", "--quantize", "int8-static"])
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        row = {"env": env, "iou": iou, "f": f,
               "delta_iou": iou - ref["iou"], "delta_f": f - ref["f"],
               "gate_5e-3": abs(f - ref["f"]) <= 5e-3}
        report[name] = row
        print(f"{name}: dIoU {row['delta_iou']:+.2e}  dF {row['delta_f']:+.2e}  "
              f"gate<=5e-3: {row['gate_5e-3']}", flush=True)
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
    print("written", args.out)


if __name__ == "__main__":
    main()
