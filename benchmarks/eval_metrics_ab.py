#!/usr/bin/env python
"""Wall-clock ABBA A/B of --device-metrics through the REAL test.py loop.

Device-metrics scoring replaces the per-batch mask D2H (0.4 MB/frame over
the ~40 MB/s tunneled relay) and the host's numpy metric passes with six
int32 counters computed inside the jit (eval/metrics.py). Correctness is
pinned in CI (tests/test_device_metrics.py: per-frame log lines byte-equal
to host scoring); this script holds the wall-clock evidence.

Protocol: the 153-frame sweep tree (scripts/make_sweep_tree.py), production
eval config (480x640 model res per config.yaml, batch 8 bf16,
--device-preprocess --frame-pool 256), control vs +--device-metrics in ABBA
order to cancel relay drift. Steady-state fps and p50 are read from the
run's own log lines; the final mean-IoU fingerprint must be identical
across all four runs.

Usage: python benchmarks/eval_metrics_ab.py [--out ...]
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
sys.path.insert(0, os.path.join(REPO, "scripts"))


def timed_run(tree, device_metrics):
    with open(os.path.join(REPO, "config.yaml")) as f:
        config = yaml.safe_load(f)
    config["test"]["dataset"]["sbmrgbd"]["data_path"] = tree
    workdir = tempfile.mkdtemp(prefix="cosnet_evalab_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    cmd = [sys.executable, os.path.join(REPO, "test.py"), "--dataset", "sbmrgbd",
           "--model", "raa", "--batch_size", "8", "--dtype", "bfloat16",
           "--no-shuffle", "--save_seg_img", "",
           "--device-preprocess", "--frame-pool", "256"]
    if device_metrics:
        cmd.append("--device-metrics")
    print("+", ("DEVICE-METRICS" if device_metrics else "HOST-SCORED"), flush=True)
    proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                          text=True, timeout=3600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        sys.exit("test.py failed")
    logs = []
    for dirpath, _, files in os.walk(os.path.join(workdir, "vos_test_results")):
        logs += [os.path.join(dirpath, f) for f in files if f.endswith("_test_log.txt")]
    text = open(logs[0]).read()
    steady = re.search(r"steady-state frames/sec: ([\d.]+)\s+p50 latency: ([\d.]+) ms", text)
    final_iou = re.search(r"final IOU: ([\d.]+)", text)
    return float(steady.group(1)), float(steady.group(2)), final_iou.group(1)


def host_load() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/cosnet_sweep_tree")
    ap.add_argument("--pairs", type=int, default=3,
                    help="ABBA blocks; 3 blocks = 6 runs per arm (the "
                         "median-of->=5 protocol — round 3's 2-runs-per-arm "
                         "capture had a 17x same-arm spread)")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "evidence",
                                                  "DEVICE_METRICS_r04.json"))
    args = ap.parse_args()

    from make_sweep_tree import build

    build(args.root)
    results = {"host": [], "device_metrics": []}
    fingerprints, loads = [], []
    for dm in (False, True, True, False) * args.pairs:  # interleaved ABBA
        loads.append(host_load())
        fps, p50, iou = timed_run(args.root, dm)
        results["device_metrics" if dm else "host"].append(
            {"steady_fps": fps, "p50_ms": p50})
        fingerprints.append(iou)
        print(f"  -> {fps} fps, p50 {p50} ms, meanIoU {iou}", flush=True)
    assert all(f == fingerprints[0] for f in fingerprints), fingerprints

    median = lambda xs: sorted(xs)[len(xs) // 2] if len(xs) % 2 else \
        sum(sorted(xs)[len(xs) // 2 - 1:len(xs) // 2 + 1]) / 2
    host_fps = [r["steady_fps"] for r in results["host"]]
    dm_fps = [r["steady_fps"] for r in results["device_metrics"]]
    report = {
        "config": "153-frame sweep tree, batch 8 bf16, device-preprocess + "
                  f"frame-pool 256, {args.pairs}x ABBA "
                  f"({2 * args.pairs} runs/arm), median",
        "host": results["host"],
        "device_metrics": results["device_metrics"],
        "host_median_fps": round(median(host_fps), 2),
        "host_min_max_fps": [min(host_fps), max(host_fps)],
        "device_metrics_median_fps": round(median(dm_fps), 2),
        "device_metrics_min_max_fps": [min(dm_fps), max(dm_fps)],
        "arms_overlap": min(dm_fps) <= max(host_fps) and min(host_fps) <= max(dm_fps),
        "host_loadavg_per_run": loads,
        "mean_iou_fingerprint": fingerprints[0],
        "fingerprints_identical": True,
    }
    report["speedup"] = round(
        report["device_metrics_median_fps"] / report["host_median_fps"], 4)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
