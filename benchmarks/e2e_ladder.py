#!/usr/bin/env python
"""End-to-end attribution ladder: where each per-frame millisecond goes.

VERDICT r4 #7: device fps is ~42-58 while the driver-captured steady e2e is
6.9-10.8 — this harness attributes the residual host cost stage by stage so
the gap is either actionable (a >10% lever) or written down as the 1-core
VM's decode + relay-dispatch floor.

Runs the REAL ``test.py`` (reference eval-loop semantics,
``/root/reference/test.py:278-344``) on the synthetic SBM-RGBD tree with the
trained checkpoint, once per pipeline mode, in the SERIAL no-prefetch
configuration where per-stage wall times are exact (COSNET_EVAL_LADDER=1
accounting inside ``EvalSession.run``):

  decode   — loader __getitem__: PNG decode, ROI crop, resize, normalize
  stage    — batch assembly + H2D staging (uint8/bf16 on the wire)
  dispatch — jit call overhead (async; relay round-trip shows up here)
  block    — blocking materialize: device compute + D2H of mask/counters
  score    — soft-IoU/F (or counter rebuild), logging, optional PNG write

A second pipelined (default-config) run of the same mode records the
steady fps the overlap actually buys. One quiet-host session, modes
back-to-back; loadavg recorded per run (CLAUDE.md measurement protocol).

Usage: python benchmarks/e2e_ladder.py [--out docs/evidence/E2E_LADDER_r05.json]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

MODES = {
    "host_path": [],
    "device_preprocess": ["--device-preprocess"],
    "frame_pool": ["--device-preprocess", "--frame-pool", "256"],
    "device_metrics": ["--device-preprocess", "--frame-pool", "256",
                       "--device-metrics"],
}


def run_mode(tree, pth, extra, serial: bool):
    with open(os.path.join(REPO, "config.yaml")) as f:
        config = yaml.safe_load(f)
    t = config["test"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["subset"] = None
    config["test"]["model"]["resnet_aspp_add"]["pretrained_params"] = pth
    workdir = tempfile.mkdtemp(prefix="cosnet_ladder_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    if serial:
        env["COSNET_EVAL_LADDER"] = "1"
        env["COSNET_EVAL_PIPELINE"] = "0"
    cmd = [sys.executable, os.path.join(REPO, "test.py"), "--dataset", "sbmrgbd",
           "--model", "raa", "--dtype", "bfloat16", "--batch_size", "8",
           "--no-shuffle", "--save_seg_img", ""] + list(extra)
    if serial:
        cmd.append("--no-prefetch")
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                          text=True, timeout=3600)
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-1500:] + "\n" + proc.stderr[-3000:])
        sys.exit(f"test.py failed ({proc.returncode})")
    row = {"wall_s": round(wall, 1), "loadavg": os.getloadavg()[0]}
    m = re.search(r"^LADDER (\{.*\})$", proc.stdout, re.M)
    if m:
        row["ladder_ms_per_frame"] = json.loads(m.group(1))
    logs = []
    for dirpath, _, files in os.walk(os.path.join(workdir, "vos_test_results")):
        logs += [os.path.join(dirpath, f) for f in files if f.endswith("_log.txt")]
    for log in logs:
        text = open(log).read()
        overall = re.search(r"frames/sec: ([\d.]+)\s+p50 latency: ([\d.]+) ms", text)
        steady = re.search(r"steady-state frames/sec: ([\d.]+)", text)
        if overall:
            row["fps"] = float(overall.group(1))
            row["p50_ms"] = float(overall.group(2))
        if steady:
            row["steady_fps"] = float(steady.group(1))
        fp = re.search(r"final IOU: ([\d.eE+-]+)", proc.stdout)
        if fp:
            row["final_iou"] = float(fp.group(1))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "evidence", "E2E_LADDER_r05.json"))
    ap.add_argument("--modes", default=",".join(MODES))
    args = ap.parse_args()

    from train_synth_ckpt import ensure_checkpoint

    pth = ensure_checkpoint()
    tree = "/tmp/cosnet_bench_sbm"
    assert os.path.isdir(os.path.join(tree, "Bootstrapping")), \
        "run bench.py once to build the synthetic tree"

    report = {"config": "test.py 480x854 batch 8 bf16, synthetic tree, "
                        "trained ckpt; serial rows have exact stage "
                        "attribution, pipelined rows are the default config",
              "uptime_loadavg_start": os.getloadavg(), "modes": {}}
    for name in args.modes.split(","):
        extra = MODES[name]
        print(f"=== {name} (serial, ladder) ===", flush=True)
        serial = run_mode(tree, pth, extra, serial=True)
        print(json.dumps(serial), flush=True)
        print(f"=== {name} (pipelined) ===", flush=True)
        piped = run_mode(tree, pth, extra, serial=False)
        print(json.dumps(piped), flush=True)
        report["modes"][name] = {"serial": serial, "pipelined": piped}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("written", args.out)


if __name__ == "__main__":
    main()
