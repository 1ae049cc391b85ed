#!/usr/bin/env python
"""Wall-clock A/B of the pipelined training loop (train.py) on the real TPU.

The train loop dispatches step k+1 before fetching step k's loss so the
per-step host sync (``float(loss)`` — a 3-29 ms relay round-trip on this
tunneled backend, session-dependent) hides under device compute. Output
equality is pinned in CI (tests/test_train_driver.py); this script holds
the wall-clock evidence.

Protocol: run the REAL ``train.py`` driver at the production train config
(240x320 batch 4 bf16, the config of /root/reference/config.yaml train
sbmrgbd) on the synthetic bench tree, serial vs pipelined, in ABBA order to
cancel relay drift. Per-step time = the span between the first and last
``===> Epoch[e]`` stdout line within each steady epoch (e >= 1; epoch 0
carries the compile-cache load), divided by the n-1 inter-line gaps. The
loss sequences are asserted identical across all runs.

Usage: python benchmarks/train_loop_ab.py [--epochs 4]
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


def timed_run(workdir, pipelined):
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{existing}" if existing else REPO,
               COSNET_TRAIN_PIPELINE="1" if pipelined else "0")
    cmd = [sys.executable, os.path.join(REPO, "train.py"), "--dataset", "sbmrgbd",
           "--model", "raa", "--dtype", "bfloat16", "--random-seed", "7"]
    print("+", ("PIPELINE=1" if pipelined else "PIPELINE=0"), " ".join(cmd), flush=True)
    # stderr goes to a FILE: stderr=PIPE would deadlock once jax/absl
    # warnings exceed the pipe buffer while we read stdout line-by-line.
    with open(os.path.join(workdir, "stderr.log"), "w+") as errf:
        proc = subprocess.Popen(cmd, cwd=workdir, env=env, stdout=subprocess.PIPE,
                                stderr=errf, text=True, bufsize=1)
        stamped = []  # (t, epoch, line)
        for line in proc.stdout:
            m = re.match(r"===> Epoch\[(\d+)\]", line)
            if m:
                stamped.append((time.monotonic(), int(m.group(1)), line.strip()))
        proc.wait()
        if proc.returncode != 0:
            errf.seek(0)
            sys.stderr.write(errf.read()[-4000:])
            sys.exit(f"train.py failed ({proc.returncode})")
    per_epoch = {}
    for t, e, _ in stamped:
        per_epoch.setdefault(e, []).append(t)
    gaps_ms = []
    for e, ts in sorted(per_epoch.items()):
        if e == 0 or len(ts) < 2:  # epoch 0 pays the compile-cache load
            continue
        gaps_ms.append((ts[-1] - ts[0]) / (len(ts) - 1) * 1e3)
    if not gaps_ms:
        sys.exit("no steady epochs to time: need --epochs >= 2 and >= 2 "
                 f"steps/epoch (got {len(stamped)} Epoch lines)")
    losses = [l for _, _, l in stamped]
    return sum(gaps_ms) / len(gaps_ms), losses


def host_load() -> float:
    """1-minute loadavg — recorded with the evidence so a contended capture
    (round 3's TRAIN_PIPELINE_r03.json was taken alongside other load and
    measured the pipeline 1.9x slower) is self-identifying."""
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--pairs", type=int, default=3,
                    help="ABBA blocks; 3 pairs = 6 serial + 6 pipelined runs")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "evidence",
                                                  "TRAIN_PIPELINE_r04.json"))
    args = ap.parse_args()
    if args.epochs < 2:
        sys.exit("--epochs must be >= 2: epoch 0 is warmup (compile-cache "
                 "load), timing needs at least one steady epoch")

    tree = "/tmp/cosnet_bench_sbm"
    if not os.path.isdir(os.path.join(tree, "Bootstrapping")):
        sys.path.insert(0, REPO)
        from bench import _build_synthetic_tree

        os.makedirs(tree, exist_ok=True)
        _build_synthetic_tree(tree)

    config_path = os.path.join(REPO, "config.yaml")
    with open(config_path) as f:
        config = yaml.safe_load(f)
    t = config["train"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["batch_size"] = 4
    t["max_epoches"] = args.epochs
    t["output_HW"] = "240,320"
    t["subset"] = None
    t["checkpoint_file"] = False

    results = {"serial": [], "pipelined": []}
    loads = []
    loss_seqs = []
    for pipelined in (False, True, True, False) * args.pairs:  # interleaved ABBA blocks
        workdir = tempfile.mkdtemp(prefix="cosnet_trainab_")
        with open(os.path.join(workdir, "config.yaml"), "w") as f:
            yaml.safe_dump(config, f)
        loads.append(host_load())
        ms, losses = timed_run(workdir, pipelined)
        results["pipelined" if pipelined else "serial"].append(round(ms, 2))
        loss_seqs.append(losses)
        print(f"  -> {ms:.1f} ms/step ({len(losses)} Epoch lines)", flush=True)
        # Each run leaves ~4 GB of per-epoch orbax+pth snapshots; 12 runs
        # filled /tmp (ENOSPC killed the first r4 capture's final run).
        import shutil

        shutil.rmtree(os.path.join(workdir, "snapshots"), ignore_errors=True)

    assert all(s == loss_seqs[0] for s in loss_seqs[1:]), \
        "loss/lr sequences differ across runs"
    median = lambda xs: sorted(xs)[len(xs) // 2] if len(xs) % 2 else \
        sum(sorted(xs)[len(xs) // 2 - 1:len(xs) // 2 + 1]) / 2
    report = {
        "config": "sbmrgbd 240x320 batch4 bf16, synthetic bench tree, "
                  f"{args.pairs}x ABBA ({2 * args.pairs} runs/arm), median",
        "serial_ms_per_step": results["serial"],
        "pipelined_ms_per_step": results["pipelined"],
        "serial_median_ms": round(median(results["serial"]), 2),
        "serial_min_max_ms": [min(results["serial"]), max(results["serial"])],
        "pipelined_median_ms": round(median(results["pipelined"]), 2),
        "pipelined_min_max_ms": [min(results["pipelined"]), max(results["pipelined"])],
        "speedup": round(median(results["serial"]) / median(results["pipelined"]), 4),
        "arms_overlap": min(results["serial"]) <= max(results["pipelined"])
                        and min(results["pipelined"]) <= max(results["serial"]),
        "host_loadavg_per_run": loads,
        "loss_sequences_identical": True,
        "epoch_lines_per_run": len(loss_seqs[0]),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
