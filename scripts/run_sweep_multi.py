#!/usr/bin/env python
"""Multi-dataset resident sweep on the real TPU (VERDICT r3 #6).

Every committed drive artifact through round 3 was sbmrgbd; the HZFU and
DAVIS loaders were golden-tested but never driven end-to-end. This builds
synthetic trees for all three dataset families (scripts/make_aux_trees.py —
HZFU's ``.mat`` depth layout included) and drives ``serve.py`` twice:

* ``--datasets sbmrgbd,hzfurgbd,hzfud --model raa`` — one resident RGBD
  session sweeping SBM-RGBD plus both HZFU modes (hzfud exercises the
  depth-as-rgb channel rule through the CLI);
* ``--datasets davis --model ori`` — the rgb-only model over DAVIS val
  (the reference's davis eval path is broken, reference test.py:28; ours
  re-derives it — SURVEY §2).

Evidence: docs/evidence/SWEEP_r04_multi.json + SWEEP_r04_davis.json.

Usage: python scripts/run_sweep_multi.py [--dtype bfloat16] [--ckpt PTH]
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from make_aux_trees import build_davis, build_hzfu  # noqa: E402
from make_sweep_tree import build as build_sbm  # noqa: E402

EVIDENCE = os.path.join(REPO, "docs", "evidence")


def make_workdir(sbm_tree, hzfu_tree, davis_tree, ckpt=None, ori_ckpt=None) -> str:
    with open(os.path.join(REPO, "config.yaml")) as f:
        config = yaml.safe_load(f)
    t = config["test"]["dataset"]
    t["sbmrgbd"]["data_path"] = sbm_tree
    for k in ("hzfud", "hzfurgb", "hzfurgbd"):
        t[k]["data_path"] = hzfu_tree
    t["davis"]["path"] = davis_tree
    t["davis"]["subset_file"] = os.path.join(davis_tree, "val_seqs.txt")
    if ckpt:  # raa only: other models have different param trees
        config["test"]["model"]["resnet_aspp_add"]["pretrained_params"] = ckpt
    if ori_ckpt:  # trained RGB-only ckpt (scripts/train_synth_ckpt.py --ori)
        config["test"]["model"].setdefault("original_coattention_rgb", {})[
            "pretrained_params"] = ori_ckpt
    workdir = tempfile.mkdtemp(prefix="cosnet_msweep_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    return workdir


def run(cmd, workdir):
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                          text=True, timeout=7200)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-6000:])
        sys.exit(f"sweep driver failed ({proc.returncode})")
    return proc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch_size", default="8")
    ap.add_argument("--ckpt", default="", help="pretrained .pth for the raa model")
    ap.add_argument("--ori-ckpt", default="/tmp/cosnet_r5_ori_ckpt/snapshot.pth",
                    help="trained ori .pth for the DAVIS job (r4's fresh-init "
                         "drive scored F=0.0 — mechanism-only; VERDICT r4 #3)")
    ap.add_argument("--tag", default="r05")
    ap.add_argument("--skip-davis", action="store_true")
    args = ap.parse_args()

    sbm = "/tmp/cosnet_sweep_tree"
    build_sbm(sbm)  # returns the subset dict, not the path
    hzfu = build_hzfu("/tmp/cosnet_hzfu_tree")
    davis = build_davis("/tmp/cosnet_davis_tree")
    os.makedirs(EVIDENCE, exist_ok=True)

    ori_ckpt = args.ori_ckpt if os.path.isfile(args.ori_ckpt) else None
    workdir = make_workdir(sbm, hzfu, davis, ckpt=args.ckpt or None,
                           ori_ckpt=ori_ckpt)
    out = os.path.join(EVIDENCE, f"SWEEP_{args.tag}_multi.json")
    run([sys.executable, os.path.join(REPO, "serve.py"),
         "--datasets", "sbmrgbd,hzfurgbd,hzfud", "--model", "raa",
         "--batch_size", args.batch_size, "--dtype", args.dtype,
         "--out", out], workdir)
    print("evidence:", out)

    if not args.skip_davis:
        out2 = os.path.join(EVIDENCE, f"SWEEP_{args.tag}_davis.json")
        run([sys.executable, os.path.join(REPO, "serve.py"),
             "--datasets", "davis", "--model", "ori",
             "--batch_size", args.batch_size, "--dtype", args.dtype,
             "--out", out2], workdir)
        print("evidence:", out2)

    for p in (out, out2) if not args.skip_davis else (out,):
        with open(p) as f:
            s = json.load(f)
        print(p, "->", {k: s[k] for k in ("init_s", "mean_iou", "total_frames")
                        if k in s})


if __name__ == "__main__":
    main()
