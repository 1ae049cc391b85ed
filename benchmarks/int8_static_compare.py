#!/usr/bin/env python
"""xplane device-step comparison: bf16 vs dynamic int8 vs static int8.

Drives ``benchmarks/profile_step.py`` (xplane truth — wall deltas through
the tunneled relay are not usable, CLAUDE.md) at the production eval
geometry for each quantization mode and records the device step times as
``docs/evidence/INT8_STATIC_r04.json``. The static rows are the VERDICT r3
#7 gate: residual-stream int8 with the requantize folded into the
epilogues, target <= 155 ms at 480x854 batch 8 (dynamic int8 measured
165.0 ms in round 3).

Usage: python benchmarks/int8_static_compare.py [--steps 3]
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = [
    ("bf16", []),
    ("int8_dynamic_ci512", ["--quantize", "int8", "--quantize-min-ci", "512"]),
    ("int8_static_ci512", ["--quantize", "int8-static", "--quantize-min-ci", "512"]),
    ("int8_static_ci64", ["--quantize", "int8-static", "--quantize-min-ci", "64"]),
    ("int8_static_ci0", ["--quantize", "int8-static", "--quantize-min-ci", "0"]),
]


def run_mode(extra, steps):
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    cmd = [sys.executable, os.path.join(REPO, "benchmarks", "profile_step.py"),
           "--dtype", "bfloat16", "--batch", "8", "--hw", "480", "854",
           "--steps", str(steps)] + list(extra)
    print("+", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=7200)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-1500:] + "\n" + proc.stderr[-3000:])
        return None
    m = re.search(r"device step ([\d.]+) ms \(([\d.]+) frames/s/chip\)", proc.stdout)
    top = [l for l in proc.stdout.splitlines() if re.match(r"\s+[\d.]+ ms x", l)][:6]
    return {"device_step_ms": float(m.group(1)), "fps_per_chip": float(m.group(2)),
            "top_ops": [l.strip() for l in top]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "evidence",
                                                  "INT8_STATIC_r05.json"))
    args = ap.parse_args()

    report = {"config": "eval fwd 480x854 batch 8 bf16 stream, xplane", "modes": {}}
    for name, extra in MODES:
        r = run_mode(extra, args.steps)
        if r:
            report["modes"][name] = r
            print(f"  {name}: {r['device_step_ms']} ms", flush=True)
        else:
            report["modes"][name] = {"error": "run failed"}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v.get("device_step_ms") for k, v in report["modes"].items()}))


if __name__ == "__main__":
    main()
