#!/usr/bin/env python
"""Benchmark: flagship RAA inference throughput at 480×854 on one TPU chip.

Prints the contract JSON line {"metric", "value", "unit", "vs_baseline"}
and FLUSHES it the moment the headline device measurement exists; optional
enrichment stages (f32/int8 reruns, end-to-end test.py drives) then run
within a wall-clock budget (--budget-s / COSNET_BENCH_BUDGET_S) and a second
line repeats the contract keys plus secondary metrics. A timeout during
enrichment can therefore never lose the headline number. The baseline is the
reference PyTorch model on CPU at the same resolution (BASELINE.md: target
>10× torch-CPU frames/sec/chip).

Headline: device throughput in the production inference config — bfloat16
activation stream (params and mask decode stay f32; masks agree with f32 at
uint8 scale, tests/test_model_parity.py). Secondary keys:
  * ``f32_fps`` — same measurement with float32 activations;
  * ``end_to_end_fps`` / ``end_to_end_p50_ms`` — the REAL ``test.py`` eval
    loop (loader → ROI crop → resize → multi-ref forward → soft-IoU → PNGs)
    on a synthetic SBM-RGBD tree, i.e. data pipeline included. On this 1-CPU
    host the pipeline is decode-bound; the device fps is the chip capability
    (reference eval loop: /root/reference/test.py:278-305).

The torch-CPU baseline is re-measured live when ``--measure-baseline`` is
given (≈5 min at ~72 s/frame on this 1-core host); otherwise the cached
measurement in BENCH_BASELINE.json (recorded on this machine) is used.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")
H, W = 480, 854
# Speed-of-light for this step on v5e: 28.83 TFLOP @ 197 TFLOP/s bf16 with
# the HBM floor folded in — per-op xplane analysis in docs/PERF_r2.md.
SOL_MS = 146.0
# int8 speed-of-light: the quantized conv FLOPs run at 2x peak (394 TOPS),
# the bf16 remainder (conv1 stems 7.3, flash co-attention 8.6, decode/BN
# elementwise ~8) does not — derivation table in docs/PERF_r5.md.
SOL_INT8_MS = 85.0


def measure_torch_cpu(iters: int = 2) -> float:
    import warnings

    warnings.filterwarnings("ignore")
    sys.path.insert(0, "/root/reference")
    import torch
    from deeplab.residual_net import Bottleneck as RefB
    from rgbd_segmentation_RAA import RGBDSegmentation_RAA

    model = RGBDSegmentation_RAA(RefB, [3, 4, 23, 3], [3, 4, 6, 3], num_classes=1).eval()
    rng = np.random.default_rng(0)
    args = [torch.from_numpy(rng.standard_normal((1, c, H, W)).astype(np.float32)) for c in (3, 3, 1, 1)]
    with torch.no_grad():
        model(*args)  # warmup
        t0 = time.time()
        for _ in range(iters):
            model(*args)
        dt = (time.time() - t0) / iters
    return 1.0 / dt


def baseline_fps(measure: bool) -> float:
    if not measure and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_fps_480x854"]
    fps = measure_torch_cpu()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_fps_480x854": fps, "host": os.uname().nodename}, f)
    return fps


def _enable_compile_cache():
    """The persistent cache (committed with the repo) brings full-model
    recompiles from ~60 s to ~1 s; driver runs hit it."""
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure_sync_overhead_ms(iters: int = 20) -> float:
    """Per-iteration host-sync cost of the timing loop (jit dispatch + D2H of
    one scalar + transport round-trip). On a directly-attached TPU this is
    <1 ms; through the tunneled axon relay it has been measured anywhere from
    ~3 ms to ~29 ms depending on the session. Reported alongside the wall fps
    so device capability can be separated from transport latency."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((8, 8))
    float(f(x))
    t0 = time.time()
    for _ in range(iters):
        float(f(x))
    return (time.time() - t0) / iters * 1e3


def _xplane_device_ms(fn, steps: int = 2):
    """Authoritative per-step device time: run ``fn`` ``steps`` times under a
    jax.profiler trace and sum the TPU plane's XLA-op durations. Wall deltas
    through the tunneled relay drift ~550 ms/step across sessions (CLAUDE.md
    measurement protocol); the xplane number reproduces across rounds to
    0.1 ms, so every published mode row carries it next to the wall fps."""
    import shutil
    import tempfile

    import jax

    sys.path.insert(0, os.path.join(REPO, "benchmarks"))
    try:
        from profile_step import aggregate_xplane
    except Exception:
        return None
    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                fn()
        ms, _ = aggregate_xplane(trace_dir, steps)
        return round(ms, 2)
    except Exception as e:
        sys.stderr.write(f"xplane capture failed ({e}); falling back to wall-sync split\n")
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def measure_tpu(iters: int, batch: int, backend: str, dtype_name: str,
                quantize: str = "") -> dict:
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from cosnet_tpu.models import create_model, init_variables
    from cosnet_tpu.utils.device import device_materialize
    from cosnet_tpu.nn import quant

    if quantize == "int8":
        quant.enable_int8(min_in_channels=512)  # measured sweet spot (docs/PERF_r3.md)
    elif quantize == "int8-static":
        # calibrated below, once model + inputs exist
        quant.enable_int8(min_in_channels=64, static=True)  # sweet spot (docs/PERF_r4.md)
    else:
        quant.disable_int8()
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = create_model("resnet_aspp_add", coattention_backend=backend, dtype=dtype)
    variables = init_variables(model, n_inputs=4, hw=(64, 64))
    variables = device_materialize(jax.tree.map(jnp.asarray, variables))

    rng = np.random.default_rng(0)
    rgb_a = jnp.asarray(rng.standard_normal((batch, H, W, 3), dtype=np.float32))
    rgb_b = jnp.asarray(rng.standard_normal((batch, H, W, 3), dtype=np.float32))
    d_a = jnp.asarray(rng.standard_normal((batch, H, W, 1), dtype=np.float32))
    d_b = jnp.asarray(rng.standard_normal((batch, H, W, 1), dtype=np.float32))

    if quantize == "int8-static":
        # one calibration forward (dynamic scales, quant_stats mutable), then
        # install the per-channel ranges as the quant_scales collection:
        # requantize folds into the producer epilogues
        # (192.9 -> 137.5 ms xplane, docs/PERF_r4.md)
        amax = quant.collect_amax(model, variables, (rgb_a, rgb_b, d_a, d_b),
                                  train=False)
        variables = dict(variables, quant_scales=jax.tree.map(
            jnp.asarray, quant.scales_variables(amax)))

    @jax.jit
    def fwd(v, a, b, da, db):
        x1, _, _ = model.apply(v, a, b, da, db, train=False)
        return jnp.sum(x1)  # scalar forces full execution at the host sync

    float(fwd(variables, rgb_a, rgb_b, d_a, d_b))  # compile + warmup
    t0 = time.time()
    for _ in range(iters):
        s = float(fwd(variables, rgb_a, rgb_b, d_a, d_b))  # host transfer per iter
    dt = (time.time() - t0) / iters
    assert np.isfinite(s)
    # Device truth per mode (VERDICT r4 #4): the wall fps above includes the
    # relay's per-sync round-trip, which drifts between modes measured
    # minutes apart (r4's published int8 27.8 < f32 29.4 inversion was pure
    # relay regime). The xplane device step + the implied local sync make
    # each mode row self-explaining.
    device_ms = _xplane_device_ms(
        lambda: float(fwd(variables, rgb_a, rgb_b, d_a, d_b)))
    wall_ms = dt * 1e3
    return {
        "fps": batch / dt,
        "device_step_ms": device_ms,
        "device_fps": round(batch / device_ms * 1e3, 4) if device_ms else None,
        "sync_ms_local": round(wall_ms - device_ms, 2) if device_ms else None,
    }


# ---------------------------------------------------------------------------
# End-to-end: the real test.py eval loop on a synthetic SBM-RGBD tree
# ---------------------------------------------------------------------------


def _build_synthetic_tree(root: str, n_seqs: int = 2, frames_per_seq: int = 24):
    """SBM-RGBD-shaped tree (challenge/seq/{input,depth,groundtruth} + ROI.bmp)
    with enough frames that batch 8 divides evenly and the steady-state
    window (batches after the first) spans several batches."""
    import cv2

    marker = os.path.join(root, f".done{n_seqs}x{frames_per_seq}")
    if os.path.exists(marker):
        return
    rng = np.random.default_rng(0)
    h, w = 480, 640  # SBM-RGBD source geometry
    for s in range(n_seqs):
        seq = os.path.join(root, "Bootstrapping", f"seq{s}")
        for sub in ("input", "depth", "groundtruth"):
            os.makedirs(os.path.join(seq, sub), exist_ok=True)
        roi = np.zeros((h, w), np.uint8)
        roi[20:460, 30:610] = 255
        cv2.imwrite(os.path.join(seq, "ROI.bmp"), roi)
        for i in range(1, frames_per_seq + 1):
            fid = f"{i:06d}"
            cv2.imwrite(os.path.join(seq, "input", f"in{fid}.png"),
                        rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(seq, "depth", f"d{fid}.png"),
                        rng.integers(0, 255, (h, w), dtype=np.uint8))
            gt = np.zeros((h, w), np.uint8)
            gt[150:330, 200:440] = 255
            cv2.imwrite(os.path.join(seq, "groundtruth", f"gt{fid}.png"), gt)
    open(marker, "w").close()


def measure_end_to_end(dtype_name: str, batch: int = 8, extra_args=(),
                       timeout: int = 3600):
    """Run ``test.py`` (the real eval driver: loader, ROI, resize, multi-ref
    forward, IoU, PNG output) against a synthetic tree; parse its throughput
    log line. Returns (steady_fps, p50_ms, overall_fps) or None on failure."""
    import tempfile

    import yaml

    tree = "/tmp/cosnet_bench_sbm"
    os.makedirs(tree, exist_ok=True)
    _build_synthetic_tree(tree)

    with open(os.path.join(REPO, "config.yaml")) as f:
        config = yaml.safe_load(f)
    t = config["test"]["dataset"]["sbmrgbd"]
    t["data_path"] = tree
    t["image_HW_4_model"] = f"{H}, {W}"
    t["output_WH"] = f"{W}, {H}"
    t["sample_range"] = 1
    t["subset"] = None

    workdir = tempfile.mkdtemp(prefix="cosnet_bench_")
    with open(os.path.join(workdir, "config.yaml"), "w") as f:
        yaml.safe_dump(config, f)
    # Append to PYTHONPATH (it may carry the host's sitecustomize, which
    # registers the TPU PJRT plugin — replacing it would lose the backend).
    existing = os.environ.get("PYTHONPATH", "")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{existing}" if existing else REPO)
    cmd = [sys.executable, os.path.join(REPO, "test.py"), "--dataset", "sbmrgbd",
           "--model", "raa", "--batch_size", str(batch), "--dtype", dtype_name,
           "--no-shuffle", "--save_seg_img", ""] + list(extra_args)
    try:
        proc = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True,
                              text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"end-to-end bench timed out after {timeout}s\n")
        return None
    if proc.returncode != 0:
        sys.stderr.write(f"end-to-end bench failed:\n{proc.stderr[-2000:]}\n")
        return None
    logs = []
    for dirpath, _, files in os.walk(os.path.join(workdir, "vos_test_results")):
        logs += [os.path.join(dirpath, f) for f in files if f.endswith("_test_log.txt")]
    for log in logs:
        with open(log) as f:
            text = f.read()
        overall = re.search(r"frames/sec: ([\d.]+)\s+p50 latency: ([\d.]+) ms", text)
        steady = re.search(r"steady-state frames/sec: ([\d.]+)\s+p50 latency: ([\d.]+) ms", text)
        if steady:
            return float(steady.group(1)), float(steady.group(2)), float(overall.group(1))
        if overall:
            return float(overall.group(1)), float(overall.group(2)), float(overall.group(1))
    return None


def backend_alive(timeout_s: int = 240) -> bool:
    """Probe TPU backend init in a THROWAWAY subprocess with a hard timeout.

    The tunneled axon relay can be down for hours (observed 2026-08-18);
    backend init then polls forever in-process (uninterruptible from Python
    signal handlers — the wait lives in C). Probing in a subprocess keeps
    bench.py itself from hanging so a dead tunnel degrades to a
    self-describing JSON line instead of a stalled driver run."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--backend", default="pallas")
    parser.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    parser.add_argument("--measure-baseline", action="store_true")
    parser.add_argument("--skip-f32", action="store_true")
    parser.add_argument("--skip-int8", action="store_true")
    parser.add_argument("--skip-end-to-end", action="store_true")
    parser.add_argument(
        "--budget-s", type=float,
        default=float(os.environ.get("COSNET_BENCH_BUDGET_S", "1500")),
        help="Wall-clock budget for the OPTIONAL enrichment stages (f32/int8 "
             "reruns, end-to-end test.py drives). The headline contract line "
             "is always printed+flushed the moment the device measurement "
             "exists; stages that do not fit the remaining budget are "
             "skipped and recorded under 'skipped_stages'.")
    args = parser.parse_args()

    if not backend_alive():
        print(json.dumps({
            "metric": f"raa_inference_frames_per_sec_per_chip_480x854_batch{args.batch}_{args.dtype}",
            "value": None,
            "unit": "frames/sec",
            "vs_baseline": None,
            "error": "TPU backend unavailable (axon relay down; init probe "
                     "timed out in a subprocess). Device numbers from the "
                     "last healthy session are in docs/PERF_r3.md.",
        }), flush=True)
        return

    base = baseline_fps(args.measure_baseline)
    head = measure_tpu(args.iters, args.batch, args.backend, args.dtype)
    fps = head["fps"]
    sync_ms = measure_sync_overhead_ms()
    device_step_ms = head["device_step_ms"] or max(args.batch / fps * 1e3 - sync_ms, 0.0)
    out = {
        "metric": f"raa_inference_frames_per_sec_per_chip_480x854_batch{args.batch}_{args.dtype}",
        "value": round(fps, 4),
        "unit": "frames/sec",
        # The driver-contract ratio. Context for the large number: the
        # baseline is the reference torch model on THIS host's single CPU
        # core (~76 s/frame, BENCH_BASELINE.json) — the only hardware the
        # reference can run on in this environment.
        "vs_baseline": round(fps / base, 2),
        "baseline_is": "torch_cpu_1core_480x854",
        # Honest primary metrics: fraction of the v5e speed-of-light the
        # device step achieves (1.0 == nothing left under architecture
        # parity; docs/PERF_r2.md), and the split of wall step into device
        # step + per-iteration host sync (the tunneled-relay round-trip
        # varies 3-29 ms/session — the split makes sessions comparable).
        "sol_fraction": round(SOL_MS / device_step_ms, 4) if device_step_ms else None,
        "sync_overhead_ms": round(sync_ms, 2),
        "device_step_ms": round(device_step_ms, 2),
        "device_step_source": "xplane" if head["device_step_ms"] else "wall_minus_sync",
        "device_fps": round(args.batch / device_step_ms * 1e3, 4) if device_step_ms else None,
    }
    # CONTRACT LINE — printed and flushed the moment the headline measurement
    # exists, so a timeout during any later enrichment stage can never lose
    # the round's number again (BENCH_r03.json was rc=124/parsed=null because
    # this line used to come after three full test.py subprocesses).
    print(json.dumps(out), flush=True)

    # ---- Optional enrichment, bounded by --budget-s -----------------------
    deadline = time.time() + args.budget_s
    skipped = []

    def fits(stage: str, need_s: float) -> bool:
        if time.time() + need_s <= deadline:
            return True
        skipped.append(stage)
        return False

    # In-process reruns reuse the warm jax client: ~iters*step + cached
    # compile. Each test.py subprocess pays interpreter+backend init (~60 s)
    # plus the eval drive itself; give them a conservative floor.
    def mode_row(prefix: str, r: dict, sol_ms: float = None):
        """Every published mode carries wall fps + xplane device step + the
        implied local sync, so a wall inversion between modes measured in
        different relay regimes reads as sync drift, not a regression."""
        out[f"{prefix}_fps"] = round(r["fps"], 4)
        if r["device_step_ms"]:
            out[f"{prefix}_device_step_ms"] = r["device_step_ms"]
            out[f"{prefix}_device_fps"] = r["device_fps"]
            out[f"{prefix}_sync_ms"] = r["sync_ms_local"]
            if sol_ms:
                out[f"sol_fraction_{prefix}"] = round(sol_ms / r["device_step_ms"], 4)

    if not args.skip_f32 and args.dtype != "float32" and fits("f32", 60):
        mode_row("f32", measure_tpu(args.iters, args.batch, args.backend, "float32"))
    if not args.skip_int8 and fits("int8", 60):
        # int8 MXU path on the wide convs (test.py --quantize int8): device
        # step 192.8 -> 165.0 ms xplane (docs/PERF_r3.md); mask-agreement
        # gated by tests/test_quant.py.
        mode_row("int8", measure_tpu(args.iters, args.batch, args.backend,
                                     args.dtype, quantize="int8"))
    if not args.skip_int8 and fits("int8_static", 60):
        # static calibrated per-channel scales: requantize folded into the
        # epilogues, residual stream in int8 (docs/PERF_r4.md / PERF_r5.md);
        # int8 speed-of-light differs from bf16 (conv FLOPs at 2x peak).
        mode_row("int8_static",
                 measure_tpu(args.iters, args.batch, args.backend, args.dtype,
                             quantize="int8-static"), sol_ms=SOL_INT8_MS)
    if not args.skip_end_to_end:
        def e2e_timeout() -> int:
            return max(int(deadline - time.time()), 60)
        # The REAL test.py loop (loader, ROI crop, resize, multi-ref forward,
        # soft-IoU, mask PNGs) on a synthetic tree, production config:
        # --device-preprocess ships ROI-cropped uint8 source frames and runs
        # resize+mean-sub on device — the eval loop is transfer-bound through
        # the ~35-40 MB/s tunneled relay, so uint8 staging is the production
        # path (masks == host path at uint8 scale; same final-IoU fingerprint
        # on this tree). Steady-state excludes batch 0 (compile-cache load +
        # one-time weight upload).
        # --frame-pool additionally ships each unique frame over the wire
        # ONCE (the eval protocol revisits every frame ~sample_range extra
        # times as a counterpart) and builds the batch stack on device:
        # same-session control 10.08 -> 13.26 fps (docs/PERF_r3.md).
        if fits("end_to_end", 240):
            e2e = measure_end_to_end(
                args.dtype, extra_args=["--device-preprocess", "--frame-pool", "256"],
                timeout=e2e_timeout())
            if e2e:
                out["end_to_end_fps"], out["end_to_end_p50_ms"] = round(e2e[0], 4), round(e2e[1], 1)
                out["end_to_end_fps_incl_warmup"] = round(e2e[2], 4)
        # --device-metrics: the serving-mode loop — scores computed on device
        # as bit-exact integer counters (24 B/frame D2H instead of the 0.4 MB
        # mask; tests/test_device_metrics.py pins log-line equality). Reported
        # separately: the headline above still materializes every mask.
        if fits("end_to_end_device_metrics", 240):
            dm = measure_end_to_end(
                args.dtype, extra_args=["--device-preprocess", "--frame-pool", "256",
                                        "--device-metrics"], timeout=e2e_timeout())
            if dm:
                out["end_to_end_fps_device_metrics"] = round(dm[0], 4)
                out["end_to_end_p50_ms_device_metrics"] = round(dm[1], 1)
        # Same loop with fully host-side preprocessing (the reference's exact
        # float path, bit-exact loader parity) — kept for comparability with
        # BENCH_r01/r02.
        if fits("end_to_end_hostpath", 240):
            ref = measure_end_to_end(args.dtype, timeout=e2e_timeout())
            if ref:
                out["end_to_end_fps_hostpath"] = round(ref[0], 4)
                out["end_to_end_p50_ms_hostpath"] = round(ref[1], 1)
    if skipped:
        out["skipped_stages"] = skipped
    # Enriched line: same contract keys + secondary metrics. A driver that
    # takes the LAST parseable line gets the full picture; one that takes the
    # FIRST got the identical headline already.
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
