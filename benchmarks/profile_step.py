#!/usr/bin/env python
"""Authoritative device-step measurement: xplane-traced RAA forward.

Wall-clock timing through the tunneled axon relay includes a per-sync
round-trip that varies by session (~3-29 ms measured), so the headline
device step is taken from a ``jax.profiler`` trace instead: the sum of
"XLA Ops" durations on the TPU plane divided by the number of traced steps.
Also prints the top op categories (fusion names aggregated with trailing
``.N`` indices stripped) — the per-op attribution behind docs/PERF_r2.md.

Usage: python benchmarks/profile_step.py [--dtype bfloat16] [--steps 3]
       [--train]  # profile the full train step (grads + grouped SGD)
"""
import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def aggregate_xplane(trace_dir: str, steps: int, top: int = 12):
    """Parse the xplane proto(s) under ``trace_dir``; return (ms_per_step,
    [(ms, count, category, example)]) from the TPU plane's XLA Ops line."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    agg, cnt, example = collections.Counter(), collections.Counter(), {}
    total = 0.0
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = plane.event_metadata[ev.metadata_id].name
                    m = re.match(r"%([\w.\-]+) = ", name)
                    cat = re.sub(r"\.\d+$", "", m.group(1) if m else name[:40])
                    ms = ev.duration_ps / 1e9
                    agg[cat] += ms
                    cnt[cat] += 1
                    example.setdefault(cat, name[:120])
                    total += ms
    rows = [(v / steps, cnt[c] // steps, c, example[c]) for c, v in agg.most_common(top)]
    return total / steps, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 854))
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--train", action="store_true",
                    help="profile the jitted train step (fwd+bwd+grouped SGD) "
                         "with --remat semantics instead of the eval forward")
    ap.add_argument("--multiref", type=int, default=0, metavar="R",
                    help="profile the PRODUCTION multi-reference eval path "
                         "(eval/infer.py: shared target encode + R reference "
                         "frames batched through one co-attention) instead of "
                         "the plain pair forward")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--quantize", default="", choices=["", "int8", "int8-static"],
                    help="int8 trunk/ASPP convs (nn/quant.py); int8-static "
                         "calibrates activation scales on the profile inputs "
                         "first, so the requantize folds into the conv/BN/"
                         "ReLU epilogues (the residual-stream-int8 form)")
    ap.add_argument("--quantize-min-ci", type=int, default=0,
                    help="quantize only convs with >= this many input channels")
    ap.add_argument("--keep-trace", default="", help="directory to keep the trace in")
    ap.add_argument("--dump-hlo", default="",
                    help="write the COMPILED (post-optimization) HLO of the "
                         "profiled program to this file — per-fusion "
                         "diagnosis of the epilogue chains (cache-hit "
                         "compile, so this is cheap once traced)")
    args = ap.parse_args()

    from cosnet_tpu.models import create_model, init_variables
    from cosnet_tpu.utils.device import device_materialize

    if args.quantize:
        from cosnet_tpu.nn.quant import enable_int8

        enable_int8(min_in_channels=args.quantize_min_ci,
                    static=args.quantize == "int8-static")
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = create_model("resnet_aspp_add", coattention_backend="pallas",
                         dtype=dtype, remat=args.remat)
    variables = init_variables(model, n_inputs=4, hw=(64, 64))
    variables = device_materialize(jax.tree.map(jnp.asarray, variables))

    h, w = args.hw
    rng = np.random.default_rng(0)
    imgs = [jnp.asarray(rng.standard_normal((args.batch, h, w, c), dtype=np.float32))
            for c in (3, 3, 1, 1)]

    if args.quantize == "int8-static":
        from cosnet_tpu.nn import quant

        amax = quant.collect_amax(model, variables, tuple(imgs), train=False)
        variables = dict(variables, quant_scales=jax.tree.map(
            jnp.asarray, quant.scales_variables(amax)))
        n_ch = sum(v.size > 1 for v in amax.values())
        print(f"calibrated {len(amax)} conv sites (static int8 scales; "
              f"{n_ch} per-channel)")

    if args.multiref:
        from cosnet_tpu.eval.infer import build_multi_reference_forward

        r = args.multiref
        fwd_mr = build_multi_reference_forward(model, n_inputs=4, as_uint8=True)
        searches = jnp.asarray(rng.standard_normal((args.batch, r, h, w, 3), dtype=np.float32))
        s_depths = jnp.asarray(rng.standard_normal((args.batch, r, h, w, 1), dtype=np.float32))

        def run():
            return fwd_mr(variables, imgs[0], searches, imgs[2], s_depths)
    elif args.train:
        from cosnet_tpu.train.optim import GroupedSGD
        from cosnet_tpu.train.state import TrainState, make_train_step

        optimizer = GroupedSGD()
        state = TrainState.create(variables, optimizer)
        state = device_materialize(state)
        gts = jnp.asarray((rng.uniform(0, 1, (args.batch, h, w)) < 0.3).astype(np.float32))
        batch = {"target": imgs[0], "search_0": imgs[1], "target_depth": imgs[2],
                 "search_0_depth": imgs[3], "target_gt": gts, "search_0_gt": gts}
        step = jax.jit(make_train_step(model, optimizer))

        def run():
            nonlocal state
            state, loss = step(state, batch, 1e-4)
            return loss
    else:
        @jax.jit
        def fwd(v, a, b, da, db):
            x1, x2, _ = model.apply(v, a, b, da, db, train=False)
            return x1, x2

        def run():
            return fwd(variables, *imgs)

    float(jnp.sum(jax.tree.leaves(run())[0]))  # compile + warm
    if args.dump_hlo and not args.train and not args.multiref:
        with open(args.dump_hlo, "w") as f:
            f.write(fwd.lower(variables, *imgs).compile().as_text())
        print("compiled HLO written to", args.dump_hlo)
    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="xplane_")
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(args.steps):
            out = run()
        float(jnp.sum(jax.tree.leaves(out)[0]))  # force completion inside trace
    ms, rows = aggregate_xplane(trace_dir, args.steps)
    mode = f"multiref(R={args.multiref})" if args.multiref else ("train" if args.train else "eval")
    print(f"{mode} {h}x{w} batch {args.batch} {args.dtype}"
          f"{' remat' if args.remat else ''}: device step {ms:.1f} ms "
          f"({args.batch / ms * 1e3:.2f} frames/s/chip)")
    stats = jax.local_devices()[0].memory_stats() or {}
    if stats:
        gib = 1024 ** 3
        print(f"  HBM: peak {stats.get('peak_bytes_in_use', 0) / gib:.2f} GiB, "
              f"in use {stats.get('bytes_in_use', 0) / gib:.2f} GiB, "
              f"limit {stats.get('bytes_limit', 0) / gib:.2f} GiB")
    for v, n, c, ex in rows:
        print(f"  {v:8.2f} ms x{n:<4d} {c:<28s} {ex[:90]}")


if __name__ == "__main__":
    main()
