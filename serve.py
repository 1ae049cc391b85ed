#!/usr/bin/env python
"""Sweep server: one process, weights resident, compiled once — every
subset/dataset evaluated without re-initialization.

The reference's sweep practice re-runs ``test.py`` per subset, paying model
build + checkpoint load + (for us) compilation every time
(``/root/reference/test.py:168-238``). This driver is the production shape
(ROADMAP #4): an :class:`EvalSession` holds the device-resident weight tree
and the jitted multi-reference forward; jobs stream through it back-to-back.
Same-geometry jobs reuse the compiled executable outright — job 2..N start
at steady-state throughput.

    python serve.py --datasets sbmrgbd --per-challenge --batch_size 8 \
        [--dtype bfloat16] [--data-parallel] [--out sweep.json]

``--per-challenge`` splits the sbmrgbd config subset into one job per
challenge (the reference's per-subset runs); without it each dataset is one
job (test.py already reports the per-challenge table within a run).
"""
import argparse
import datetime
import json
import os
import time


def get_arguments():
    p = argparse.ArgumentParser(description="RGBDCoAttention sweep server (TPU)")
    p.add_argument("--datasets", default="sbmrgbd",
                   help="comma-separated: sbmrgbd,hzfurgbd,hzfurgb,hzfud,davis")
    p.add_argument("--model", default="raa")
    p.add_argument("--gpus", type=str, default="0")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--coattention-backend", default="pallas")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard each job's eval batch over all TPU chips.")
    p.add_argument("--quantize", default="", choices=["", "int8", "int8-static"],
                   help="int8 trunk/ASPP convs (see test.py --quantize); "
                        "int8-static calibrates on the first job's first batch.")
    p.add_argument("--device-preprocess", action="store_true",
                   help="uint8 staging + on-device resize/mean-sub (sbmrgbd only).")
    p.add_argument("--frame-pool", type=float, default=0, metavar="MB",
                   help="Device-resident frame pool budget in MB (see test.py "
                        "--frame-pool; requires --device-preprocess; composes "
                        "with --data-parallel via per-shard device stacks).")
    p.add_argument("--device-metrics", action="store_true",
                   help="Score on device via bit-exact integer counters (see "
                        "test.py --device-metrics); 24 bytes/frame D2H instead "
                        "of the mask. Incompatible with --save_seg_img/--use_crf.")
    p.add_argument("--per-challenge", action="store_true",
                   help="One job per challenge of the sbmrgbd subset "
                        "(the reference's per-subset sweep, served resident).")
    p.add_argument("--use_crf", default="")
    p.add_argument("--save_seg_img", default="")
    p.add_argument("--shuffle", action="store_true",
                   help="Sweeps default to deterministic order (unlike test.py, "
                        "which preserves the reference's shuffle quirk).")
    p.add_argument("--sample-seed", type=int, default=None,
                   help="Seed counterpart-frame sampling (see test.py --sample-seed; "
                        "int8-static calibration amplifies unseeded sampling into "
                        "global scale shifts).")
    p.add_argument("--out", default="", help="Write the sweep summary JSON here.")
    return p.parse_args()


def main():
    args = get_arguments()
    ymd_hms = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")

    from cosnet_tpu.utils.platform import force_cpu_devices_from_env

    force_cpu_devices_from_env()  # COSNET_CPU_DEVICES=N: CPU-host drives / CI

    from cosnet_tpu import config as cfg
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset
    from cosnet_tpu.utils.cache import enable_compile_cache
    from cosnet_tpu.utils.logging import RunLogger

    enable_compile_cache()

    user_config = cfg.load_yaml("config.yaml")
    full_name = cfg.full_model_name(args.model)
    # Fail BEFORE the session builds/uploads weights: a mid-sweep SystemExit
    # from build_test_dataset would discard every completed job's results.
    datasets = [d.strip() for d in args.datasets.split(",") if d.strip()]
    bad = [d for d in datasets if d != "sbmrgbd"]
    if args.device_preprocess and bad:
        raise SystemExit(f"--device-preprocess supports sbmrgbd only "
                         f"(job list also has {', '.join(bad)})")
    result_dir = os.path.join(".", "vos_test_results", "sweep", full_name, ymd_hms)
    os.makedirs(result_dir, exist_ok=True)
    logger = RunLogger(os.path.join(result_dir, f"sweep__{full_name}_{ymd_hms}_log.txt"))
    print("Sweep logs in", result_dir)
    logger.section(str(vars(args)))

    if args.quantize == "int8":
        from cosnet_tpu.nn.quant import enable_int8

        enable_int8(min_in_channels=512)  # measured sweet spot, docs/PERF_r3.md
        print("=====> int8 quantized inference")
    elif args.quantize == "int8-static":
        from cosnet_tpu.nn.quant import enable_int8

        enable_int8(min_in_channels=int(os.environ.get("COSNET_INT8_MIN_CI", "64")),
                    static=True)
        print("=====> int8 quantized inference (static scales; calibrating per job)")
    pretrained = cfg.test_pretrained_params(user_config, full_name)
    t_init = time.time()
    session = EvalSession(
        full_name, coattention_backend=args.coattention_backend, dtype=args.dtype,
        pretrained=pretrained, data_parallel=args.data_parallel,
        device_indices=cfg.resolve_device_request(args.gpus),
    )
    init_s = time.time() - t_init
    if not session.pretrained_loaded:
        print(f"!! pretrained params not found at {pretrained!r} — serving fresh init")
    if session.mesh is not None:
        print(f"=====> data-parallel over {session.mesh.devices.size} chip(s)")

    # -- job list -----------------------------------------------------------
    jobs = []  # (job name, dataset name, ds_cfg, davis_subset_file)
    for dataset in datasets:
        ds_cfg, davis_subset_file = cfg.test_dataset_config(user_config, dataset)
        if args.per_challenge and ds_cfg.subset:
            by_challenge = {}
            for seq, ids in ds_cfg.subset.items():
                by_challenge.setdefault(seq.split("/")[0], {})[seq] = ids
            for chal in sorted(by_challenge):
                import dataclasses

                jobs.append((f"{dataset}/{chal}", dataset,
                             dataclasses.replace(ds_cfg, subset=by_challenge[chal]),
                             davis_subset_file))
        else:
            jobs.append((dataset, dataset, ds_cfg, davis_subset_file))

    apply_crf = str(args.use_crf).lower() in ("true", "1", "yes", "crf")
    summary = {"model": full_name, "dtype": args.dtype, "init_s": round(init_s, 2),
               "init_breakdown_s": session.init_breakdown,
               "data_parallel": bool(session.mesh is not None), "jobs": {}}
    print(f"=====> session init {init_s:.1f} s  {session.init_breakdown}")
    prev_amax = None  # previous job's calibrated ranges (clip telemetry)
    for name, dataset, ds_cfg, davis_subset_file in jobs:
        print(f"=====> job {name}: {len(ds_cfg.subset or {})} sequences"
              if ds_cfg.subset else f"=====> job {name}")
        logger.section(f"job {name}")
        # keep_remainder: serving scores EVERY frame — the reference's
        # len-truncation quirk would zero out challenges smaller than the
        # batch (e.g. 7-frame ColorCamouflage at batch 8); short batches are
        # padded back to the compiled geometry by the runner.
        db = build_test_dataset(dataset, ds_cfg, args.batch_size,
                                davis_subset_file=davis_subset_file,
                                raw_eval=args.device_preprocess,
                                keep_remainder=True,
                                sample_seed=args.sample_seed)
        if args.quantize == "int8-static":
            from cosnet_tpu.eval.runner import calibrate_static_int8
            from cosnet_tpu.nn.quant import amax_headroom

            # Re-calibrate on EVERY job's leading batches: scales live in the
            # session's variable tree as runtime inputs, so this reuses the
            # already-compiled executables outright (values change, the HLO
            # doesn't). Cross-dataset scale reuse silently clipped
            # out-of-distribution activations in round 4 (advisor finding):
            # sbmrgbd-calibrated ranges applied to hzfu jobs had no gate.
            calib_db = db if not args.device_preprocess else build_test_dataset(
                dataset, ds_cfg, args.batch_size,
                davis_subset_file=davis_subset_file, raw_eval=False,
                keep_remainder=True, sample_seed=args.sample_seed)
            amax = calibrate_static_int8(session, calib_db, args.batch_size)
            if prev_amax is not None:
                # clip telemetry: sites whose NEW observed range exceeds the
                # previous job's scale (would have clipped had we reused it)
                hr = amax_headroom()
                clipped = [k for k, v in amax.items()
                           if k in prev_amax and v.max() > prev_amax[k].max() * hr]
                print(f"=====> job {name}: recalibrated {len(amax)} int8 sites; "
                      f"{len(clipped)} would have clipped under the previous "
                      f"job's scales")
            else:
                print(f"=====> calibrated {len(amax)} int8 conv sites (job {name})")
            prev_amax = amax
        out_dir = None
        if args.save_seg_img:
            out_dir = os.path.join(result_dir, "obj_seg_imgs", name.replace("/", "_"))
        t0 = time.time()
        res = session.run(
            db, ds_cfg, logger,
            batch_size=args.batch_size,
            shuffle=args.shuffle,
            apply_crf=apply_crf,
            output_img_dir=out_dir,
            frame_pool_mb=args.frame_pool,
            print_progress=False,
            device_metrics=args.device_metrics,
        )
        res["wall_s"] = round(time.time() - t0, 2)
        summary["jobs"][name] = res
        iou = res["iou"]
        print(f"       {name}: frames={res['frames']} IoU={iou if iou is None else round(iou, 4)} "
              f"F={res['f_measure'] if res['f_measure'] is None else round(res['f_measure'], 4)} "
              f"fps={res['fps'] if res['fps'] is None else round(res['fps'], 2)} "
              f"({res['wall_s']} s)")

    scored = [j for j in summary["jobs"].values() if j["iou"] is not None]
    if scored:
        n = sum(j["frames"] for j in scored)
        summary["mean_iou"] = sum(j["iou"] * j["frames"] for j in scored) / n
        summary["mean_f_measure"] = sum(j["f_measure"] * j["frames"] for j in scored) / n
        summary["total_frames"] = n
        logger.write(f"##== sweep: {len(scored)} jobs, {n} frames, "
                     f"IOU: {summary['mean_iou']} F-measure: {summary['mean_f_measure']} ==##\n")
        print(f"=====> sweep IoU {summary['mean_iou']:.4f}  F {summary['mean_f_measure']:.4f} "
              f"over {n} frames in {len(scored)} jobs")
    logger.close()
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        print("summary written to", args.out)


if __name__ == "__main__":
    main()
