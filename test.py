#!/usr/bin/env python
"""Evaluation driver — reference CLI contract, TPU-native execution.

Usage matches the reference (``README.md:46``):
    python test.py --dataset sbmrgbd --model raa --gpus 0

Flow (reference ``test.py:168-344``): config.yaml → model by abbreviation →
pretrained ``.pth`` load → dataset loader → per frame: average the sigmoid
masks over ``sample_range`` reference frames — here batched into ONE jitted
forward (cosnet_tpu/eval/infer.py) instead of a host loop — → resize to
``output_WH`` → masks×255 uint8 → bitwise soft-IoU per frame (+ F-measure,
BASELINE.md) → per-sequence mask PNGs → final mean IoU, all in the
reference's log format. The model/weights/eval loop live in
cosnet_tpu/eval/runner.py (shared with the sweep server ``serve.py``).
"""
import argparse
import datetime
import os


def get_arguments():
    parser = argparse.ArgumentParser(description="RGBDCoAttention (TPU)")
    parser.add_argument("--dataset", type=str, default="sbmrgbd",
                        help="hzfud, hzfurgb, hzfurgbd, sbmrgbd, or davis")
    parser.add_argument("--cuda", default=True,
                        help="Kept for CLI compatibility; device is the TPU.")
    parser.add_argument("--gpus", type=str, default="0")
    parser.add_argument("--seq_name", default="bmx-bumps")
    parser.add_argument("--use_crf", default="",
                        help="Refine masks with dense-CRF mean field on device "
                             "(cosnet_tpu/eval/crf.py). The reference accepts this flag "
                             "but its pydensecrf path is commented out (test.py:38-39,76) "
                             "— default off preserves its actual output behavior; pass "
                             "true/1/yes/crf to enable the real thing.")
    # None sentinel: defaults to "True" (the reference behavior) unless
    # --device-metrics is given, which needs PNG output off and should work
    # as a bare flag; an EXPLICIT truthy --save_seg_img + --device-metrics
    # still fails fast below.
    parser.add_argument("--save_seg_img", default=None)
    parser.add_argument("--sample_range", default=5)
    parser.add_argument("--epoches", default=0)
    parser.add_argument("--batch_size", default=0, type=int)
    parser.add_argument("--model", default="raa",
                        help="ori, retrain, ref, raa, add, padd, conv_add, or conc")
    parser.add_argument("--coattention-backend", default="pallas",
                        help="pallas | einsum")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                        help="Activation/compute dtype. bfloat16 cuts HBM traffic on the "
                             "residual stream (~23%% faster on v5e); params and the final "
                             "mask decode stay float32; masks agree at uint8 scale "
                             "(tests/test_model_parity.py::test_bf16_inference_mask_parity).")
    parser.add_argument("--context-parallel", default="", choices=["", "ring", "ulysses"],
                        help="Shard the co-attention's spatial tokens over all TPU chips "
                             "(ring: chunks rotate over ICI with online-softmax combining; "
                             "ulysses: all-gather). For resolutions past one chip's memory.")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard the eval batch over all TPU chips (north-star config 5).")
    parser.add_argument("--no-shuffle", action="store_true",
                        help="Deterministic eval order. The reference shuffles its test "
                             "loader (test.py:246-255, a preserved quirk); this opts out "
                             "for reproducible sweeps.")
    parser.add_argument("--no-prefetch", action="store_true",
                        help="Disable double-buffered device prefetch (debugging).")
    parser.add_argument("--sample-seed", type=int, default=None,
                        help="Seed the counterpart-frame sampling (derived RNG). "
                             "Default None keeps the reference's unseeded test-time "
                             "sampling quirk; numerics gates pass a seed — int8-static "
                             "calibration amplifies counterpart randomness into global "
                             "scale shifts (0.02 IoU swings measured across identical "
                             "unseeded drives, docs/PERF_r5.md).")
    parser.add_argument("--quantize", default="", choices=["", "int8", "int8-static"],
                        help="Run the trunk/ASPP convs in int8 on the MXU (s8xs8->s32, "
                             "dynamic per-tensor activation scales, per-channel weight "
                             "scales — no calibration; same checkpoint). ~1.5-2.6x per "
                             "conv class on v5e (benchmarks/int8_probe.py); masks gated "
                             "vs f32 by tests/test_quant.py. Composes with --dtype "
                             "bfloat16 for the non-conv stream. 'int8-static' "
                             "additionally calibrates activation scales on the first "
                             "batch and bakes them in as constants: the requantize "
                             "folds into the conv/BN/ReLU epilogues (activations "
                             "stream between convs as int8) and the int8 coverage "
                             "threshold drops to COSNET_INT8_MIN_CI (default 64).")
    parser.add_argument("--device-preprocess", action="store_true",
                        help="Ship ROI-cropped SOURCE frames as uint8 and run the "
                             "resize + mean subtraction on device inside the jitted "
                             "forward (~10x fewer H2D bytes — the eval loop is "
                             "transfer-bound through the tunneled relay). cv2-exact "
                             "sample positions; masks gated bit-level by "
                             "tests/test_device_preprocess.py. sbmrgbd only.")
    parser.add_argument("--frame-pool", type=float, default=0, metavar="MB",
                        help="Device-resident frame pool budget in MB (requires "
                             "--device-preprocess). The eval protocol revisits every "
                             "frame ~sample_range extra times as a counterpart; the "
                             "pool ships each unique frame over the wire ONCE and "
                             "builds the batch stack on device. Composes with "
                             "--data-parallel: per-shard on-device stacks, cross-"
                             "device revisits move over ICI, never the host wire.")
    parser.add_argument("--device-metrics", action="store_true",
                        help="Score on device: the soft-IoU/F-measure reduce to six "
                             "integer counters computed inside the jit (bit-exact, "
                             "eval/metrics.py) — 24 bytes/frame cross the wire instead "
                             "of the 0.4 MB mask. Requires output_WH == model size; "
                             "incompatible with --use_crf and --save_seg_img (the "
                             "host never sees masks).")
    return parser.parse_args()


def main():
    args = get_arguments()
    if args.save_seg_img is None:  # resolve the sentinel before args are logged
        args.save_seg_img = "" if args.device_metrics else "True"
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
    ds_cfg, davis_subset_file = cfg.test_dataset_config(
        user_config, args.dataset, default_sample_range=args.sample_range)
    # The reference resolves config into args BEFORE logging (test.py:132),
    # so the ##==…==## section echoes the effective value, not the CLI default.
    args.sample_range = ds_cfg.sample_range
    batch_size = args.batch_size or 1

    result_dir = os.path.join(".", "vos_test_results", args.dataset, full_name, ymd_hms)
    os.makedirs(result_dir, exist_ok=True)
    logger = RunLogger(os.path.join(result_dir, f"{args.dataset}__{full_name}_{ymd_hms}_test_log.txt"))
    print("Logs will be written in", result_dir)
    logger.section(str(vars(args)))

    coattention_backend = args.coattention_backend
    if args.context_parallel:
        if args.data_parallel:
            raise SystemExit("--context-parallel and --data-parallel are exclusive "
                             "(CP shards tokens, DP shards the batch)")
        from cosnet_tpu.parallel import data_parallel_mesh
        from cosnet_tpu.parallel.context_parallel import enable_context_parallel

        cp_mesh = data_parallel_mesh(cfg.resolve_device_request(args.gpus))
        enable_context_parallel(cp_mesh, "data", chunk_backend=args.coattention_backend)
        coattention_backend = args.context_parallel
        print(f"=====> context-parallel ({args.context_parallel}) over {cp_mesh.devices.size} chip(s)")

    if args.quantize == "int8":
        from cosnet_tpu.nn.quant import enable_int8

        # trace-time switch: convs build as QuantConv; only the wide convs
        # quantize — blanket int8 pays a quantize pass per conv input that
        # costs more than narrow convs' MXU win (measured, docs/PERF_r3.md).
        enable_int8(min_in_channels=512)  # measured sweet spot, docs/PERF_r3.md
        print("=====> int8 quantized inference (dynamic activation scales)")
    elif args.quantize == "int8-static":
        from cosnet_tpu.nn.quant import enable_int8

        # Static scales remove the per-conv quantize pass (it fuses into the
        # producer epilogue), so the coverage threshold can drop below the
        # dynamic path's 512 sweet spot. Calibration happens on the first
        # batches below, after the dataset is built.
        enable_int8(min_in_channels=int(os.environ.get("COSNET_INT8_MIN_CI", "64")),
                    static=True)
        print("=====> int8 quantized inference (static calibrated scales)")

    pretrained = cfg.test_pretrained_params(user_config, full_name)
    session = EvalSession(
        full_name, coattention_backend=coattention_backend, dtype=args.dtype,
        pretrained=pretrained, data_parallel=args.data_parallel,
        device_indices=cfg.resolve_device_request(args.gpus),
    )
    if not session.pretrained_loaded:
        print(f"!! pretrained params not found at {pretrained!r} — evaluating fresh init")
    print(session.summary())  # reference prints a model summary (test.py:231-236)
    if session.mesh is not None:
        print(f"=====> eval sweep data-parallel over {session.mesh.devices.size} chip(s)")

    db_test = build_test_dataset(args.dataset, ds_cfg, batch_size, davis_subset_file,
                                 raw_eval=args.device_preprocess,
                                 sample_seed=args.sample_seed)
    print("======> test set size:", len(db_test) // batch_size)

    if args.quantize == "int8-static":
        from cosnet_tpu.eval.runner import calibrate_static_int8

        # Calibrate on the first HOST-PATH batches (raw mode stages uint8, so
        # it builds a float twin of the dataset just for these batches).
        calib_db = db_test if not args.device_preprocess else build_test_dataset(
            args.dataset, ds_cfg, batch_size, davis_subset_file, raw_eval=False,
            sample_seed=args.sample_seed)
        amax = calibrate_static_int8(session, calib_db, batch_size)
        print(f"=====> calibrated {len(amax)} int8 conv sites "
              f"(per-input-channel scales)")

    apply_crf = str(args.use_crf).lower() in ("true", "1", "yes", "crf")
    if apply_crf:
        print("=====> dense-CRF refinement on (mean-field, on-device)")

    output_img_dir = None
    if args.save_seg_img:
        output_img_dir = os.path.join(result_dir, "obj_seg_imgs")
        os.makedirs(output_img_dir, exist_ok=True)

    res = session.run(
        db_test, ds_cfg, logger,
        batch_size=batch_size,
        shuffle=not args.no_shuffle,
        apply_crf=apply_crf,
        output_img_dir=output_img_dir,
        no_prefetch=args.no_prefetch,
        frame_pool_mb=args.frame_pool,
        device_metrics=args.device_metrics,
    )
    if "ladder_ms_per_frame" in res:  # COSNET_EVAL_LADDER=1 attribution mode
        import json

        print("LADDER " + json.dumps(res["ladder_ms_per_frame"]), flush=True)
    logger.close()


if __name__ == "__main__":
    main()
