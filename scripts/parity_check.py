#!/usr/bin/env python
"""One-command accuracy-parity harness: reference torch vs cosnet-tpu.

Given an SBM-RGBD tree (real or synthetic) and optionally a ``.pth``
checkpoint, runs BOTH implementations on the SAME frames and reports
per-frame and mean soft-IoU (reference ``evaluation.py:3-21`` semantics) and
F-measure, plus their deltas. Exits non-zero when the F-measure delta
exceeds the BASELINE.md gate (0.5% absolute by default) — so the
north-star accuracy claim is verifiable the moment a real dataset exists:

    python scripts/parity_check.py --data-path /data/SBM-RGBD \\
        --checkpoint snapshot_sbmrgbd_199.pth --frames 8

Both models consume identical preprocessed arrays from the cosnet-tpu
loader (itself bit-exact vs the reference loader — tests/test_data.py), so
any disagreement is model-side. The reference model is executed on torch
CPU (~70 s/frame at 480×854 on a 1-core host: keep --frames small there).
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", required=True, help="SBM-RGBD dataset root")
    p.add_argument("--checkpoint", default=None,
                   help=".pth checkpoint loaded into BOTH models (omit: both "
                        "run the torch-seeded fresh init exported from torch)")
    p.add_argument("--frames", type=int, default=4, help="Number of frames to compare")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=640,
                   help="Model input geometry (reference config.yaml:193 uses 480x640)")
    p.add_argument("--sample-range", type=int, default=1)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="cosnet-tpu compute dtype (the torch side is always f32)")
    p.add_argument("--gate", type=float, default=0.005,
                   help="Max allowed |F-measure delta| (BASELINE.md: 0.5%%)")
    return p.parse_args()


def main():
    args = get_args()
    import warnings

    warnings.filterwarnings("ignore")
    import torch

    import jax
    import jax.numpy as jnp

    from cosnet_tpu.data import SbmRgbdDataset
    from cosnet_tpu.eval.metrics import compute_iou, f_measure
    from cosnet_tpu.models import create_model, init_variables
    from cosnet_tpu.utils.torch_import import (
        load_pth, merge_variables, state_dict_to_variables,
    )

    sys.path.insert(0, "/root/reference")
    from deeplab.residual_net import Bottleneck as RefB
    from rgbd_segmentation_RAA import RGBDSegmentation_RAA

    # --- identical inputs for both sides -------------------------------
    db = SbmRgbdDataset(
        args.data_path, sample_range=args.sample_range,
        output_HW=(args.height, args.width), for_training=False, batch_size=1,
        channels_for_target_frame="rgbdt", channels_for_counterpart_frame="rgbd",
    )
    n = min(args.frames, len(db))
    if n == 0:
        raise SystemExit(f"no eval frames found under {args.data_path}")
    print(f"comparing {n} frames at {args.height}x{args.width}, "
          f"sample_range={args.sample_range}")

    # --- torch reference ------------------------------------------------
    torch.manual_seed(0)
    ref = RGBDSegmentation_RAA(RefB, [3, 4, 23, 3], [3, 4, 6, 3], num_classes=1)
    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        sd = sd["model"] if "model" in sd else sd
        sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
        ref.load_state_dict(sd)  # STRICT — same load as reference test.py:228
        state_dict = sd
    else:
        state_dict = ref.state_dict()
    ref.eval()

    # --- cosnet-tpu with the SAME weights --------------------------------
    model = create_model(
        "resnet_aspp_add", coattention_backend="pallas" if jax.default_backend() == "tpu" else "einsum",
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    variables = init_variables(model, n_inputs=4)
    imported = state_dict_to_variables(state_dict)
    variables = {
        "params": merge_variables(variables["params"], imported["params"]),
        "batch_stats": merge_variables(variables["batch_stats"], imported["batch_stats"]),
    }
    variables = jax.tree.map(jnp.asarray, variables)

    @jax.jit
    def jax_fwd(v, a, b, da, db_):
        x1, _, _ = model.apply(v, a, b, da, db_, train=False)
        return x1

    rows = []
    for i in range(n):
        s = db[i]
        rgb_a = s["target"][None]          # [1, H, W, 3] float32, mean-subtracted
        rgb_b = s["search_0"][None]
        d_a = s["target_depth"][None]
        d_b = s["search_0_depth"][None]
        gt = np.asarray(s["target_gt"])

        t0 = time.time()
        with torch.no_grad():
            t1, _, _ = ref(*(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))) for x in (rgb_a, rgb_b, d_a, d_b)))
        torch_mask = (t1.numpy()[0, 0] * 255).astype(np.uint8)
        t_torch = time.time() - t0

        t0 = time.time()
        x1 = jax_fwd(variables, *(jnp.asarray(x) for x in (rgb_a, rgb_b, d_a, d_b)))
        ours_mask = (np.asarray(x1, dtype=np.float32)[0, :, :, 0] * 255).astype(np.uint8)
        t_ours = time.time() - t0

        row = {
            "seq": s["seq_name"], "frame": s["frame_index"],
            "iou_torch": compute_iou(torch_mask, gt), "iou_ours": compute_iou(ours_mask, gt),
            "f_torch": f_measure(torch_mask, gt), "f_ours": f_measure(ours_mask, gt),
            "mask_max_absdiff": int(np.abs(torch_mask.astype(np.int32) - ours_mask.astype(np.int32)).max()),
            "t_torch_s": t_torch, "t_ours_s": t_ours,
        }
        rows.append(row)
        print(f"  {row['seq']}/{row['frame']}: IoU {row['iou_torch']:.4f} vs {row['iou_ours']:.4f}  "
              f"F {row['f_torch']:.4f} vs {row['f_ours']:.4f}  maskΔmax {row['mask_max_absdiff']}  "
              f"({t_torch:.1f}s torch, {t_ours:.2f}s ours)")

    mean = lambda k: float(np.mean([r[k] for r in rows]))  # noqa: E731
    d_iou = abs(mean("iou_torch") - mean("iou_ours"))
    d_f = abs(mean("f_torch") - mean("f_ours"))
    print(f"\nmean soft-IoU: torch {mean('iou_torch'):.5f}  ours {mean('iou_ours'):.5f}  |Δ| {d_iou:.5f}")
    print(f"mean F-measure: torch {mean('f_torch'):.5f}  ours {mean('f_ours'):.5f}  |Δ| {d_f:.5f}")
    print(f"gate: |ΔF| <= {args.gate}  ->  {'PASS' if d_f <= args.gate else 'FAIL'}")
    sys.exit(0 if d_f <= args.gate else 1)


if __name__ == "__main__":
    main()
