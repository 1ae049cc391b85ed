"""SBM-RGBD dataset: manifest scan, ROI masking, frame loading, pair sampling.

Capability parity with ``dataloaders/sbm_rgbd_loader.py`` (SURVEY.md §2):

* directory walk ``<root>/<challenge>/<seq>/{input,depth,groundtruth}``
  pairing frames by ground-truth id (``in%s.png``/``d%s.png``/``gt%s.png``,
  ``:393-468``);
* per-sequence ROI from ``ROI.bmp`` via the center-out boundary scan,
  applied as an inclusive crop before resize (``:432-438``, ``:604-663``);
* per-frame load: BGR − mean → ROI crop → resize → (train) synchronized
  crop/scale/flip augmentation; depth grayscale float; gt binarized {0,1}
  with nearest resize;
* pair-sampling protocol: target frame + ``sample_range`` random counterpart
  frames from the same sequence; ``sample_range < 1`` self-pairs
  (``:556-574``);
* ``__len__`` truncates to a batch multiple (``:581-588``, quirk preserved);
* depth/gt validation heuristics (``__validate_frame``, ``:294-338``);
* debug image dumps re-rendering what the network sees (``:671-694``).

Layout: arrays are returned **HWC** (rgb [H,W,3], depth [H,W,1], gt [H,W])
— the TPU-native layout; the reference returns CHW.
"""
from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from cosnet_tpu.data.augment import augment_frame
from cosnet_tpu.data.aug_state import AugRatios, derived_rng, derived_uniform
from cosnet_tpu.data.frame_cache import FrameCache, budget_from_env
from cosnet_tpu.data.manifest import FrameIndex, FrameRecord, split_index
from cosnet_tpu.data.roi import Boundary, crop_to_roi, find_roi

ROI_FILE_NAME = "ROI.bmp"
FOLDERS = {"rgb": "input", "depth": "depth", "gt": "groundtruth"}


class SbmRgbdDataset:
    def __init__(
        self,
        dataset_root: str,
        sample_range: int,
        output_HW: Optional[Tuple[int, int]] = None,
        channels_for_target_frame: str = "rgbdt",
        channels_for_counterpart_frame: str = "rgbdt",
        for_training: bool = True,
        batch_size: int = 1,
        subset_percentage: float = 0.8,
        subset: Optional[Dict[str, List[str]]] = None,
        meanval=(104.00699, 116.66877, 122.67892),
        seed: Optional[int] = None,
        static_shapes: bool = True,
        use_native: bool = False,
        augment_on_host: bool = True,
        log_func=None,
        output_dir_for_debug: Optional[str] = None,
        decode_cache_mb: Optional[float] = None,
        raw_eval: bool = False,
    ):
        """``raw_eval``: eval-only mode for the device-preprocess pipeline
        (data/device_preprocess.py): samples carry ROI-cropped SOURCE-res
        uint8 frames zero-padded to one static hull + their true (h, w) —
        ~10x fewer H2D bytes than preprocessed f32; resize/mean-sub run on
        device inside the jitted forward. GT stays host-processed at model
        resolution (it is only scored, never transferred)."""
        self.dataset_root = dataset_root
        self.sample_range = sample_range
        self.output_HW = tuple(output_HW) if output_HW else None
        self.channels_for_target_frame = channels_for_target_frame
        self.channels_for_counterpart_frame = channels_for_counterpart_frame
        self.for_training = for_training
        self.batch_size = batch_size
        self.meanval = np.array(meanval, dtype=np.float32)
        self.static_shapes = static_shapes
        if use_native:
            from cosnet_tpu.data import native as _native

            use_native = _native.available()
            self._native = _native if use_native else None
        else:
            self._native = None
        self.use_native = use_native
        self.augment_on_host = augment_on_host
        self.log_func = log_func
        self.output_dir_for_debug = output_dir_for_debug

        self.seed = seed
        self.rng = random.Random(seed) if seed is not None else random.Random()
        self._epoch = 0
        # Decoded-frame LRU (see frame_cache.py): the eval protocol re-decodes
        # each frame up to sample_range+1 times; decode→ROI→resize is
        # deterministic per (kind, frame), augmentation happens after.
        self._cache = FrameCache(budget_from_env(decode_cache_mb))
        if raw_eval and for_training:
            raise ValueError("raw_eval is an eval-only mode (augmentation needs host frames)")
        self.raw_eval = raw_eval
        self._raw_hull: Optional[Tuple[int, int]] = None  # lazy static pad size
        self.roi: Dict[str, Boundary] = {}
        self.source_hw: Dict[str, Tuple[int, int]] = {}  # seq -> ROI.bmp shape
        self.flip_prob_of_seqs: Dict[str, float] = {}
        self._ratios = AugRatios()  # thread-local: per-worker == per-batch

        self.entire = self._collect_file_list()
        self.index = split_index(self.entire, subset, subset_percentage, for_training, self.rng)

    # -- manifest -----------------------------------------------------------

    def _collect_file_list(self) -> FrameIndex:
        entire = FrameIndex()
        for challenge in sorted(os.listdir(self.dataset_root)):
            cpath = os.path.join(self.dataset_root, challenge)
            if not os.path.isdir(cpath):
                continue
            for seq_dir in sorted(os.listdir(cpath)):
                seq = os.path.join(challenge, seq_dir)
                listing = {}
                for kind, folder in FOLDERS.items():
                    p = os.path.join(self.dataset_root, seq, folder)
                    if not os.path.isdir(p):
                        listing = None
                        break
                    listing[kind] = set(os.listdir(p))
                if listing is None:
                    continue

                roi_path = os.path.join(self.dataset_root, seq, ROI_FILE_NAME)
                roi_img = cv2.imread(roi_path, cv2.IMREAD_GRAYSCALE)
                if roi_img is not None:
                    self.roi[seq] = find_roi(roi_img)
                    self.source_hw[seq] = roi_img.shape[:2]

                frames = []
                for gt_name in sorted(listing["gt"]):
                    if not gt_name.endswith(".png"):
                        continue
                    frame_id = gt_name[2:-4]  # gtXXXXXX.png -> XXXXXX
                    rgb_name = f"in{frame_id}.png"
                    depth_name = f"d{frame_id}.png"
                    if rgb_name in listing["rgb"] and depth_name in listing["depth"]:
                        frames.append(FrameRecord(seq, frame_id, rgb_name, depth_name, gt_name))
                if frames:
                    entire.add_sequence(seq, frames)
        return entire

    def _path(self, kind: str, frame: FrameRecord) -> str:
        name = {"rgb": frame.rgb_name, "depth": frame.depth_name, "gt": frame.gt_name}[kind]
        return os.path.join(self.dataset_root, frame.seq_name, FOLDERS[kind], name)

    # -- loading ------------------------------------------------------------

    def _log(self, msg: str):
        if self.log_func:
            self.log_func(msg)

    def _decode_rgb(self, frame: FrameRecord) -> np.ndarray:
        roi, out_hw = self.roi.get(frame.seq_name), self.output_HW
        img = cv2.imread(self._path("rgb", frame), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(self._path("rgb", frame))
        if self.use_native and out_hw is not None:
            # One fused native pass: ROI crop + bilinear resize + -mean
            # (mean subtraction commutes with bilinear resampling).
            return self._native.fused_crop_resize_meansub(img, roi, out_hw, self.meanval)
        img = img.astype(np.float32) - self.meanval  # BGR − mean (:609)
        img = np.stack([crop_to_roi(img[:, :, i], roi) for i in range(3)], axis=-1)
        if out_hw is not None:
            img = cv2.resize(img, (out_hw[1], out_hw[0]))
        return img

    def _decode_depth(self, frame: FrameRecord) -> np.ndarray:
        roi, out_hw = self.roi.get(frame.seq_name), self.output_HW
        img = cv2.imread(self._path("depth", frame), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(self._path("depth", frame))
        if self.use_native and out_hw is not None:
            return self._native.fused_crop_resize_meansub(img, roi, out_hw, None)[:, :, 0]
        img = crop_to_roi(img.astype(np.float32), roi)
        if out_hw is not None:
            img = cv2.resize(img, (out_hw[1], out_hw[0]))
        return img

    def _decode_gt(self, frame: FrameRecord) -> np.ndarray:
        roi, out_hw = self.roi.get(frame.seq_name), self.output_HW
        img = cv2.imread(self._path("gt", frame), cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(self._path("gt", frame))
        if self.use_native and out_hw is not None:
            return self._native.fused_crop_resize_nearest(img, roi, out_hw, binarize=True)
        img = (img != 0).astype(np.uint8)
        img = crop_to_roi(img, roi)
        if out_hw is not None:
            img = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
        return img

    # -- raw (device-preprocess) loading ------------------------------------

    def _decode_raw(self, kind: str, frame: FrameRecord) -> np.ndarray:
        """ROI-cropped source-resolution uint8 frame (no resize, no float)."""
        flag = cv2.IMREAD_COLOR if kind == "rgb" else cv2.IMREAD_GRAYSCALE
        img = cv2.imread(self._path(kind, frame), flag)
        if img is None:
            raise FileNotFoundError(self._path(kind, frame))
        return crop_to_roi(img, self.roi.get(frame.seq_name))

    def raw_hull(self) -> Tuple[int, int]:
        """Static (H, W) hull every cropped frame pads into — max crop size
        over ALL sequences of the tree (not just the active subset), so every
        subset/challenge job of a sweep shares ONE XLA compilation."""
        if self._raw_hull is None:
            h = w = 1
            for seq in self.entire.sequences:
                if seq in self.source_hw:
                    sh, sw = self.source_hw[seq]
                else:  # no ROI.bmp: source size from one decoded frame
                    probe = self._decode_raw("depth", self.entire.frames_of(seq)[0])
                    self.source_hw[seq] = probe.shape[:2]
                    sh, sw = probe.shape[:2]
                roi = self.roi.get(seq)
                if roi is not None:
                    (x_lo, x_hi), (y_lo, y_hi) = roi
                    sh = min(y_hi + 1 - y_lo, sh)
                    sw = min(x_hi + 1 - x_lo, sw)
                h, w = max(h, sh), max(w, sw)
            self._raw_hull = (h, w)
        return self._raw_hull

    def _raw_frame(self, frame: FrameRecord, with_gt: bool):
        """(rgb u8 [Hh,Wh,3] padded, depth u8 [Hh,Wh] padded, hw i32 [2],
        gt [H,W] u8 at model res or None)."""
        hh, wh = self.raw_hull()
        rgb = self._cache.get_or_build(("rgb_raw", frame.seq_name, frame.rgb_name),
                                       lambda: self._decode_raw("rgb", frame))
        depth = self._cache.get_or_build(("d_raw", frame.seq_name, frame.depth_name),
                                         lambda: self._decode_raw("depth", frame))
        h, w = rgb.shape[:2]
        rgb_p = np.zeros((hh, wh, 3), np.uint8)
        rgb_p[:h, :w] = rgb
        d_p = np.zeros((hh, wh), np.uint8)
        d_p[:h, :w] = depth[:h, :w]
        gt = None
        if with_gt:
            gt = self._cache.get_or_build(("t", frame.seq_name, frame.gt_name),
                                          lambda: self._decode_gt(frame))
        return rgb_p, d_p, np.asarray([h, w], np.int32), gt

    def load_frame(self, frame: FrameRecord, channels: str = "rgbdt", rng=None):
        """Returns (rgb [H,W,3] f32, depth [H,W,1] f32, gt [H,W] u8)."""
        out_hw = self.output_HW
        train = self.for_training and self.augment_on_host
        offset = None
        rng = rng if rng is not None else self.rng
        cached = self._cache.get_or_build

        if train:
            flip_p = self._flip_prob(frame.seq_name)
            static = out_hw if self.static_shapes else None

        if "rgb" in channels:
            img = cached(("rgb", frame.seq_name, frame.rgb_name), lambda: self._decode_rgb(frame))
            if train:
                img, offset = augment_frame(
                    img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, static_hw=static
                )
            rgb = np.ascontiguousarray(img, dtype=np.float32)
        else:
            rgb = np.zeros((1, 1, 3), dtype=np.float32)

        if "d" in channels:
            img = cached(("d", frame.seq_name, frame.depth_name), lambda: self._decode_depth(frame))
            if train:
                img, offset = augment_frame(
                    img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, static_hw=static
                )
            depth = np.ascontiguousarray(img, dtype=np.float32)[:, :, None]
        else:
            depth = np.zeros((1, 1, 1), dtype=np.float32)

        if "t" in channels:
            img = cached(("t", frame.seq_name, frame.gt_name), lambda: self._decode_gt(frame))
            if train:
                img, offset = augment_frame(
                    img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, nearest=True, static_hw=static
                )
            gt = np.ascontiguousarray(img, dtype=np.uint8)
        else:
            gt = np.zeros((1, 1), dtype=np.uint8)

        if self.output_dir_for_debug:
            self._debug_dump(frame, rgb, depth, gt, channels)
        return rgb, depth, gt

    def _debug_dump(self, frame, rgb, depth, gt, channels):
        from cosnet_tpu.data.debug_dump import dump_frame_images

        dump_frame_images(self.output_dir_for_debug, frame.seq_name,
                          frame.rgb_name, frame.depth_name, frame.gt_name,
                          rgb, depth, gt, channels, self.meanval)

    # -- dataset protocol ---------------------------------------------------


    def _sample_rng(self, frame_index: int):
        """Per-sample RNG: deterministic (independent of worker scheduling)
        when the dataset has an explicit seed; the shared Random otherwise
        (reference semantics)."""
        if self.seed is not None:
            return derived_rng(self.seed, "sample", self._epoch, frame_index)
        return self.rng

    def _flip_prob(self, seq_name: str) -> float:
        if self.seed is not None:
            return derived_uniform(self.seed, "flip", self._epoch, seq_name)
        return self.flip_prob_of_seqs.setdefault(seq_name, self.rng.uniform(0, 1))

    def __len__(self):
        n = len(self.index)
        if self.batch_size and n % self.batch_size != 0:
            n -= n % self.batch_size  # reference truncation quirk (:581-588)
        return n

    def __getitem__(self, frame_index: int):
        frame = self.index.frames[frame_index]
        rng = self._sample_rng(frame_index)
        sample = {"seq_name": frame.seq_name, "frame_index": frame.frame_id}
        if self.raw_eval:
            rgb, depth, hw, gt = self._raw_frame(frame, with_gt=True)
            sample["target"], sample["target_depth"], sample["target_hw"] = rgb, depth, hw
            sample["target_gt"] = gt
        else:
            rgb, depth, gt = self.load_frame(frame, self.channels_for_target_frame, rng=rng)
            sample["target"], sample["target_depth"], sample["target_gt"] = rgb, depth, gt

        lo, hi = self.index.ranges[frame.seq_name]
        if self.sample_range >= 1:
            candidates = list(range(lo, hi))
            if self.sample_range <= len(candidates):
                picks = rng.sample(candidates, self.sample_range)
            else:
                # Sequence shorter than sample_range: sample with replacement
                # (the reference's random.sample would raise here).
                picks = rng.choices(candidates, k=self.sample_range)
        else:
            picks = [frame_index]  # self-pair (:562-563)
        for i, idx in enumerate(picks):
            cp = self.index.frames[idx]
            if self.raw_eval:
                c_rgb, c_depth, c_hw, _ = self._raw_frame(cp, with_gt=False)
                sample[f"search_{i}"] = c_rgb
                sample[f"search_{i}_depth"] = c_depth
                sample[f"search_{i}_hw"] = c_hw
                # frame identity for the device-side frame pool (runner):
                # raw frames are augmentation-free, so (seq, id) keys a
                # bit-identical array on every visit
                sample[f"search_{i}_id"] = cp.frame_id
            else:
                c_rgb, c_depth, c_gt = self.load_frame(cp, self.channels_for_counterpart_frame, rng=rng)
                sample[f"search_{i}"] = c_rgb
                sample[f"search_{i}_depth"] = c_depth
                sample[f"search_{i}_gt"] = c_gt
        return sample

    def next_batch(self, batch_index=None):
        """Redraw per-batch crop/scale ratios (reference :700-703); state is
        thread-local so concurrent batch workers cannot leak ratios. With a
        seeded dataset and a batch index, ratios derive deterministically
        from (seed, epoch, batch_index) — scheduling-independent."""
        if batch_index is not None and getattr(self, "seed", None) is not None:
            self._ratios.redraw(derived_rng(self.seed, "ratios", getattr(self, "_epoch", 0), batch_index))
        else:
            self._ratios.redraw(self.rng)

    def new_training_epoch(self):
        self._epoch += 1
        self.flip_prob_of_seqs.clear()

    # -- validation heuristics (reference :294-338) -------------------------

    def validate_frame(self, frame: FrameRecord, channels: str = "dt") -> dict:
        """Flag empty/noisy/flat depth maps and degenerate GT masks."""
        was_training = self.for_training
        self.for_training = False
        try:
            _, depth, gt = self.load_frame(frame, channels)
        finally:
            self.for_training = was_training
        depth = depth[:, :, 0]
        result = {"depth": [None, None, None], "gt": [None]}

        if "t" in channels:
            nz = np.count_nonzero(gt) / gt.size
            if nz < 0.01 or nz > 0.9:
                result["gt"][0] = nz

        if "d" in channels:
            nz = np.count_nonzero(depth) / depth.size
            if nz < 0.1:
                result["depth"][0] = nz
            dmin, dmax = float(depth.min()), float(depth.max())
            bins = int(dmax - dmin)
            if bins > 0:
                hist, _ = np.histogram(depth, bins)
                frac = hist.min() / max(hist.sum(), 1)
                if frac <= 0.0005:
                    result["depth"][1] = frac
            if dmax - dmin < 20:
                result["depth"][2] = dmax - dmin
        return result
