"""HZFU-RGBD dataset (Fu et al. RGBD video segmentation benchmark).

Capability parity with ``dataloaders/hzfu_rgbd_loader.py`` (SURVEY.md §2):

* layout ``RGB_data/<seq>/XX.png``, ``Depth_data/<seq>/XX.mat``,
  ``Label/<seq>/XX_obj_Y.png``;
* gt pairing by the 2-char frame id with the first-salient-object rule
  (the first ``XX_obj_*`` seen per id wins, ``:254-287``);
* depth from ``.mat`` via h5py key ``depth``: transpose, nearest resize,
  min-max normalize to [0, 255] (``:486-507``);
* channel selectors: when a frame's channels exclude rgb but include depth,
  the depth map is replicated into 3 channels minus the BGR mean
  (``_use_depth_as_rgb``, ``:388-398``) — used by the ``hzfud`` eval mode;
* split modes ``frame_in_out`` (per-sequence percentage) and
  ``sequence_in_out`` (whole sequences in or out, ``:324-369``);
* rgb pipeline order differs from SBM: resize → −mean (no ROI), and gt is
  resized *before* binarization (``:516-571``) — both preserved.
"""
from __future__ import annotations

import math
import os
import random
from typing import Dict, List, Optional, Tuple

import cv2
import h5py
import numpy as np

from cosnet_tpu.data.augment import augment_frame
from cosnet_tpu.data.aug_state import AugRatios, derived_rng, derived_uniform
from cosnet_tpu.data.frame_cache import FrameCache, budget_from_env
from cosnet_tpu.data.manifest import FrameIndex, FrameRecord

FOLDERS = {"rgb": "RGB_data", "depth": "Depth_data", "gt": "Label"}


class HzfuRgbdDataset:
    def __init__(
        self,
        dataset_root: str,
        sample_range: int,
        output_HW: Optional[Tuple[int, int]] = None,
        channels_for_target_frame: str = "rgbdt",
        channels_for_counterpart_frame: str = "rgbdt",
        for_training: bool = True,
        subset_percentage: float = 0.8,
        subset: Optional[Dict[str, List[str]]] = None,
        batch_size: int = 1,
        meanval=(104.00699, 116.66877, 122.67892),
        seed: Optional[int] = None,
        static_shapes: bool = True,
        split_method: str = "frame_in_out",
        use_native: bool = False,
        augment_on_host: bool = True,
        output_dir_for_debug: Optional[str] = None,
        decode_cache_mb: Optional[float] = None,
    ):
        self.dataset_root = dataset_root
        self.sample_range = sample_range
        self.output_HW = tuple(output_HW) if output_HW else None
        self.channels_for_target_frame = channels_for_target_frame
        self.channels_for_counterpart_frame = channels_for_counterpart_frame
        self.for_training = for_training
        self.batch_size = batch_size
        self.meanval = np.array(meanval, dtype=np.float32)
        self.static_shapes = static_shapes
        self.output_dir_for_debug = output_dir_for_debug
        if use_native:
            from cosnet_tpu.data import native as _native

            use_native = _native.available()
            self._native = _native if use_native else None
        else:
            self._native = None
        self.use_native = use_native
        self.augment_on_host = augment_on_host

        self.seed = seed
        self.rng = random.Random(seed) if seed is not None else random.Random()
        self._epoch = 0
        self.flip_prob_of_seqs: Dict[str, float] = {}
        self.depth_min_max: Dict[str, List[float]] = {}
        self._ratios = AugRatios()  # thread-local: per-worker == per-batch
        # Decoded-frame LRU (frame_cache.py): eval revisits each frame up to
        # sample_range+1 times; decode→resize→normalize is deterministic per
        # (kind, frame). The per-seq min/max bookkeeping runs on first decode
        # only — idempotent, since a frame's dmin/dmax never change.
        self._cache = FrameCache(budget_from_env(decode_cache_mb))

        self.entire = self._load_meta_data()
        self.index = self._split(subset, subset_percentage, split_method)

    # -- manifest -----------------------------------------------------------

    def _load_meta_data(self) -> FrameIndex:
        entire = FrameIndex()
        rgb_root = os.path.join(self.dataset_root, FOLDERS["rgb"])
        for seq in sorted(os.listdir(rgb_root)):
            rgb_dir = os.path.join(self.dataset_root, FOLDERS["rgb"], seq)
            depth_dir = os.path.join(self.dataset_root, FOLDERS["depth"], seq)
            gt_dir = os.path.join(self.dataset_root, FOLDERS["gt"], seq)
            if not (os.path.isdir(rgb_dir) and os.path.isdir(depth_dir) and os.path.isdir(gt_dir)):
                continue
            rgb_names = sorted(os.listdir(rgb_dir))
            depth_names = sorted(os.listdir(depth_dir))
            gt_names = sorted(os.listdir(gt_dir))

            frames = []
            seen_ids = set()
            # gt names are XX_obj_Y.png; first object per frame id wins.
            for gt_name in gt_names:
                fid = gt_name[:2]
                if fid in seen_ids:
                    continue
                seen_ids.add(fid)
                rgb_name = next((n for n in rgb_names if n.startswith(fid)), None)
                depth_name = next((n for n in depth_names if n.startswith(fid)), None)
                if rgb_name and depth_name:
                    frames.append(FrameRecord(seq, fid, rgb_name, depth_name, gt_name))
            if frames:
                entire.add_sequence(seq, frames)
        return entire

    def _split(self, subset, subset_percentage, split_method) -> FrameIndex:
        out = FrameIndex()
        if subset and isinstance(subset, dict):
            by_key = {(f.seq_name, f.frame_id): f for f in self.entire.frames}
            for seq, names in subset.items():
                ids = [n[:2] for n in names]  # gt filenames -> 2-char ids (:309)
                frames = [by_key[(seq, i)] for i in ids if (seq, i) in by_key]
                out.add_sequence(seq, frames)
            return out

        if split_method == "sequence_in_out":
            for seq in self.entire.sequences:
                frames = self.entire.frames_of(seq)
                if self.rng.random() < subset_percentage:
                    out.add_sequence(seq, frames)
            return out

        # frame_in_out (default)
        for seq in self.entire.sequences:
            frames = self.entire.frames_of(seq)
            if len(frames) < 2 and self.for_training:
                continue
            num = int(math.floor(len(frames) * subset_percentage))
            if num < 2 and self.for_training:
                num = 2
            selected = frames if num >= len(frames) else self.rng.sample(frames, num)
            out.add_sequence(seq, selected)
        return out

    # -- loading ------------------------------------------------------------

    def _load_mat_depth(self, path: str) -> Tuple[np.ndarray, float, float]:
        with h5py.File(path, "r") as f:
            depth = np.array(f["depth"], dtype=np.float32).T  # stored transposed (:492-493)
        if self.output_HW is not None:
            depth = cv2.resize(depth, (self.output_HW[1], self.output_HW[0]), interpolation=cv2.INTER_NEAREST)
        depth = depth.astype(np.float32)
        dmin, dmax = float(depth.min()), float(depth.max())
        depth = (depth - dmin) * 255.0 / (dmax - dmin)  # min-max normalize (:505)
        return depth, dmin, dmax

    def _decode_depth(self, frame: FrameRecord) -> np.ndarray:
        path = os.path.join(self.dataset_root, FOLDERS["depth"], frame.seq_name, frame.depth_name)
        d2d, dmin, dmax = self._load_mat_depth(path)
        mm = self.depth_min_max.setdefault(frame.seq_name, [dmin, dmax])
        mm[0] = max(mm[0], dmin)  # reference bookkeeping (:544-550)
        mm[1] = min(mm[1], dmax)
        return d2d

    def _decode_rgb(self, frame: FrameRecord) -> np.ndarray:
        out_hw = self.output_HW
        path = os.path.join(self.dataset_root, FOLDERS["rgb"], frame.seq_name, frame.rgb_name)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        if self.use_native and out_hw is not None:
            # Fused native path (±1 intensity vs the reference's lossy
            # u8→u8 cv2 resize, which rounds before the mean subtraction).
            img = self._native.fused_crop_resize_meansub(img, None, out_hw, None)
            return np.rint(img) - self.meanval
        if out_hw is not None:
            img = cv2.resize(img, (out_hw[1], out_hw[0]))
        return img.astype(np.float32) - self.meanval  # resize THEN -mean (:521-525)

    def _decode_gt(self, frame: FrameRecord) -> np.ndarray:
        out_hw = self.output_HW
        path = os.path.join(self.dataset_root, FOLDERS["gt"], frame.seq_name, frame.gt_name)
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        if out_hw is not None:
            img = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
        return (img != 0).astype(np.uint8)  # resize then binarize (:567-570)

    def load_frame(self, frame: FrameRecord, channels: str, rng=None):
        out_hw = self.output_HW
        train = self.for_training and self.augment_on_host
        offset = None
        rng = rng if rng is not None else self.rng
        cached = self._cache.get_or_build
        if train:
            flip_p = self._flip_prob(frame.seq_name)
            static = out_hw if self.static_shapes else None

        rgb = np.zeros((1, 1, 3), dtype=np.float32)
        depth = np.zeros((1, 1, 1), dtype=np.float32)
        gt = np.zeros((1, 1), dtype=np.uint8)

        if "d" in channels:
            d2d = cached(("d", frame.seq_name, frame.depth_name), lambda: self._decode_depth(frame))
            if train:
                d2d, offset = augment_frame(
                    d2d, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, static_hw=static
                )
            depth = np.ascontiguousarray(d2d, dtype=np.float32)[:, :, None]

        if "rgb" in channels:
            img = cached(("rgb", frame.seq_name, frame.rgb_name), lambda: self._decode_rgb(frame))
            if train:
                img, offset = augment_frame(
                    img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, static_hw=static
                )
            rgb = np.ascontiguousarray(img, dtype=np.float32)
        elif "d" in channels:
            # depth replicated as rgb minus mean (:388-398)
            d2d = depth[:, :, 0]
            rgb = np.stack([d2d, d2d, d2d], axis=-1) - self.meanval
            rgb = np.ascontiguousarray(rgb, dtype=np.float32)

        if "t" in channels:
            img = cached(("t", frame.seq_name, frame.gt_name), lambda: self._decode_gt(frame))
            if train:
                img, offset = augment_frame(
                    img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, nearest=True, static_hw=static
                )
            gt = np.ascontiguousarray(img, dtype=np.uint8)

        if self.output_dir_for_debug:
            self._debug_dump(frame, rgb, depth, gt, channels)
        return rgb, depth, gt

    def _debug_dump(self, frame, rgb, depth, gt, channels):
        """Re-render what the network sees (reference hzfu loader :407-429)."""
        from cosnet_tpu.data.debug_dump import dump_frame_images

        dump_frame_images(self.output_dir_for_debug, frame.seq_name,
                          f"{frame.frame_id}_rgb", f"{frame.frame_id}_depth",
                          f"{frame.frame_id}_gt", rgb, depth, gt, channels, self.meanval)

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
            n -= n % self.batch_size
        return n

    def __getitem__(self, frame_index: int):
        frame = self.index.frames[frame_index]
        rng = self._sample_rng(frame_index)
        sample = {"seq_name": frame.seq_name, "frame_index": frame.frame_id}
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
            picks = [frame_index]
        for i, idx in enumerate(picks):
            cp = self.index.frames[idx]
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
