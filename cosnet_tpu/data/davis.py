"""DAVIS-2016 dataset — the original COSNet training/eval corpus.

The reference's DAVIS loader (``dataloaders.PairwiseImg_test``, imported at
``test.py:28``) is **absent from the snapshot**; only its config contract
survives (``config.yaml:39-53``: ``JPEGImages/480p/<seq>/*.jpg`` +
``Annotations/480p/<seq>/*.png``, a ``subset_file``/``val.txt`` listing
sequence names, ``output_HW '480,854'``, and the standard BGR mean). This
loader re-derives it for the RGB-only co-attention models (``ori``/``ref``):
same sample-dict contract as the RGBD loaders with zero-filled depth
channels, same pair-sampling protocol, same augmentation sharing protocol.
"""
from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import cv2
import numpy as np

from cosnet_tpu.data.augment import augment_frame
from cosnet_tpu.data.aug_state import AugRatios, derived_rng, derived_uniform
from cosnet_tpu.data.frame_cache import FrameCache, budget_from_env
from cosnet_tpu.data.manifest import FrameIndex, FrameRecord


class DavisDataset:
    def __init__(
        self,
        dataset_root: str,
        sample_range: int,
        output_HW: Optional[Tuple[int, int]] = None,
        for_training: bool = True,
        batch_size: int = 1,
        subset_file: Optional[str] = None,
        sequences: Optional[List[str]] = None,
        meanval=(104.00699, 116.66877, 122.67892),
        seed: Optional[int] = None,
        static_shapes: bool = True,
        augment_on_host: bool = True,
        resolution: str = "480p",
        decode_cache_mb: Optional[float] = None,
    ):
        self.dataset_root = dataset_root
        self.sample_range = sample_range
        self.output_HW = tuple(output_HW) if output_HW else None
        self.for_training = for_training
        self.batch_size = batch_size
        self.meanval = np.array(meanval, dtype=np.float32)
        self.static_shapes = static_shapes
        self.augment_on_host = augment_on_host
        self.resolution = resolution

        self.seed = seed
        self.rng = random.Random(seed) if seed is not None else random.Random()
        self._epoch = 0
        self.flip_prob_of_seqs = {}
        self._ratios = AugRatios()  # thread-local: per-worker == per-batch
        # Decoded-frame LRU (frame_cache.py): eval revisits each frame up to
        # sample_range+1 times; decode→resize is deterministic per frame.
        self._cache = FrameCache(budget_from_env(decode_cache_mb))

        if sequences is None and subset_file and os.path.isfile(subset_file):
            with open(subset_file) as f:
                sequences = [ln.strip().split("/")[0] if "/" in ln else ln.strip() for ln in f if ln.strip()]
            # val.txt lists image paths; train_seqs.txt lists sequence names.
            sequences = sorted({s.split(os.sep)[-2] if s.endswith((".jpg", ".png")) else s for s in sequences})
        self.index = self._scan(sequences)

    def _img_dir(self, seq):
        return os.path.join(self.dataset_root, "JPEGImages", self.resolution, seq)

    def _ann_dir(self, seq):
        return os.path.join(self.dataset_root, "Annotations", self.resolution, seq)

    def _scan(self, sequences) -> FrameIndex:
        index = FrameIndex()
        root = os.path.join(self.dataset_root, "JPEGImages", self.resolution)
        seqs = sequences if sequences else (sorted(os.listdir(root)) if os.path.isdir(root) else [])
        for seq in seqs:
            img_dir, ann_dir = self._img_dir(seq), self._ann_dir(seq)
            if not (os.path.isdir(img_dir) and os.path.isdir(ann_dir)):
                continue
            anns = {os.path.splitext(n)[0] for n in os.listdir(ann_dir) if n.endswith(".png")}
            frames = []
            for name in sorted(os.listdir(img_dir)):
                fid, ext = os.path.splitext(name)
                if ext.lower() not in (".jpg", ".jpeg", ".png") or fid not in anns:
                    continue
                frames.append(FrameRecord(seq, fid, name, "", f"{fid}.png"))
            if len(frames) >= (2 if self.for_training else 1):
                index.add_sequence(seq, frames)
        return index

    def _decode_rgb(self, frame: FrameRecord) -> np.ndarray:
        img = cv2.imread(os.path.join(self._img_dir(frame.seq_name), frame.rgb_name), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(frame.rgb_name)
        img = img.astype(np.float32) - self.meanval
        if self.output_HW is not None:
            img = cv2.resize(img, (self.output_HW[1], self.output_HW[0]))
        return img

    def _decode_gt(self, frame: FrameRecord) -> np.ndarray:
        g = cv2.imread(os.path.join(self._ann_dir(frame.seq_name), frame.gt_name), cv2.IMREAD_GRAYSCALE)
        if g is None:
            raise FileNotFoundError(frame.gt_name)
        g = (g != 0).astype(np.uint8)
        if self.output_HW is not None:
            g = cv2.resize(g, (self.output_HW[1], self.output_HW[0]), interpolation=cv2.INTER_NEAREST)
        return g

    def load_frame(self, frame: FrameRecord, with_gt: bool = True, rng=None):
        out_hw = self.output_HW
        train = self.for_training and self.augment_on_host
        offset = None
        rng = rng if rng is not None else self.rng
        if train:
            flip_p = self._flip_prob(frame.seq_name)
            static = out_hw if self.static_shapes else None

        img = self._cache.get_or_build(
            ("rgb", frame.seq_name, frame.rgb_name), lambda: self._decode_rgb(frame))
        if train:
            img, offset = augment_frame(img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, static_hw=static)
        rgb = np.ascontiguousarray(img, dtype=np.float32)

        gt = np.zeros((1, 1), dtype=np.uint8)
        if with_gt:
            g = self._cache.get_or_build(
                ("t", frame.seq_name, frame.gt_name), lambda: self._decode_gt(frame))
            if train:
                g, offset = augment_frame(g, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, rng, nearest=True, static_hw=static)
            gt = np.ascontiguousarray(g, dtype=np.uint8)
        return rgb, gt


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
        zero_depth = np.zeros((1, 1, 1), dtype=np.float32)
        sample = {"seq_name": frame.seq_name, "frame_index": frame.frame_id}
        rgb, gt = self.load_frame(frame, rng=rng)
        sample["target"], sample["target_depth"], sample["target_gt"] = rgb, zero_depth, gt

        lo, hi = self.index.ranges[frame.seq_name]
        if self.sample_range >= 1:
            candidates = list(range(lo, hi))
            if self.sample_range <= len(candidates):
                picks = rng.sample(candidates, self.sample_range)
            else:
                picks = rng.choices(candidates, k=self.sample_range)
        else:
            picks = [frame_index]
        for i, idx in enumerate(picks):
            cp_rgb, cp_gt = self.load_frame(self.index.frames[idx], rng=rng)
            sample[f"search_{i}"] = cp_rgb
            sample[f"search_{i}_depth"] = zero_depth
            sample[f"search_{i}_gt"] = cp_gt
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
