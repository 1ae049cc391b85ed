"""Saliency image datasets (DUTS-TR / MSRA10K) for co-attention pretraining.

The reference carries the config plumbing for saliency datasets
(``config.yaml:114-123``, ``train.py:154`` stores the path; a dead branch at
``train.py:166-169`` hints at alternating salient-object steps) but ships no
loader. Re-derived: ``<root>/<dataset>/Imgs/*.jpg`` + ``Masks/*.png`` image/
mask pairs; samples are **self-pairs** (the frame is its own co-attention
counterpart — the standard way COSNet pretrains the attention on static
saliency data).
"""
from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import cv2
import numpy as np

from cosnet_tpu.data.augment import augment_frame
from cosnet_tpu.data.aug_state import AugRatios, derived_rng


class SaliencyDataset:
    def __init__(
        self,
        root_path: str,
        datasets: dict,  # {"DUTS-TR": {"images": "...", "masks": "..."}, ...}
        output_HW: Optional[Tuple[int, int]] = None,
        for_training: bool = True,
        batch_size: int = 1,
        meanval=(104.00699, 116.66877, 122.67892),
        seed: Optional[int] = None,
        static_shapes: bool = True,
    ):
        self.root_path = root_path
        self.output_HW = tuple(output_HW) if output_HW else None
        self.for_training = for_training
        self.batch_size = batch_size
        self.meanval = np.array(meanval, dtype=np.float32)
        self.static_shapes = static_shapes
        self.seed = seed
        self.rng = random.Random(seed) if seed is not None else random.Random()
        self.flip_prob = {}
        self._ratios = AugRatios()  # thread-local: per-worker == per-batch

        self.items: List[Tuple[str, str, str]] = []  # (name, img_path, mask_path)
        for name, spec in (datasets or {}).items():
            img_dir = os.path.join(root_path, spec["images"])
            mask_dir = os.path.join(root_path, spec["masks"])
            if not (os.path.isdir(img_dir) and os.path.isdir(mask_dir)):
                continue
            masks = {os.path.splitext(n)[0]: n for n in os.listdir(mask_dir)}
            for img_name in sorted(os.listdir(img_dir)):
                stem = os.path.splitext(img_name)[0]
                if stem in masks:
                    self.items.append((f"{name}/{stem}", os.path.join(img_dir, img_name), os.path.join(mask_dir, masks[stem])))

    def __len__(self):
        n = len(self.items)
        if self.batch_size and n % self.batch_size != 0:
            n -= n % self.batch_size
        return n

    def __getitem__(self, idx: int):
        name, img_path, mask_path = self.items[idx]
        train = self.for_training
        offset = None
        if train:
            flip_p = self.flip_prob.setdefault(name, self.rng.uniform(0, 1))
            static = self.output_HW if self.static_shapes else None

        img = cv2.imread(img_path, cv2.IMREAD_COLOR).astype(np.float32) - self.meanval
        if self.output_HW is not None:
            img = cv2.resize(img, (self.output_HW[1], self.output_HW[0]))
        if train:
            img, offset = augment_frame(img, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, self.rng, static_hw=static)
        rgb = np.ascontiguousarray(img, dtype=np.float32)

        gt = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        gt = (gt != 0).astype(np.uint8)
        if self.output_HW is not None:
            gt = cv2.resize(gt, (self.output_HW[1], self.output_HW[0]), interpolation=cv2.INTER_NEAREST)
        if train:
            gt, offset = augment_frame(gt, self._ratios.crop_ratio, self._ratios.scale_ratio, flip_p, offset, self.rng, nearest=True, static_hw=static)
        gt = np.ascontiguousarray(gt, dtype=np.uint8)

        # Full-size zero depth ("no depth signal") so depth-consuming models
        # (raa & ablations) can also pretrain on saliency data.
        zero_depth = np.zeros((*rgb.shape[:2], 1), dtype=np.float32)
        return {
            "seq_name": name, "frame_index": "0",
            "target": rgb, "target_depth": zero_depth, "target_gt": gt,
            # self-pair: a static image is its own counterpart
            "search_0": rgb.copy(), "search_0_depth": zero_depth, "search_0_gt": gt.copy(),
        }

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
        self.flip_prob.clear()
