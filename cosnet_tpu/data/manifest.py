"""Dataset manifest structures shared by the SBM-RGBD and HZFU loaders.

The reference keeps four parallel "sets" (entire/train/validate/test), each a
flat frame list plus per-sequence index ranges (``sbm_rgbd_loader.py:249-270``).
The same structure is kept here: a flat frame list enables global-index
iteration while per-sequence ranges drive counterpart sampling within the
same sequence (``sbm_rgbd_loader.py:556-574``).
"""
from __future__ import annotations

import dataclasses
import math
import random
from typing import Dict, List, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FrameRecord:
    seq_name: str
    frame_id: str
    rgb_name: str
    depth_name: str
    gt_name: str

    def __str__(self):  # reference VideoFrameInfo.__str__ format
        return f"{self.seq_name}/[{self.frame_id}]:{self.rgb_name},{self.gt_name}"


class FrameIndex:
    """One split: flat frame list + per-sequence [start, end) ranges."""

    def __init__(self):
        self.sequences: List[str] = []
        self.frames: List[FrameRecord] = []
        self.ranges: Dict[str, Tuple[int, int]] = {}

    def add_sequence(self, seq: str, frames: List[FrameRecord]):
        start = len(self.frames)
        self.sequences.append(seq)
        self.frames.extend(frames)
        self.ranges[seq] = (start, len(self.frames))

    def frames_of(self, seq: str) -> List[FrameRecord]:
        lo, hi = self.ranges[seq]
        return self.frames[lo:hi]

    def __len__(self):
        return len(self.frames)


def split_index(
    entire: FrameIndex,
    subset: Optional[Dict[str, List[str]]],
    subset_percentage: float,
    for_training: bool,
    rng: random.Random,
) -> FrameIndex:
    """Build the active split.

    With a predefined ``subset`` dict {seq: [frame ids]} the listed frames are
    selected in order (``sbm_rgbd_loader.py:470-490``); otherwise a random
    ``subset_percentage`` of each sequence is sampled, with a 2-frame minimum
    for training (``:492-515``).
    """
    out = FrameIndex()
    if subset and isinstance(subset, dict):
        by_key = {(f.seq_name, f.frame_id): f for f in entire.frames}
        for seq, ids in subset.items():
            frames = [by_key[(seq, i)] for i in ids if (seq, i) in by_key]
            out.add_sequence(seq, frames)
        return out

    for seq in entire.sequences:
        frames = entire.frames_of(seq)
        if len(frames) < 2 and for_training:
            continue  # a sequence needs >=2 frames for co-attention pairs
        num = int(math.floor(len(frames) * subset_percentage))
        if num < 2 and for_training:
            num = 2
        selected = frames if num >= len(frames) else rng.sample(frames, num)
        out.add_sequence(seq, selected)
    return out
