"""Reference-contract logging.

The reference writes append-only text logs with ``##==…==##`` section
markers (``train.py:44-45``, ``test.py:54-55``) and a fixed per-iteration
line format that ``plot_from_log.py`` parses by splitting on runs of
spaces (``plot_from_log.py:14-22``). Both formats are preserved verbatim so
the reference's tooling keeps working on our logs.
"""
from __future__ import annotations

import os

LOG_SECTION_START = "##=="
LOG_SECTION_END = "==##"

# train.py:607 — parsed by plot_from_log.py; the spacing is part of the contract.
EPOCH_LINE_FORMAT = "Epoch[{}]({}/{}):     Loss: {:.10f}      lr: {:.5f}\n"


class RunLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a" if os.path.isfile(path) else "w")

    def section(self, content: str):
        self._f.write(f"{LOG_SECTION_START}{content}{LOG_SECTION_END}\n")
        self._f.flush()

    def write(self, msg: str):
        self._f.write(msg)
        self._f.flush()

    def epoch_line(self, epoch: int, i_iter: int, train_len: int, loss: float, lr: float):
        self._f.write(EPOCH_LINE_FORMAT.format(epoch, i_iter, train_len, loss, lr))
        self._f.flush()

    def iou_line(self, seq_name: str, frame_index: str, iou: float):
        # test.py:322 format
        self._f.write(
            f"{LOG_SECTION_START} seq: {seq_name} frame: {frame_index} IOU: {iou}{LOG_SECTION_END}\n"
        )
        self._f.flush()

    def final_iou(self, iou: float):
        self._f.write(f"{LOG_SECTION_START} final IOU: {iou} {LOG_SECTION_END}\n")
        self._f.flush()

    def close(self):
        self._f.close()
