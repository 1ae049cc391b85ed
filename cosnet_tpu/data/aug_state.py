"""Thread-local augmentation-ratio state.

The reference redraws crop/scale ratios once per batch (``next_batch``,
``sbm_rgbd_loader.py:700-703``) in a single-threaded loader. Our
``BatchLoader`` loads whole batches concurrently in a small thread pool:
one worker calls ``next_batch()`` then loads all of its batch's samples, so
per-THREAD ratio state is exactly per-BATCH state — a plain shared attribute
would let a concurrent worker's redraw leak into another batch mid-load
(the reference's sharing protocol would silently break).

The per-sequence flip dict stays shared on purpose: flips are per sequence
across the whole epoch, not per batch.
"""
import hashlib
import random
import threading


def derived_rng(seed, *keys) -> random.Random:
    """Deterministic per-item RNG: ``Random(H(seed, *keys))``.

    Gives the data pipeline run-to-run reproducibility that is independent
    of worker-thread scheduling (a shared Random's state depends on the
    order threads consume it). Used when a dataset is constructed with an
    explicit ``seed``.
    """
    h = hashlib.blake2b(repr((seed,) + keys).encode(), digest_size=8)
    return random.Random(int.from_bytes(h.digest(), "little"))


def derived_uniform(seed, *keys) -> float:
    return derived_rng(seed, *keys).uniform(0.0, 1.0)


class AugRatios(threading.local):
    """Per-thread crop/scale ratios with the reference's defaults (:246-247)."""

    def __init__(self):
        self.scale_ratio = 0.9
        self.crop_ratio = 0.9

    def redraw(self, rng):
        # reference next_batch: scale U(0.7, 1.3), crop U(0.8, 1.0)
        self.scale_ratio = rng.uniform(0.7, 1.3)
        self.crop_ratio = rng.uniform(0.8, 1.0)
