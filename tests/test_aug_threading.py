"""Thread-locality of the per-batch augmentation ratios.

Regression for a real race: BatchLoader workers each call ``next_batch()``
then load a whole batch; a shared mutable ratio would let worker B's redraw
leak into worker A's half-loaded batch, silently breaking the reference's
per-batch ratio sharing protocol.
"""
import random
import threading

from cosnet_tpu.data.aug_state import AugRatios


def test_ratios_are_thread_isolated():
    ratios = AugRatios()
    seen = {}
    barrier = threading.Barrier(3)

    def worker(name, seed):
        rng = random.Random(seed)
        ratios.redraw(rng)
        mine = (ratios.crop_ratio, ratios.scale_ratio)
        barrier.wait()  # every thread has redrawn now
        # our values must be untouched by the other threads' redraws
        assert (ratios.crop_ratio, ratios.scale_ratio) == mine
        seen[name] = mine

    threads = [threading.Thread(target=worker, args=(i, 100 + i)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len({v for v in seen.values()}) == 3  # distinct draws per thread


def test_main_thread_defaults():
    ratios = AugRatios()
    assert (ratios.crop_ratio, ratios.scale_ratio) == (0.9, 0.9)  # reference :246-247
