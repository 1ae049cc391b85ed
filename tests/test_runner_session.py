"""EvalSession.run integration: the REAL eval loop (loader -> ROI crop ->
resize -> multi-ref forward -> soft-IoU -> per-challenge table -> PNGs) on a
synthetic 2-challenge tree with a tiny trunk, single-device and data-parallel.

test.py/serve.py both drive this path; previously only its pieces were
tested (infer-level DP staging in test_eval_dp.py, loaders in test_data.py).
Reference loop: /root/reference/test.py:278-344.
"""
import os

import cv2
import numpy as np
import pytest

from cosnet_tpu.config import TestDatasetConfig as DatasetCfg
from cosnet_tpu.nn.raa import RGBDSegmentationRAA
from cosnet_tpu.nn.resnet import Bottleneck
from cosnet_tpu.utils.logging import RunLogger

H_SRC, W_SRC = 64, 80  # source geometry; ROI crops to 56x64


def _build_tree(root, challenges=("Bootstrapping", "Shadows"), frames=8):
    rng = np.random.default_rng(3)
    for chal in challenges:
        seq = os.path.join(root, chal, "seqA")
        for sub in ("input", "depth", "groundtruth"):
            os.makedirs(os.path.join(seq, sub), exist_ok=True)
        roi = np.zeros((H_SRC, W_SRC), np.uint8)
        roi[4:60, 8:72] = 255
        cv2.imwrite(os.path.join(seq, "ROI.bmp"), roi)
        for i in range(1, frames + 1):
            fid = f"{i:06d}"
            cv2.imwrite(os.path.join(seq, "input", f"in{fid}.png"),
                        rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8))
            cv2.imwrite(os.path.join(seq, "depth", f"d{fid}.png"),
                        rng.integers(0, 255, (H_SRC, W_SRC), dtype=np.uint8))
            gt = np.zeros((H_SRC, W_SRC), np.uint8)
            gt[20:44, 24:60] = 255
            cv2.imwrite(os.path.join(seq, "groundtruth", f"gt{fid}.png"), gt)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("session_tree"))
    _build_tree(root)
    return root


@pytest.fixture(scope="module")
def tiny_model(monkeypatch_module):
    """EvalSession builds the flagship via cosnet_tpu.models.create_model;
    swap in a [1,1,1,1] trunk so the CPU test stays fast."""
    import cosnet_tpu.models as models

    real = models.create_model

    def tiny(full_name, **kw):
        assert full_name == "resnet_aspp_add"
        kw.pop("remat", None)
        return RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1],
                                   num_blocks_depth=[1, 1, 1, 1],
                                   coattention_backend=kw.get("coattention_backend", "einsum"),
                                   dtype=kw.get("dtype", np.float32))

    monkeypatch_module.setattr(models, "create_model", tiny)
    yield
    monkeypatch_module.setattr(models, "create_model", real)


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    m = MonkeyPatch()
    yield m
    m.undo()


def _run(tree, tmpdir, data_parallel, save_imgs=False):
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset

    ds_cfg = DatasetCfg(name="sbmrgbd", data_path=tree, sample_range=1,
                               image_HW_4_model=(32, 48), output_WH=(48, 32),
                               subset=None)
    session = EvalSession("resnet_aspp_add", coattention_backend="einsum",
                          data_parallel=data_parallel)
    db = build_test_dataset("sbmrgbd", ds_cfg, batch_size=4)
    log_path = os.path.join(tmpdir, f"log_dp{int(data_parallel)}.txt")
    logger = RunLogger(log_path)
    out_dir = os.path.join(tmpdir, "masks") if save_imgs else None
    res = session.run(db, ds_cfg, logger, batch_size=4, shuffle=False,
                      output_img_dir=out_dir, print_progress=False)
    logger.close()
    return res, log_path, out_dir


def test_session_pretrained_fast_init_matches(tree, tiny_model, tmp_path):
    """A fully-covering .pth checkpoint must take the eval_shape+zeros init
    path (no real flax init — round 3's 524 s serve cold start was dominated
    by the XLA:CPU init compile) and produce the same forward as applying
    the checkpoint variables directly."""
    import jax.numpy as jnp

    from cosnet_tpu.eval.runner import EvalSession
    from cosnet_tpu.utils.torch_import import save_pth

    fresh = EvalSession("resnet_aspp_add", coattention_backend="einsum")
    assert "init_variables" in fresh.init_breakdown  # no ckpt -> real init
    pth = os.path.join(str(tmp_path), "snapshot_test.pth")
    save_pth(pth, fresh.variables, epoch=0)

    session = EvalSession("resnet_aspp_add", coattention_backend="einsum",
                          pretrained=pth)
    assert session.pretrained_loaded
    assert "eval_shape" in session.init_breakdown
    assert "init_variables" not in session.init_breakdown  # fast path taken

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((1, 32, 48, 3)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal((1, 32, 48, 1)).astype(np.float32))
    out_ckpt = session.model.apply(session.variables, a, a, d, d, train=False)[0]
    out_ref = fresh.model.apply(fresh.variables, a, a, d, d, train=False)[0]
    np.testing.assert_allclose(np.asarray(out_ckpt), np.asarray(out_ref),
                               rtol=0, atol=1e-6)


def test_session_run_single_device(tree, tiny_model, tmp_path):
    res, log_path, out_dir = _run(tree, str(tmp_path), data_parallel=False,
                                  save_imgs=True)
    assert res["frames"] == 16
    assert res["iou"] is not None and 0.0 <= res["iou"] <= 1.0
    # per-challenge sweep table: one row per challenge, counts add up
    assert sorted(res["per_challenge"]) == ["Bootstrapping", "Shadows"]
    assert sum(v["frames"] for v in res["per_challenge"].values()) == 16
    # 4 batches -> steady-state throughput line exists
    assert res["steady_fps"] is not None
    text = open(log_path).read()
    assert text.count("##== subset ") == 2
    assert "final IOU:" in text and "steady-state frames/sec:" in text
    # one grayscale PNG per frame, per-sequence layout (reference contract)
    pngs = [os.path.join(dp, f) for dp, _, fs in os.walk(out_dir) for f in fs]
    assert len(pngs) == 16
    m = cv2.imread(pngs[0], cv2.IMREAD_UNCHANGED)
    assert m.shape == (32, 48) and m.dtype == np.uint8


def test_keep_remainder_scores_every_frame(tree, tiny_model, tmp_path):
    """serve.py path: the reference len-truncation quirk
    (sbm_rgbd_loader.py:584-585) drops len % batch frames — at batch 5 the
    16-frame tree scores 15. keep_remainder disables it; the short trailing
    batch is padded back to the compiled batch geometry and stripped, so
    shared frames score identically."""
    from cosnet_tpu.eval.runner import EvalSession, build_test_dataset

    ds_cfg = DatasetCfg(name="sbmrgbd", data_path=tree, sample_range=1,
                        image_HW_4_model=(32, 48), output_WH=(48, 32),
                        subset=None)
    session = EvalSession("resnet_aspp_add", coattention_backend="einsum")
    out = {}
    for keep in (False, True):
        db = build_test_dataset("sbmrgbd", ds_cfg, batch_size=5,
                                keep_remainder=keep)
        log_path = os.path.join(str(tmp_path), f"log_keep{int(keep)}.txt")
        logger = RunLogger(log_path)
        res = session.run(db, ds_cfg, logger, batch_size=5, shuffle=False,
                          print_progress=False)
        logger.close()
        lines = [l for l in open(log_path) if " IOU: " in l and " seq: " in l]
        out[keep] = (res, lines)
    assert out[False][0]["frames"] == 15  # quirk preserved (test.py contract)
    assert out[True][0]["frames"] == 16   # serving scores every frame
    assert out[True][1][:15] == out[False][1][:15]  # shared frames identical


def test_pipelined_loop_matches_serial(tree, tiny_model, tmp_path, monkeypatch):
    """The 1-deep software pipeline in EvalSession.run (dispatch batch k+1
    while scoring batch k) must not change a single log line or aggregate —
    scoring order is the serial order by construction. COSNET_EVAL_PIPELINE=0
    is the A/B switch; the real-TPU A/B (docs/PERF_r3.md) holds the fps
    evidence, this pins bit-equality of outputs."""
    out = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("COSNET_EVAL_PIPELINE", flag)
        sub = os.path.join(str(tmp_path), flag)
        os.makedirs(sub, exist_ok=True)
        res, log_path, _ = _run(tree, sub, data_parallel=False)
        lines = [l for l in open(log_path) if " IOU: " in l and " seq: " in l]
        out[flag] = (res, lines)
    assert out["0"][1] == out["1"][1]  # per-frame log lines bit-identical
    assert out["0"][0]["iou"] == out["1"][0]["iou"]
    assert out["0"][0]["f_measure"] == out["1"][0]["f_measure"]


def test_session_run_data_parallel_matches(tree, tiny_model, tmp_path):
    # Same weights on both paths: seed derives from model init inside
    # EvalSession, which is deterministic (jax.random.key(0) in init_variables)
    single, _, _ = _run(tree, str(tmp_path), data_parallel=False)
    dp, _, _ = _run(tree, str(tmp_path), data_parallel=True)
    assert dp["frames"] == single["frames"]
    # uint8 mask space: metrics agree exactly
    assert dp["iou"] == single["iou"]
    assert dp["f_measure"] == single["f_measure"]


def test_init_variables_disk_cache_roundtrip(tmp_path, monkeypatch):
    """Fresh-init fast path (VERDICT r4 #6): init_variables(cache_key=...)
    memoizes the initialized tree on disk; a second call loads values
    identical to a fresh init without running the init program."""
    import jax

    from cosnet_tpu.models import init_variables

    monkeypatch.setenv("COSNET_INIT_CACHE", str(tmp_path / "init_cache"))
    model = RGBDSegmentationRAA(block=Bottleneck, num_blocks_rgb=[1, 1, 1, 1],
                                num_blocks_depth=[1, 1, 1, 1])
    fresh = init_variables(model, n_inputs=4, hw=(32, 32))
    cached_write = init_variables(model, n_inputs=4, hw=(32, 32),
                                  cache_key="tiny_raa")
    assert (tmp_path / "init_cache").exists()
    cached_read = init_variables(model, n_inputs=4, hw=(32, 32),
                                 cache_key="tiny_raa")
    for a, b, c in zip(jax.tree.leaves(fresh), jax.tree.leaves(cached_write),
                      jax.tree.leaves(cached_read)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert jax.tree.structure(jax.tree.map(np.shape, fresh)) == \
        jax.tree.structure(jax.tree.map(np.shape, cached_read))
