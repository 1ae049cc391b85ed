"""Resident evaluation engine: weights + compiled executables shared across
sweeps.

The reference's sweep practice is one ``test.py`` process per subset — every
run re-imports the checkpoint, re-builds the model, and re-pays compilation
(``/root/reference/test.py:168-238``). :class:`EvalSession` is the serving
shape of the same pipeline: the model is built once, the weight tree stays
device-resident, and the jitted multi-reference forward is reused across
every dataset/subset evaluated by the process (same-geometry datasets hit
the already-compiled executable; a new geometry retraces once). ``test.py``
runs one dataset through it; ``serve.py`` iterates whole sweeps.

The per-frame loop preserves the reference eval contract exactly: R-averaged
sigmoid masks (``test.py:287-305``), resize to ``output_WH``, masks×255
uint8, bitwise soft-IoU + F-measure per frame, per-sequence mask PNGs, and
the reference's log-line format.
"""
from __future__ import annotations

import collections
import os
import time
from typing import Optional

import numpy as np


class _DeviceFramePool:
    """Device-resident LRU of raw eval frames, keyed by (seq, frame_id).

    The eval protocol revisits every frame ~R times as a counterpart beyond
    its own target slot (random picks over the sequence); the stacked
    staging re-ships each visit over the ~40 MB/s tunneled relay. Raw frames
    are augmentation-free, so (seq, id) keys a bit-identical array — upload
    once, reuse the device buffer. Eviction drops only the pool's reference;
    in-flight batches keep theirs (jax arrays are refcounted).

    Under data-parallel eval the pool is device-aware: a row's frames live
    on its shard's device; a frame revisited on a DIFFERENT device is
    copied device-to-device (ICI/HBM traffic, counted as a ``move``) — the
    host wire still carries each unique frame exactly once."""

    def __init__(self, budget_mb: float):
        self.budget = budget_mb * 1e6
        self.used = 0
        self.hits = self.misses = self.moves = 0
        self._d = collections.OrderedDict()  # key -> [{device: (rgb, depth)}, bytes/copy]

    def get(self, key, build, device=None):
        import jax

        entry = self._d.get(key)
        if entry is None:
            rgb_np, depth_np = build()
            rgb = jax.device_put(np.ascontiguousarray(rgb_np), device)
            depth = jax.device_put(np.ascontiguousarray(depth_np), device)
            per_copy = rgb_np.nbytes + depth_np.nbytes
            self._d[key] = [{device: (rgb, depth)}, per_copy]
            self.used += per_copy
            self.misses += 1
            self._evict()
            return rgb, depth
        self._d.move_to_end(key)
        copies, per_copy = entry
        buf = copies.get(device)
        if buf is not None:
            self.hits += 1
            return buf
        src = next(iter(copies.values()))
        buf = (jax.device_put(src[0], device), jax.device_put(src[1], device))
        copies[device] = buf
        self.used += per_copy
        self.moves += 1
        self._evict()
        return buf

    def _evict(self):
        while self.used > self.budget and len(self._d) > 1:
            _, (copies, per_copy) = self._d.popitem(last=False)
            self.used -= per_copy * len(copies)


class EvalSession:
    """Model + device-resident weights + jit cache, reusable across datasets."""

    def __init__(self, full_name: str, coattention_backend: str = "pallas",
                 dtype: str = "float32", pretrained: Optional[str] = None,
                 data_parallel: bool = False, device_indices=None):
        import jax
        import jax.numpy as jnp

        from cosnet_tpu.models import create_model, init_variables, model_input_signature
        from cosnet_tpu.utils.device import device_materialize
        from cosnet_tpu.utils.torch_import import (
            load_pth, merge_variables, state_dict_to_variables,
        )

        t0 = time.time()
        self.init_breakdown = {}  # stage -> seconds (serve cold-start triage)

        def _mark(stage):
            self.init_breakdown[stage] = round(time.time() - t0 - sum(
                self.init_breakdown.values()), 2)

        self.full_name = full_name
        self.model = create_model(full_name, coattention_backend=coattention_backend,
                                  dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
        # In bf16 mode the model's first conv casts its f32 inputs to bf16 on
        # device anyway; casting on the HOST instead is bit-identical (same
        # round-to-nearest-even) and HALVES the H2D bytes — the eval loop is
        # transfer-bound through the tunneled relay (~35-40 MB/s measured;
        # a 480x854 batch-8 input set is 105 MB as f32).
        self.stage_dtype = jnp.bfloat16 if dtype == "bfloat16" else None
        self.n_inputs = model_input_signature(full_name)
        self.pretrained_loaded = bool(pretrained and os.path.isfile(pretrained))
        if self.pretrained_loaded:
            from cosnet_tpu.models import init_variable_shapes
            from cosnet_tpu.utils.torch_import import fully_covers

            sd = load_pth(pretrained)
            imported = state_dict_to_variables(sd["model"] if "model" in sd else sd)
            _mark("load_pth")
            shapes = init_variable_shapes(self.model, self.n_inputs)
            _mark("eval_shape")
            if all(fully_covers(shapes[c], imported.get(c, {}))
                   for c in ("params", "batch_stats")):
                # Checkpoint covers every leaf: real init values are dead —
                # zeros + merge skips the minutes-long XLA:CPU init compile
                # (round 3's serve cold start, VERDICT r3 #4).
                variables = jax.tree.map(
                    lambda s: np.zeros(s.shape, s.dtype), shapes)
            else:
                variables = init_variables(self.model, self.n_inputs,
                                           cache_key=full_name)
                _mark("init_variables")
            variables = {
                "params": merge_variables(variables["params"], imported["params"]),
                "batch_stats": merge_variables(variables["batch_stats"], imported["batch_stats"]),
            }
            _mark("merge")
        else:
            # fresh init (no checkpoint): disk-memoized per (model, geometry)
            # so only the first-ever session pays the XLA:CPU init compile
            variables = init_variables(self.model, self.n_inputs,
                                       cache_key=full_name)
            _mark("init_variables")
        variables = device_materialize(jax.tree.map(jnp.asarray, variables))
        _mark("weight_upload")

        self.mesh = None
        if data_parallel:
            from cosnet_tpu.parallel import data_parallel_mesh
            from cosnet_tpu.parallel.mesh import replicate

            self.mesh = data_parallel_mesh(device_indices)
            # Pin the weights' mesh placement once — relying on jit
            # auto-resharding would re-transfer the tree per call.
            variables = replicate(variables, self.mesh)
        self.variables = variables
        self._forwards = {}  # as_uint8 -> jitted multi-ref forward (reused per sweep)
        self._counters_fn = None  # lazy jitted metric-counter reduction

    def counters_fn(self):
        """Jitted device-side metric reduction (eval/metrics.py::metric_counters):
        chains on the forward's mask handle so only [B, 6] int32 counters —
        24 bytes/frame — cross the relay instead of the 0.4 MB mask. One tiny
        program, shared across every geometry via jit's shape cache; under a
        mesh the batch-sharded inputs propagate to a batch-sharded output."""
        if self._counters_fn is None:
            import jax

            from cosnet_tpu.eval.metrics import metric_counters

            self._counters_fn = jax.jit(metric_counters)
        return self._counters_fn

    def forward_fn(self, as_uint8: bool):
        from cosnet_tpu.eval.infer import build_multi_reference_forward

        if as_uint8 not in self._forwards:
            self._forwards[as_uint8] = build_multi_reference_forward(
                self.model, self.n_inputs, as_uint8=as_uint8)
        return self._forwards[as_uint8]

    def forward_fn_raw(self, as_uint8: bool, out_hw, meanval):
        from cosnet_tpu.eval.infer import build_multi_reference_forward_raw

        key = ("raw", as_uint8, tuple(out_hw), tuple(np.asarray(meanval).tolist()))
        if key not in self._forwards:
            self._forwards[key] = build_multi_reference_forward_raw(
                self.model, self.n_inputs, out_hw, meanval, as_uint8=as_uint8,
                stage_dtype=self.stage_dtype)
        return self._forwards[key]

    def forward_fn_pooled(self, as_uint8: bool, out_hw, meanval):
        from cosnet_tpu.eval.infer import build_multi_reference_forward_pooled

        key = ("pooled", as_uint8, tuple(out_hw), tuple(np.asarray(meanval).tolist()))
        if key not in self._forwards:
            self._forwards[key] = build_multi_reference_forward_pooled(
                self.model, self.n_inputs, out_hw, meanval, as_uint8=as_uint8,
                stage_dtype=self.stage_dtype)
        return self._forwards[key]

    def summary(self) -> str:
        from cosnet_tpu.utils.summary import model_summary

        return model_summary(self.variables)

    # -- the reference eval loop (test.py:278-344) --------------------------

    def run(self, db_test, ds_cfg, logger, *, batch_size: int = 1,
            shuffle: bool = False, apply_crf: bool = False,
            output_img_dir: Optional[str] = None, no_prefetch: bool = False,
            frame_pool_mb: float = 0, print_progress: bool = True,
            device_metrics: bool = False) -> dict:
        """Evaluate one dataset; returns aggregate metrics. ``logger`` gets
        the reference-format per-frame and summary lines.

        ``frame_pool_mb`` (raw/device-preprocess mode): HBM budget for the
        device-resident frame pool — each unique frame ships over the wire
        ONCE and counterpart revisits reuse the device buffer. Single
        device: the batch stack happens inside the jit. Data-parallel: each
        shard's rows are stacked ON their device and assembled into the
        global sharded batch zero-copy (revisits landing on a different
        device move device-to-device, never back over the host wire)."""
        import cv2
        import jax

        from cosnet_tpu.data import BatchLoader
        from cosnet_tpu.data.pipeline import device_prefetch
        from cosnet_tpu.eval.metrics import (
            compute_iou, f_measure, pack_gt_bits, scores_from_counters,
        )

        sample_range = ds_cfg.sample_range
        # When output_WH matches the model input size (all reference configs),
        # the float resize is a no-op and the uint8 conversion runs on-device.
        uint8_on_device = tuple(ds_cfg.output_WH) == (
            ds_cfg.image_HW_4_model[1], ds_cfg.image_HW_4_model[0])
        raw = bool(getattr(db_test, "raw_eval", False))
        # Device metrics: score on device (bit-exact integer counters,
        # eval/metrics.py) — the mask never crosses the relay. Needs the
        # mask at model resolution on device (uint8_on_device) and a run
        # that doesn't consume masks on the host (no CRF, no PNG output).
        if device_metrics and (apply_crf or output_img_dir or not uint8_on_device):
            raise SystemExit("--device-metrics requires output_WH == model "
                             "input size and is incompatible with --use_crf "
                             "and mask PNG output (the host never sees masks)")
        score_hw = tuple(int(v) for v in ds_cfg.image_HW_4_model)
        counters_fn = self.counters_fn() if device_metrics else None
        pooled = bool(frame_pool_mb) and raw and jax.process_count() == 1
        if frame_pool_mb and not pooled:
            raise SystemExit("--frame-pool requires --device-preprocess "
                             "(and a single-host run)")
        pooled_tuple = pooled and self.mesh is None  # stack inside the jit
        pooled_dp = pooled and self.mesh is not None  # per-shard device stacks
        if pooled_tuple:
            forward = self.forward_fn_pooled(uint8_on_device,
                                             ds_cfg.image_HW_4_model,
                                             db_test.meanval)
            pool = _DeviceFramePool(frame_pool_mb)
        elif pooled_dp:
            # the already-compiled sharded raw executable consumes the
            # pool-assembled global batch — no extra program
            forward = self.forward_fn_raw(uint8_on_device, ds_cfg.image_HW_4_model,
                                          db_test.meanval)
            pool = _DeviceFramePool(frame_pool_mb)
        elif raw:
            forward = self.forward_fn_raw(uint8_on_device, ds_cfg.image_HW_4_model,
                                          db_test.meanval)
        else:
            forward = self.forward_fn(uint8_on_device)
        if apply_crf:
            from cosnet_tpu.eval.crf import refine_mask_u8

        mesh, variables = self.mesh, self.variables
        testloader = BatchLoader(db_test, batch_size=batch_size, shuffle=shuffle,
                                 drop_last=False)

        def gt_bits_rows(batch, row_idx):
            """Packed binary GT at the scored (model) resolution for the given
            batch rows — 8x smaller than the u8 plane on the wire; mirrors the
            host scorer's NEAREST resize when a config diverges."""
            rows = []
            for i in row_idx:
                gt = np.asarray(batch["target_gt"][i])
                if gt.shape != score_hw:
                    gt = cv2.resize(gt, tuple(ds_cfg.output_WH),
                                    interpolation=cv2.INTER_NEAREST)
                rows.append(pack_gt_bits(gt))
            return np.stack(rows)

        def stage_pooled(batch):
            """Frame-pool staging: resolve every slot of the batch to a
            device-resident per-frame buffer (uploading only pool misses);
            the [B(,R),...] stacks are built inside the jitted forward."""
            n_real = batch["target"].shape[0]
            tt, td, ss, sd = [], [], [], []
            for i in range(n_real):
                seq = batch["seq_name"][i]
                r, d = pool.get((seq, batch["frame_index"][i]),
                                lambda i=i: (batch["target"][i], batch["target_depth"][i]))
                tt.append(r)
                td.append(d)
                rs, ds_ = [], []
                for j in range(sample_range):
                    cr, cd = pool.get(
                        (seq, batch[f"search_{j}_id"][i]),
                        lambda i=i, j=j: (batch[f"search_{j}"][i],
                                          batch[f"search_{j}_depth"][i]))
                    rs.append(cr)
                    ds_.append(cd)
                ss.append(tuple(rs))
                sd.append(tuple(ds_))
            idxs = list(range(n_real))
            if n_real < batch_size:
                # pad to the compiled batch geometry by repeating the last
                # row — free: replicated device buffer refs, no uploads
                pad = batch_size - n_real
                tt += tt[-1:] * pad
                td += td[-1:] * pad
                ss += ss[-1:] * pad
                sd += sd[-1:] * pad
                idxs += [n_real - 1] * pad
            t_hw = np.asarray(batch["target_hw"])[idxs]
            s_hws = np.stack([batch[f"search_{j}_hw"] for j in range(sample_range)],
                             axis=1)[idxs]
            dev_batch = {
                "targets": tuple(tt), "target_depths": tuple(td),
                "searches": tuple(ss), "search_depths": tuple(sd),
                "target_hw": jax.device_put(t_hw),
                "search_hws": jax.device_put(s_hws),
            }
            if device_metrics:
                dev_batch["gt_bits"] = jax.device_put(gt_bits_rows(batch, idxs))
            return batch, dev_batch, n_real

        def stage_pooled_dp(batch):
            """Data-parallel frame-pool staging: each row's frames resolve
            to pool buffers ON THE ROW'S SHARD DEVICE (misses upload once;
            revisits on another device copy device-to-device — ICI/HBM, not
            the host wire). Each device's rows are stacked on-device (the
            inputs are committed there, so the XLA concat runs there) and
            the global [B,...] batch is assembled zero-copy from the
            per-device shards; the sharded raw executable consumes it."""
            import jax.numpy as jnp
            from jax.sharding import NamedSharding, PartitionSpec

            from cosnet_tpu.parallel.mesh import compiled_batch_rows, shard_batch

            n_real = batch["target"].shape[0]
            rows = compiled_batch_rows(batch_size, mesh.devices.size)
            devices = list(mesh.devices.flat)
            per = rows // len(devices)
            # pad by repeating the last row — free at the pool level (refs,
            # or at worst one d2d copy per pad device)
            row_src = list(range(n_real)) + [n_real - 1] * (rows - n_real)

            t_rows, td_rows, s_rows, sd_rows = [], [], [], []
            for pos, i in enumerate(row_src):
                dev = devices[pos // per]
                seq = batch["seq_name"][i]
                r, d = pool.get((seq, batch["frame_index"][i]),
                                lambda i=i: (batch["target"][i],
                                             batch["target_depth"][i]), dev)
                t_rows.append(r)
                td_rows.append(d)
                rs, ds_ = [], []
                for j in range(sample_range):
                    cr, cd = pool.get(
                        (seq, batch[f"search_{j}_id"][i]),
                        lambda i=i, j=j: (batch[f"search_{j}"][i],
                                          batch[f"search_{j}_depth"][i]), dev)
                    rs.append(cr)
                    ds_.append(cd)
                s_rows.append(rs)
                sd_rows.append(ds_)

            # same spec as shard_batch's default so the pooled global batch
            # is indistinguishable from the raw path's — one executable
            sharding = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))

            def shard_stack(rows_list, nested):
                shards = []
                for k in range(len(devices)):
                    chunk = rows_list[k * per:(k + 1) * per]
                    if nested:  # rows of R per-frame buffers -> [per, R, ...]
                        shards.append(jnp.stack([jnp.stack(r) for r in chunk]))
                    else:
                        shards.append(jnp.stack(chunk))
                global_shape = (rows,) + shards[0].shape[1:]
                return jax.make_array_from_single_device_arrays(
                    global_shape, sharding, shards)

            t_hw = np.asarray(batch["target_hw"])[row_src]
            s_hws = np.stack([batch[f"search_{j}_hw"] for j in range(sample_range)],
                             axis=1)[row_src]
            small_host = {"target_hw": t_hw, "search_hws": s_hws}
            if device_metrics:
                small_host["gt_bits"] = gt_bits_rows(batch, row_src)
            with mesh:
                small = shard_batch(small_host, mesh)
            dev_batch = {
                "target": shard_stack(t_rows, False),
                "searches": shard_stack(s_rows, True),
                "target_depth": shard_stack(td_rows, False),
                "search_depths": shard_stack(sd_rows, True),
                "target_hw": small["target_hw"],
                "search_hws": small["search_hws"],
            }
            if device_metrics:
                dev_batch["gt_bits"] = small["gt_bits"]
            return batch, dev_batch, n_real

        def stage(batch):
            """Stack the N reference frames + start async H2D transfer for one
            batch; runs ahead of the compute loop inside the prefetcher so
            input staging overlaps the previous batch's device time."""
            searches = np.stack([batch[f"search_{i}"] for i in range(sample_range)], axis=1)
            search_depths = np.stack([batch[f"search_{i}_depth"] for i in range(sample_range)], axis=1)
            dev_batch = {"target": batch["target"], "searches": searches,
                         "target_depth": batch["target_depth"], "search_depths": search_depths}
            if raw:  # uint8 on the wire + true crop sizes (device preprocess)
                dev_batch["target_hw"] = np.asarray(batch["target_hw"])
                dev_batch["search_hws"] = np.stack(
                    [batch[f"search_{i}_hw"] for i in range(sample_range)], axis=1)
            elif self.stage_dtype is not None:  # bf16 on the wire (see __init__)
                dev_batch = {k: np.asarray(v).astype(self.stage_dtype) for k, v in dev_batch.items()}
            n_real = batch["target"].shape[0]
            if device_metrics:  # after the cast — gt bits stay uint8
                dev_batch["gt_bits"] = gt_bits_rows(batch, range(n_real))
            if mesh is not None:
                from cosnet_tpu.parallel.mesh import (
                    compiled_batch_rows, pad_batch_to_multiple, shard_batch,
                )

                # Pad to the FULL compiled geometry, not just a device
                # multiple — one executable serves steady and trailing
                # batches alike (same invariant as the single-device branch).
                dev_batch, n_real = pad_batch_to_multiple(
                    dev_batch, compiled_batch_rows(batch_size, mesh.devices.size))
                with mesh:
                    dev_batch = shard_batch(dev_batch, mesh)
            else:
                # Pad any short trailing batch (a keep_remainder dataset) up
                # to the compiled batch geometry so one executable serves the
                # whole run; padded rows are stripped via n_real below.
                from cosnet_tpu.parallel.mesh import pad_batch_to_multiple

                dev_batch, n_real = pad_batch_to_multiple(dev_batch, batch_size)
                dev_batch = {k: jax.device_put(v) for k, v in dev_batch.items()}
            return batch, dev_batch, n_real

        put = stage_pooled if pooled_tuple else stage_pooled_dp if pooled_dp else stage
        # COSNET_EVAL_LADDER=1: accumulate per-stage wall time (decode /
        # stage / dispatch / block / score) for the e2e attribution ladder
        # (benchmarks/e2e_ladder.py). Attribution is exact in the serial
        # no-prefetch configuration; under the prefetcher/pipeline the
        # stages overlap and the sums measure occupancy, not latency.
        ladder = ({"decode_s": 0.0, "stage_s": 0.0, "dispatch_s": 0.0,
                   "block_s": 0.0, "score_s": 0.0}
                  if os.environ.get("COSNET_EVAL_LADDER") == "1" else None)
        if ladder is not None:
            raw_put, raw_iter = put, iter(testloader)

            def put(b, _inner=raw_put):
                t0 = time.time()
                out = _inner(b)
                ladder["stage_s"] += time.time() - t0
                return out

            def _timed_loader():
                while True:
                    t0 = time.time()
                    try:
                        b = next(raw_iter)
                    except StopIteration:
                        return
                    ladder["decode_s"] += time.time() - t0
                    yield b

            staged = map(put, _timed_loader()) if no_prefetch \
                else device_prefetch(_timed_loader(), put=put)
        else:
            staged = map(put, iter(testloader)) if no_prefetch \
                else device_prefetch(iter(testloader), put=put)

        iou_result, f_result, iou_counter = 0.0, 0.0, 0
        per_challenge = {}  # challenge -> (iou sum, F sum, frames)
        frames_done, t_start = 0, time.time()
        latencies = []
        warm_t = warm_frames = None  # set after batch 0 (compile + weight upload)

        def dispatch(dev_batch):
            """Launch the jitted forward; returns the async device handle.
            In device-metrics mode the counter reduction chains on the mask
            handle (both dispatches are async) so the mask lives and dies on
            device — only [B, 6] int32 ever crosses the relay."""
            if pooled_tuple:
                mask = forward(variables, dev_batch["targets"], dev_batch["searches"],
                               dev_batch["target_depths"], dev_batch["search_depths"],
                               dev_batch["target_hw"], dev_batch["search_hws"])
            elif raw:
                mask = forward(variables, dev_batch["target"], dev_batch["searches"],
                               dev_batch["target_depth"], dev_batch["search_depths"],
                               dev_batch["target_hw"], dev_batch["search_hws"])
            else:
                mask = forward(variables, dev_batch["target"], dev_batch["searches"],
                               dev_batch["target_depth"], dev_batch["search_depths"])
            if device_metrics:
                return counters_fn(mask, dev_batch["gt_bits"])
            return mask

        last_done = t_start

        def _tally(batch, idx, iou, fm):
            """Per-frame logging + aggregation (shared by host scoring and
            device-metrics scoring; lines and sums are identical)."""
            nonlocal iou_result, f_result, iou_counter
            seq, fid = batch["seq_name"][idx], batch["frame_index"][idx]
            logger.iou_line(seq, fid, iou)
            logger.write(f"{seq} {fid} F-measure: {fm}\n")
            iou_result += iou
            f_result += fm
            iou_counter += 1
            # SBM-RGBD seq names are "<challenge>/<seq>"; aggregate per
            # challenge so one run reports the full per-subset sweep table
            # (BASELINE.md's north-star eval; other datasets fall into one
            # bucket named after the sequence prefix).
            chal = seq.split("/")[0] if "/" in seq else seq
            c_iou, c_f, c_n = per_challenge.get(chal, (0.0, 0.0, 0))
            per_challenge[chal] = (c_iou + iou, c_f + fm, c_n + 1)

        def consume(batch, mask_dev, n_real):
            """Materialize one batch's masks (blocks on D2H) and score them.
            Runs one batch BEHIND dispatch in the steady state, so the host's
            cv2/metric/imwrite work and the mask transfer overlap the device
            computing the next batch. Scoring order — and therefore every log
            line and aggregate — is identical to the unpipelined loop.

            Latency accounting: completion-to-completion wall delta per frame
            (true pacing). A dispatch->materialize span would double-count the
            overlap window once the loop is pipelined."""
            nonlocal frames_done, last_done
            b = batch["target"].shape[0]
            # The only blocking D2H of the loop: [B,6] int32 counters in
            # device-metrics mode, the mask stack otherwise.
            t_blk = time.time()
            mask = np.asarray(mask_dev)[:n_real]
            if ladder is not None:
                now_blk = time.time()
                ladder["block_s"] += now_blk - t_blk
                ladder["_score_t0"] = now_blk
            now = time.time()
            latencies.append((now - last_done) / b)
            last_done = now
            frames_done += b

            for idx in range(b):
                if device_metrics:
                    iou, fm = scores_from_counters(mask[idx], score_hw)
                    _tally(batch, idx, iou, fm)
                    continue
                if uint8_on_device:
                    mask_u8 = mask[idx, :, :, 0]
                else:
                    img = cv2.resize(mask[idx, :, :, 0], tuple(ds_cfg.output_WH))
                    mask_u8 = (img * 255).astype(np.uint8)
                if apply_crf:
                    guide = np.asarray(batch["target"][idx])
                    if raw:  # padded source u8: use the true crop region
                        th, tw = np.asarray(batch["target_hw"][idx])
                        guide = guide[:th, :tw].astype(np.float32)
                    # model-res (or resized-crop) intensities; constant
                    # offsets like the BGR mean cancel in the CRF's color
                    # kernel, so mean-subtracted and raw guides are equivalent
                    if guide.shape[:2] != mask_u8.shape:
                        guide = cv2.resize(guide, (mask_u8.shape[1], mask_u8.shape[0]))
                    mask_u8 = refine_mask_u8(mask_u8, guide)
                gt = np.array(batch["target_gt"][idx])
                if gt.shape != mask_u8.shape:
                    # Reference configs keep output_WH == model input size; if
                    # a config diverges, score at output resolution.
                    gt = cv2.resize(gt, tuple(ds_cfg.output_WH), interpolation=cv2.INTER_NEAREST)
                iou = compute_iou(mask_u8, gt)
                fm = f_measure(mask_u8, gt)
                _tally(batch, idx, iou, fm)
                if output_img_dir:
                    seq, fid = batch["seq_name"][idx], batch["frame_index"][idx]
                    save_dir = os.path.join(output_img_dir, seq)
                    os.makedirs(save_dir, exist_ok=True)
                    # Grayscale PNG per frame (reference contract,
                    # test.py:332-340) via cv2 at zlib level 1 — ~4x faster
                    # than PIL's default level 6; still a lossless PNG.
                    cv2.imwrite(os.path.join(save_dir, f"{fid}.png"), mask_u8,
                                [cv2.IMWRITE_PNG_COMPRESSION, 1])
            if ladder is not None:
                ladder["score_s"] += time.time() - ladder.pop("_score_t0")

        # 1-deep software pipeline: batch k's host scoring + mask D2H overlap
        # batch k+1's device compute (jit dispatch is async; np.asarray is the
        # blocking point). Batch 0 is consumed immediately so the warmup
        # boundary still isolates compile-cache load + weight upload.
        # COSNET_EVAL_PIPELINE=0 restores the serial loop (A/B measurement).
        pipelined = os.environ.get("COSNET_EVAL_PIPELINE", "1") != "0"
        pending = None
        for index, (batch, dev_batch, n_real) in enumerate(staged):
            if print_progress:
                print("%d processd" % index)
            t_disp = time.time()
            handle = dispatch(dev_batch)
            if ladder is not None:
                ladder["dispatch_s"] += time.time() - t_disp
            if pending is not None:
                consume(*pending)
                pending = None
            if index == 0 or not pipelined:
                consume(batch, handle, n_real)
                if index == 0:
                    warm_t, warm_frames = time.time(), frames_done
            else:
                pending = (batch, handle, n_real)
        if pending is not None:
            consume(*pending)

        result = {"frames": frames_done, "iou": None, "f_measure": None,
                  "per_challenge": {}, "fps": None, "steady_fps": None, "p50_ms": None}
        if ladder is not None and frames_done:
            result["ladder_ms_per_frame"] = {
                k[:-2]: round(v / frames_done * 1e3, 2)
                for k, v in ladder.items() if k.endswith("_s")}
        if pooled:
            result["pool"] = {"uploads": pool.misses, "hits": pool.hits,
                              "d2d_moves": pool.moves,
                              "resident_mb": round(pool.used / 1e6, 1)}
            logger.write(f"frame pool: {pool.misses} uploads, {pool.hits} hits, "
                         f"{pool.moves} d2d moves "
                         f"({pool.used / 1e6:.0f} MB resident)\n")
        if iou_counter:
            if len(per_challenge) > 1:
                for chal in sorted(per_challenge):
                    c_iou, c_f, c_n = per_challenge[chal]
                    logger.write(f"##== subset {chal}: IOU: {c_iou / c_n} "
                                 f"F-measure: {c_f / c_n} frames: {c_n} ==##\n")
            logger.final_iou(iou_result / iou_counter)
            logger.write(f"final F-measure: {f_result / iou_counter}\n")
            elapsed = time.time() - t_start
            logger.write(
                f"frames: {frames_done}  frames/sec: {frames_done / elapsed:.3f}  "
                f"p50 latency: {np.percentile(latencies, 50) * 1e3:.1f} ms\n"
            )
            result.update(
                iou=iou_result / iou_counter, f_measure=f_result / iou_counter,
                per_challenge={c: {"iou": v[0] / v[2], "f_measure": v[1] / v[2], "frames": v[2]}
                               for c, v in per_challenge.items()},
                fps=frames_done / elapsed,
                p50_ms=float(np.percentile(latencies, 50) * 1e3),
            )
            if warm_t is not None and frames_done > warm_frames:
                # Batch 0 pays one-time costs (jit compile / compile-cache
                # load + the full weight-tree upload); steady-state excludes
                # it — the long-run throughput of a production sweep.
                steady = (frames_done - warm_frames) / (time.time() - warm_t)
                logger.write(
                    f"steady-state frames/sec: {steady:.3f}  "
                    f"p50 latency: {np.percentile(latencies[1:], 50) * 1e3:.1f} ms  "
                    f"(excluding first batch: compile + weight upload)\n"
                )
                result["steady_fps"] = steady
            if print_progress:
                print("final IOU:", iou_result / iou_counter, " F:", f_result / iou_counter)
        return result


def calibrate_static_int8(session: EvalSession, db_calib, batch_size: int,
                          n_batches: int = None) -> dict:
    """Calibrate static int8 activation scales on the first K host-path
    batches and install them into the session's variable tree.

    Runs the stats forward (``quant_stats`` mutable, nn/quant.py) over up
    to ``n_batches`` preprocessed batches of ``db_calib`` (must be a
    float/host-path dataset — raw uint8 staging happens inside a different
    graph), reduces the per-site per-channel ranges with elementwise max,
    and writes the resulting ``quant_scales`` collection into
    ``session.variables``. Every static-mode forward reads the scales as
    runtime inputs, so RE-calibrating (serve.py does it per sweep job)
    updates values in place — the compiled executables are reused as-is.

    The stats forward is jitted once per session (reused across batches
    and across re-calibrations); one cached compile + K forwards is the
    entire calibration cost. Multi-batch default: 4
    (``COSNET_INT8_CALIB_BATCHES``) — round 4 calibrated on a single batch
    and its max-range scales drifted +1.4e-2 F on later batches
    (docs/evidence/FINGERPRINTS_r04.json)."""
    import jax
    import jax.numpy as jnp

    from cosnet_tpu.data import BatchLoader
    from cosnet_tpu.nn import quant

    assert quant.int8_enabled(), "enable_int8 first so QuantConv sites exist to calibrate"
    if n_batches is None:
        n_batches = int(os.environ.get("COSNET_INT8_CALIB_BATCHES", "4"))

    if getattr(session, "_calib_fn", None) is None:
        model, n_in = session.model, session.n_inputs

        @jax.jit
        def stats_fn(v, *ins):
            _, stats = model.apply(v, *ins, mutable=["quant_stats"], train=False)
            return stats.get("quant_stats", {})

        session._calib_fn = stats_fn

    # strip any previously installed scales so re-calibration traces with
    # the same input structure (and the dynamic branch sows regardless)
    base_vars = {k: v for k, v in session.variables.items() if k != "quant_scales"}
    amax, seen = None, 0
    for batch in BatchLoader(db_calib, batch_size=batch_size, shuffle=False,
                             drop_last=False):
        if seen and batch["target"].shape[0] != batch_size:
            break  # short trailing batch would force a second stats compile
        inputs = (jnp.asarray(batch["target"]), jnp.asarray(batch["search_0"]))
        if session.n_inputs >= 3:
            inputs += (jnp.asarray(batch["target_depth"]),)
        if session.n_inputs == 4:
            inputs += (jnp.asarray(batch["search_0_depth"]),)
        got = quant.harvest_amax(session._calib_fn, base_vars, inputs)
        amax = got if amax is None else quant.merge_amax(amax, got)
        seen += 1
        if seen >= n_batches:
            break
    if not amax:
        raise ValueError("calibration dataset yielded no batches")

    tree = jax.tree.map(jnp.asarray, quant.scales_variables(amax))
    if session.mesh is not None:
        from cosnet_tpu.parallel.mesh import replicate

        tree = replicate(tree, session.mesh)
    had = "quant_scales" in session.variables
    session.variables = dict(session.variables, quant_scales=tree)
    if not had:
        # forwards traced before scales existed close over the old tree
        # structure; drop them (normal flow builds none before calibration)
        session._forwards = {}
    return amax


def build_test_dataset(dataset: str, ds_cfg, batch_size: int,
                       davis_subset_file: Optional[str] = None,
                       decode_cache_mb: Optional[float] = None,
                       raw_eval: bool = False, keep_remainder: bool = False,
                       sample_seed: Optional[int] = None):
    """Dataset for an eval run (test.py:253-255 channel selection rules).

    ``keep_remainder=True`` disables the reference's dataset-length
    truncation quirk (len rounded DOWN to a batch multiple,
    ``/root/reference/dataloaders/sbm_rgbd_loader.py:584-585`` — at batch 8
    a 7-frame challenge scores ZERO frames). test.py preserves the quirk
    (eval contract); serve.py opts out so sweep jobs score every frame —
    the runner pads short batches back to the compiled batch geometry.

    ``sample_seed``: seed the counterpart-frame sampling (derived RNG).
    Default None preserves the reference's UNSEEDED test-time sampling
    quirk — but int8-static calibration AMPLIFIES that randomness (random
    calibration counterparts shift every activation range ~1 %, moving
    all quantization grids: identical drives measured IoU swings of 0.02,
    round-5 finding), so numerics-gate harnesses must pass a seed."""
    from cosnet_tpu.data import HzfuRgbdDataset, SbmRgbdDataset

    channels_target, channels_cp = "rgbdt", "rgbd"
    if dataset == "hzfud":
        channels_target, channels_cp = "dt", "d"
    elif dataset == "hzfurgb":
        channels_target, channels_cp = "rgbt", "rgb"

    common = dict(
        sample_range=ds_cfg.sample_range,
        output_HW=ds_cfg.image_HW_4_model,
        channels_for_target_frame=channels_target,
        channels_for_counterpart_frame=channels_cp,
        for_training=False,
        # dataset-level batch_size only drives the reference len-truncation
        # quirk; 1 disables it (see keep_remainder above)
        batch_size=1 if keep_remainder else batch_size,
        subset_percentage=1,
        subset=ds_cfg.subset,
        decode_cache_mb=decode_cache_mb,
        seed=sample_seed,
    )
    if raw_eval and dataset != "sbmrgbd":
        # HZFU depth is a float .mat (not losslessly u8-shippable); DAVIS
        # support would be rgb-only. Scope: the north-star sbmrgbd sweep.
        raise SystemExit(f"--device-preprocess supports sbmrgbd only (got {dataset})")
    if dataset == "sbmrgbd":
        return SbmRgbdDataset(ds_cfg.data_path, raw_eval=raw_eval, **common)
    if dataset in ("hzfud", "hzfurgb", "hzfurgbd"):
        return HzfuRgbdDataset(ds_cfg.data_path, **common)
    if dataset == "davis":
        from cosnet_tpu.data.davis import DavisDataset

        return DavisDataset(
            ds_cfg.data_path,
            sample_range=ds_cfg.sample_range,
            output_HW=ds_cfg.image_HW_4_model,
            for_training=False,
            batch_size=1 if keep_remainder else batch_size,
            subset_file=davis_subset_file,
            decode_cache_mb=decode_cache_mb,
            seed=sample_seed,
        )
    raise SystemExit("dataset error")
