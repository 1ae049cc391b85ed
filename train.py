#!/usr/bin/env python
"""Training driver — reference CLI contract, TPU-native execution.

Usage matches the reference (``README.md:56``):
    python train.py --dataset sbmrgbd --model raa --gpus 0[,1...]

Flow (reference ``train.py:399-634``, rebuilt per SURVEY.md §7): config.yaml
→ model registry → pretrained ``.pth`` import → dataset + threaded loader →
jitted train step (weighted BCE+0.8·L1 dual-branch loss, grouped SGD with
the 0.01×/10× poly schedule) data-parallel over a ``jax.sharding.Mesh`` →
per-epoch checkpoints in both orbax and the reference ``{epoch, model}``
.pth contract → reference-format log lines (``plot_from_log.py``-parseable)
→ loss-curve PNG.
"""
import argparse
import datetime
import os
import os.path as osp
import time

import numpy as np


def get_arguments():
    parser = argparse.ArgumentParser(description="RGBD co-attention VOS training (TPU)")
    parser.add_argument("--is-training", action="store_true",
                        help="Whether to update BN running stats during training.")
    parser.add_argument("--learning-rate", type=float, default=0.00025,
                        help="Base learning rate (polynomial decay).")
    parser.add_argument("--weight-decay", type=float, default=0.0005,
                        help="L2 regularization strength.")
    parser.add_argument("--momentum", type=float, default=0.9,
                        help="SGD momentum.")
    parser.add_argument("--power", type=float, default=0.9,
                        help="Polynomial LR decay power.")
    parser.add_argument("--dataset", type=str, default="sbmrgbd",
                        help="sbmrgbd, hzfurgbd, davis, or saliency (static-image "
                             "co-attention pretraining on the config's saliency_dataset).")
    parser.add_argument("--saliency-alternating", action="store_true",
                        help="Every 3rd step trains the encoder at 1xlr with heads frozen "
                             "(the reference's dead salient-object branch, train.py:166-169).")
    parser.add_argument("--random-mirror", action="store_true")
    parser.add_argument("--random-scale", action="store_true")
    parser.add_argument("--not-restore-last", action="store_true")
    parser.add_argument("--random-seed", type=int, default=1234)
    parser.add_argument("--logFile", default="log.txt",
                        help="File that stores the training logs.")
    parser.add_argument("--cuda", default=True,
                        help="Kept for CLI compatibility; device is the TPU mesh.")
    parser.add_argument("--gpus", type=str, default="0",
                        help="Device indices (maps to TPU chips).")
    parser.add_argument("--model", default="raa",
                        help="ori, raa, ref, add, conc1, conc2, conv_add, conv_conc2")
    parser.add_argument("--coattention-backend", default="einsum",
                        help="einsum | pallas")
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                        help="Activation/compute dtype for the train step. bfloat16 halves "
                             "activation HBM traffic on the MXU-heavy trunk; params, BN "
                             "statistics, the mask decode, the loss, and the optimizer "
                             "state all stay float32 (mixed precision).")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize residual blocks in the backward pass "
                             "(jax.checkpoint per block): ~1/3 more trunk FLOPs for "
                             "O(depth)x less activation memory — enables training at the "
                             "480x854 eval resolution on one chip. Gradients are exact.")
    parser.add_argument("--profile-dir", default="",
                        help="If set, write a jax.profiler trace of the first epoch here.")
    parser.add_argument("--use-native-data", action="store_true",
                        help="Route host preprocessing through the fused C++ kernels.")
    parser.add_argument("--auto-resume", action="store_true",
                        help="Resume from the newest snapshot for this dataset/model (failure recovery).")
    parser.add_argument("--device-augment", action="store_true",
                        help="Run crop/flip augmentation on-device (batched, jitted) instead of on the host.")
    parser.add_argument("--debug-images", action="store_true",
                        help="Dump what the network sees to <snapshot_dir>/debug "
                             "(the reference does this unconditionally, train.py:533).")
    parser.add_argument("--validate-data", action="store_true",
                        help="Scan the training frames with the depth/gt sanity heuristics "
                             "(reference __validate_frame, sbm_rgbd_loader.py:294-338 — "
                             "disabled there; opt-in here) and log flagged frames.")
    parser.add_argument("--no-prefetch", action="store_true",
                        help="Disable double-buffered device prefetch (debugging).")
    parser.add_argument("--decode-cache-mb", type=float, default=None,
                        help="Host RAM budget (MB) for the decoded-frame LRU. "
                             "Training decodes each frame once per epoch, so the "
                             "cache pays only across epochs — bounded at a modest "
                             "512 MB default rather than the eval loop's 2048 MB "
                             "(eval revisits frames within one pass). 0 disables. "
                             "Precedence: this flag > COSNET_DECODE_CACHE_MB > 512.")
    parser.add_argument("--context-parallel", default="", choices=["", "ring", "ulysses"],
                        help="Shard the co-attention's spatial tokens over the mesh for "
                             "TRAINING (ring: chunks rotate over ICI with online-softmax "
                             "combining; differentiable — the flash VJP streams both "
                             "directions). The batch is replicated in this mode (CP shards "
                             "tokens, not samples): it is the memory axis for resolutions "
                             "whose co-attention working set exceeds one chip's HBM.")
    parser.add_argument("--multihost", action="store_true",
                        help="Hierarchical ('replica', 'data') mesh: batch sharded over "
                             "DCN (hosts) x ICI (chips); gradient reduction stays "
                             "hierarchical. Replaces the reference's single-process "
                             "DataParallel ceiling (train.py:489-496) at pod scale.")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 for jax.distributed.initialize "
                             "(omit on TPU pods — auto-discovered).")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="Total process count for jax.distributed.initialize.")
    parser.add_argument("--process-id", type=int, default=None,
                        help="This process's index for jax.distributed.initialize.")
    parser.add_argument("--replica-axis-size", type=int, default=None,
                        help="Force the outer 'replica' axis length (single-process "
                             "dryrun of the hierarchical mesh, e.g. 2 on 8 devices).")
    return parser.parse_args()


def main():
    args = get_arguments()
    start = time.time()
    ymd_hms = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    print("Training starts at ", ymd_hms)

    from cosnet_tpu.utils.platform import force_cpu_devices_from_env

    # COSNET_CPU_DEVICES=N: driver dryruns / the 2-process
    # scripts/run_multiprocess.py harness / CPU-host drives.
    force_cpu_devices_from_env()

    import jax
    import jax.numpy as jnp

    from cosnet_tpu import config as cfg
    from cosnet_tpu.data import BatchLoader, HzfuRgbdDataset, SbmRgbdDataset
    from cosnet_tpu.data.pipeline import device_prefetch
    from cosnet_tpu.data.davis import DavisDataset
    from cosnet_tpu.models import create_model, init_variables, model_input_signature
    from cosnet_tpu.parallel import (
        data_parallel_mesh, initialize_distributed, multi_host_mesh, replicate, shard_batch,
    )

    if args.multihost:
        # Real multi-host: join the coordinator BEFORE any other jax use so
        # jax.devices() sees the whole pod. Single-process dryruns skip this.
        initialize_distributed(args.coordinator_address, args.num_processes, args.process_id)
    from cosnet_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from cosnet_tpu.train.checkpoint import find_latest_checkpoint, restore, save_epoch
    from cosnet_tpu.train.optim import GroupedSGD, lr_poly
    from cosnet_tpu.train.state import TrainState, make_train_step
    from cosnet_tpu.utils.logging import RunLogger
    from cosnet_tpu.utils.profiling import log_device_memory, sample_memory_line, trace
    from cosnet_tpu.utils.torch_import import (
        load_pth, merge_variables, state_dict_to_variables, unmatched_paths,
    )

    user_config = cfg.load_yaml("config.yaml")
    # Saliency pretraining borrows the davis training geometry — the reference
    # attaches `saliency_datasets` to the davis train block (config.yaml:54-56).
    ds_cfg = cfg.TrainDatasetConfig.from_config(
        user_config, "davis" if args.dataset == "saliency" else args.dataset)
    full_name = cfg.full_model_name(args.model)
    restore_from = cfg.train_initial_params(user_config, full_name)

    h, w = ds_cfg.output_HW
    if args.multihost and jax.process_count() > 1:
        # One run directory per JOB, not per process: processes started a few
        # ms apart would otherwise snapshot/log into different timestamped
        # dirs (and a shared orbax path is what makes resume find one run).
        from jax.experimental import multihost_utils

        stamp = np.frombuffer(ymd_hms.encode(), dtype=np.uint8)
        ymd_hms = multihost_utils.broadcast_one_to_all(stamp).tobytes().decode()
    snapshot_dir = osp.join(".", "snapshots", args.dataset, full_name, f"H{h}W{w}", ymd_hms)
    os.makedirs(snapshot_dir, exist_ok=True)
    log_suffix = f".p{jax.process_index()}" if jax.process_count() > 1 else ""
    logger = RunLogger(osp.join(snapshot_dir, f"{args.dataset}__{full_name}_{ymd_hms}_train_log.txt{log_suffix}"))
    logger.section(str(vars(args)))

    print("    current dataset:  ", args.dataset)
    print("    init model: ", restore_from)
    print("=====> Random Seed: ", args.random_seed)
    np.random.seed(args.random_seed)

    print("=====> Building network")
    if args.context_parallel and args.multihost:
        raise SystemExit("--context-parallel and --multihost are exclusive "
                         "(CP shards tokens over the whole mesh)")
    coattention_backend = args.context_parallel or args.coattention_backend
    model = create_model(full_name, coattention_backend=coattention_backend,
                         dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
                         remat=args.remat)
    n_inputs = model_input_signature(full_name)
    variables = init_variables(model, n_inputs)

    if restore_from and os.path.isfile(restore_from):
        print("=====> Loading init weights from", restore_from)
        sd = load_pth(restore_from)
        imported = state_dict_to_variables(sd["model"] if "model" in sd else sd)
        missing = unmatched_paths(variables, imported)
        if missing:
            logger.write(f"[import] {len(missing)} unmatched keys (first: {missing[:5]})\n")
        variables = {
            "params": merge_variables(variables["params"], imported["params"]),
            "batch_stats": merge_variables(variables["batch_stats"], imported["batch_stats"]),
        }
    from cosnet_tpu.utils.device import device_materialize

    variables = device_materialize(jax.tree.map(jnp.asarray, variables))

    optimizer = GroupedSGD(momentum=args.momentum, weight_decay=args.weight_decay)
    state = TrainState.create(variables, optimizer)

    start_epoch = 0
    resume_path = None
    if args.auto_resume:
        resume_path = find_latest_checkpoint(osp.join(".", "snapshots", args.dataset, full_name, f"H{h}W{w}"))
    if not resume_path and ds_cfg.checkpoint_file and isinstance(ds_cfg.checkpoint_file, str) and os.path.exists(ds_cfg.checkpoint_file):
        resume_path = ds_cfg.checkpoint_file
    if resume_path:
        print("=> loading checkpoint '{}'".format(resume_path))
        state, start_epoch = restore(resume_path, state)

    print("=====> Preparing training data")
    common = dict(
        sample_range=1,
        output_HW=ds_cfg.output_HW,
        subset=ds_cfg.subset,
        for_training=True,
        batch_size=ds_cfg.batch_size,
        seed=args.random_seed,
        augment_on_host=not args.device_augment,
        # flag > COSNET_DECODE_CACHE_MB (consulted by budget_from_env when
        # this is None) > the 512 MB training default
        decode_cache_mb=args.decode_cache_mb if args.decode_cache_mb is not None
        else (None if os.environ.get("COSNET_DECODE_CACHE_MB") else 512.0),
    )
    debug_dir = osp.join(snapshot_dir, "debug") if args.debug_images else None
    if args.dataset == "sbmrgbd":
        db_train = SbmRgbdDataset(ds_cfg.data_path, log_func=logger.write,
                                  use_native=args.use_native_data,
                                  output_dir_for_debug=debug_dir, **common)
    elif args.dataset == "hzfurgbd":
        db_train = HzfuRgbdDataset(ds_cfg.data_path, output_dir_for_debug=debug_dir, **common)
    elif args.dataset == "davis":
        davis_cfg = user_config["train"]["dataset"]["davis"]
        common.pop("subset", None)
        db_train = DavisDataset(ds_cfg.data_path, subset_file=davis_cfg.get("subset_file"), **common)
    elif args.dataset == "saliency":
        from cosnet_tpu.data.saliency import SaliencyDataset

        sal = user_config["train"]["saliency_dataset"]
        wanted = user_config["train"]["dataset"]["davis"].get("saliency_datasets")
        datasets = {k: v for k, v in sal["datasets"].items() if not wanted or k in wanted}
        db_train = SaliencyDataset(
            sal["root_path"], datasets, output_HW=ds_cfg.output_HW,
            for_training=True, batch_size=ds_cfg.batch_size, seed=args.random_seed,
        )
        if len(db_train) == 0:
            raise SystemExit(f"no saliency image/mask pairs under {sal['root_path']}")
    else:
        raise SystemExit("dataset error")

    if args.validate_data and hasattr(db_train, "validate_frame"):
        print("=====> Validating training frames (depth/gt heuristics)")
        flagged = 0
        for rec in db_train.index.frames:
            findings = db_train.validate_frame(rec)
            issues = [f"{k}[{i}]={v}" for k, vals in findings.items()
                      for i, v in enumerate(vals) if v is not None]
            if issues:
                flagged += 1
                logger.write(f"[validate] {rec.seq_name}/{rec.frame_id}: {', '.join(issues)}\n")
        logger.write(f"[validate] {flagged}/{len(db_train.index.frames)} frames flagged\n")
        print(f"    {flagged}/{len(db_train.index.frames)} frames flagged (see log)")

    if args.multihost:
        mesh = multi_host_mesh(replica_axis_size=args.replica_axis_size)
        print(f"=====> Mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
              f"({jax.process_count()} process(es)); global batch {ds_cfg.batch_size}")
    else:
        mesh = data_parallel_mesh(cfg.resolve_device_request(args.gpus))
        print(f"=====> Mesh: {mesh.devices.size} device(s); global batch {ds_cfg.batch_size}")
    n_dev = mesh.devices.size
    if args.context_parallel:
        # CP: tokens shard over the mesh, the batch is replicated — any batch
        # size works. Install the trace-time mesh context for the dispatch
        # (parallel/context_parallel.py) before the first jitted step.
        from cosnet_tpu.parallel.context_parallel import enable_context_parallel

        enable_context_parallel(mesh, mesh.axis_names[-1], chunk_backend=args.coattention_backend)
        print(f"=====> context-parallel ({args.context_parallel}) training over {n_dev} chip(s)")
    elif ds_cfg.batch_size % n_dev != 0:
        raise SystemExit(f"batch_size {ds_cfg.batch_size} must divide the {n_dev}-device mesh")

    train_step = make_train_step(model, optimizer, n_inputs=n_inputs,
                                 alternating=args.saliency_alternating)
    jitted_step = jax.jit(train_step, donate_argnums=0)

    proc_shard = (jax.process_index(), jax.process_count()) if args.multihost else None
    trainloader = BatchLoader(db_train, batch_size=ds_cfg.batch_size, shuffle=True,
                              seed=args.random_seed, process_shard=proc_shard)
    train_len = len(trainloader)
    max_iter = ds_cfg.max_epoches * train_len
    print("  iteration numbers  of per epoch: ", train_len)
    print("  epoch num: ", ds_cfg.max_epoches)
    print("  max iteration: ", max_iter)
    total_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    logger.write("Parameters: %s" % str(total_params))
    logger.write("\n%s\t\t%s" % ("iter", "Loss(train)\n"))

    if args.device_augment:
        from cosnet_tpu.data.device_augment import augment_batch, draw_augmentation_params

        aug_rng = np.random.default_rng(args.random_seed)
        flip_of_seq = {}

        def device_augment(db):
            """Batched on-device crop→scale→flip with the reference's RNG
            sharing protocol; offsets per frame, flips per sequence,
            crop/scale ratios per batch (shared by target and search)."""
            seqs = db.pop("_seqs")
            off_t, crop, scale, flips = draw_augmentation_params(aug_rng, seqs, flip_of_seq, ds_cfg.output_HW)
            off_s, _, _, _ = draw_augmentation_params(aug_rng, seqs, flip_of_seq, ds_cfg.output_HW, ratios=(crop, scale))
            db["target"] = augment_batch(db["target"], off_t, crop, scale, flips)
            db["target_depth"] = augment_batch(db["target_depth"], off_t, crop, scale, flips)
            db["target_gt"] = augment_batch(db["target_gt"].astype(np.float32), off_t, crop, scale, flips, nearest=True)
            db["search_0"] = augment_batch(db["search_0"], off_s, crop, scale, flips)
            db["search_0_depth"] = augment_batch(db["search_0_depth"], off_s, crop, scale, flips)
            db["search_0_gt"] = augment_batch(db["search_0_gt"].astype(np.float32), off_s, crop, scale, flips, nearest=True)
            return db

    with mesh, trace(args.profile_dir or None):
        state = replicate(state, mesh)
        loss_history = []
        batch_keys = ["target", "target_depth", "target_gt", "search_0", "search_0_depth", "search_0_gt"]
        from jax.sharding import PartitionSpec

        batch_spec = PartitionSpec() if args.context_parallel else None  # CP: replicate

        def stage(batch):
            """Shard + (optionally) device-augment one host batch; runs ahead
            of the compute step inside the prefetcher so H2D transfers overlap
            the previous step's device time."""
            db = shard_batch({k: batch[k] for k in batch_keys}, mesh, spec=batch_spec)
            if args.device_augment:
                db["_seqs"] = batch["seq_name"]
                db = device_augment(db)
            return db

        for epoch in range(start_epoch, int(ds_cfg.max_epoches)):
            print("......epoch=", epoch)
            np.random.seed(args.random_seed + epoch)
            db_train.new_training_epoch()
            batches = map(stage, iter(trainloader)) if args.no_prefetch \
                else device_prefetch(iter(trainloader), put=stage)
            # Optional 1-deep software pipeline (same shape as the eval
            # loop, eval/runner.py): step k+1 dispatches before step k's
            # loss is fetched, so the per-step host sync (`float(loss)`)
            # could ride under the device computing step k+1. Step k's full
            # log block — the " Start batch" HBM line (sampled
            # pre-dispatch), " After step" line, and the Epoch loss line —
            # is buffered and emitted when its loss materializes: loss/lr
            # values and log-line ORDER are byte-identical to the serial
            # loop (pinned by tests/test_train_driver.py); the HBM lines
            # keep their slots but report whatever the device holds at
            # their sampling moment.
            # DEFAULT OFF: measured SLOWER on the tunneled-relay backend —
            # quiet-host 3×ABBA medians (benchmarks/train_loop_ab.py,
            # docs/evidence/TRAIN_PIPELINE_r04.json) show the pipelined
            # loop losing ~15% (the relay appears to drain the enqueue
            # queue on the D2H loss fetch, so the deeper pipe only adds
            # buffer pressure; round 3's contended capture overstated the
            # loss as 1.9×). On a directly-attached TPU, where dispatch is
            # cheap and D2H completion is out of order, set
            # COSNET_TRAIN_PIPELINE=1 to re-enable.
            pipelined = os.environ.get("COSNET_TRAIN_PIPELINE", "0") == "1"
            pending = None  # (i_iter, lr, device loss handle, start-batch HBM line)

            def consume(it, lr, loss_dev, start_line):
                loss = float(loss_dev)  # blocks until step `it` is complete
                if logger:
                    logger.write(start_line)
                log_device_memory(logger, " After step")
                loss_history.append(loss)
                print("===> Epoch[{}]({}/{}): Loss: {:.10f}  lr: {:.5f}".format(epoch, it, train_len, loss, lr))
                logger.epoch_line(epoch, it, train_len, loss, lr)

            for i_iter, device_batch in enumerate(batches):
                start_line = sample_memory_line(" Start batch")
                lr = float(lr_poly(args.learning_rate, i_iter + epoch * train_len, max_iter, args.power, epoch))
                if args.saliency_alternating:
                    state, loss = jitted_step(state, device_batch, lr, i_iter % 3 == 0)
                else:
                    state, loss = jitted_step(state, device_batch, lr)
                if pending is not None:
                    consume(*pending)
                    pending = None
                if pipelined:
                    pending = (i_iter, lr, loss, start_line)
                else:
                    consume(i_iter, lr, loss, start_line)
            if pending is not None:
                consume(*pending)  # flush before the epoch checkpoint

            print("=====> saving model")
            # The state is fully replicated (DP), so process 0 holds every
            # byte: it alone writes (np host arrays — no per-shard
            # coordination needed); the others hold at a barrier so no
            # process exits while the write is in flight.
            if jax.process_index() == 0:
                save_epoch(snapshot_dir, args.dataset, epoch, state,
                           orbax=jax.process_count() == 1)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"epoch_{epoch}_saved")

    hours = (time.time() - start) / 3600
    print(hours, "h")
    logger.write("total training time: {:.2f} h\n".format(hours))
    logger.close()

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.plot(np.arange(len(loss_history)), loss_history)
        plt.xlabel("epoch")
        plt.ylabel("loss")
        plt.savefig("training_loss_" + args.dataset + ".png")
    except Exception as e:  # plotting is best-effort
        print("loss plot failed:", e)


if __name__ == "__main__":
    main()
