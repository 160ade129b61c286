"""Training CLI.

Behavioral reference: `tools/train.py` — model (+ teacher copy and UNet
generator under --advmix, :64-69), datasets/loaders, two optimizers with
MultiStepLR (:184-186, 272-281), fine-tune loading with shape-filtered state
dicts (:198-235), AUTO_RESUME (:238-269), epoch loop with per-epoch validate
and best-model checkpointing (:283-328), final raw-weights export (:331-337).

TPU redesign: one compiled program per iteration over a data-parallel mesh;
the host loop only schedules epochs, LR writes and checkpoints.
"""

import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# honor ADVMIX_PLATFORM=cpu (the session sitecustomize force-registers the
# TPU backend and overrides JAX_PLATFORMS; jax.config wins over both)
if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])

import numpy as np

from _parse import parse_args  # noqa: E402


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advmix_tpu.config import get_default_config, update_config
    from advmix_tpu import models
    from advmix_tpu.data import CachedLoader, Loader, build_dataset
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.engine import trainer as trainer_lib
    from advmix_tpu.engine.checkpoint import (
        CheckpointManager,
        export_final_state,
        load_torch_checkpoint,
    )
    from advmix_tpu.parallel import get_mesh
    from advmix_tpu.parallel.mesh import replicate
    from advmix_tpu.utils.logging import create_logger, get_tb_writer
    from advmix_tpu.utils.summary import (
        model_summary, format_summary, per_layer_summary,
    )

    cfg = get_default_config()
    update_config(cfg, args)

    logger, output_dir, tb_dir = create_logger(cfg, args.cfg, "train")
    logger.info(pprint.pformat(vars(args)))

    mesh = get_mesh(args.num_devices or None)
    n_dev = mesh.devices.size
    dtype_name = args.dtype or cfg.TRAIN.DTYPE
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    logger.info(f"=> mesh: {n_dev} device(s), compute dtype {dtype_name}")

    model = models.get_pose_net(cfg, dtype=dtype)
    w, h = cfg.MODEL.IMAGE_SIZE
    sample = jnp.zeros((2, h, w, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)

    tx = optim.get_optimizer(cfg)

    bottomup = cfg.MODEL.NAME == "pose_higher_hrnet"
    advmix = bool(args.advmix) and args.sample_times > 1
    if advmix:
        model_g = models.get_generator(args, dtype=dtype)
        tx_g = optim.get_generator_optimizer(cfg)
        state = state_lib.create_advmix_state(
            model, model_g, tx, tx_g, rng, sample,
            gen_input_chn=args.gen_input_chn,
        )
        if dict(cfg.MODEL.EXTRA).get("HE_INIT"):
            state = state.replace(params_d=models.he_reinit_convs(
                state.params_d, jax.random.PRNGKey(42)))
            logger.info("=> HE_INIT: conv kernels re-initialized (He)")
        if cfg.MODEL.INIT_WEIGHTS and os.path.isfile(cfg.MODEL.PRETRAINED):
            # config PRETRAINED init (the reference applies init_weights at
            # model construction in every mode); --load_from_D below
            # overrides it, mirroring the reference's later fine-tune load
            variables = {"params": state.params_d,
                         "batch_stats": state.batch_stats_d}
            layers = dict(cfg.MODEL.EXTRA).get("PRETRAINED_LAYERS")
            loaded = load_torch_checkpoint(cfg.MODEL.PRETRAINED, variables,
                                           pretrained_layers=layers)
            state = state.replace(
                params_d=loaded["params"],
                batch_stats_d=loaded["batch_stats"],
                params_t=jax.tree.map(np.copy, loaded["params"]),
                batch_stats_t=jax.tree.map(np.copy, loaded["batch_stats"]),
            )
            logger.info(f"=> loaded pretrained {cfg.MODEL.PRETRAINED}")
        if args.load_from_D:
            variables = {"params": state.params_d,
                         "batch_stats": state.batch_stats_d}
            if os.path.isdir(args.load_from_D):
                # native orbax final_state / weights dir
                from advmix_tpu.engine.checkpoint import load_final_state

                loaded = load_final_state(args.load_from_D, variables)
            else:
                loaded = load_torch_checkpoint(args.load_from_D, variables)
            state = state.replace(
                params_d=loaded["params"],
                batch_stats_d=loaded["batch_stats"],
                params_t=jax.tree.map(np.copy, loaded["params"]),
                batch_stats_t=jax.tree.map(np.copy, loaded["batch_stats"]),
            )
            logger.info(f"=> loaded D and teacher from {args.load_from_D}")
        if args.load_from_G:
            if args.load_from_G.endswith(".pth"):
                # torch UnetGenerator checkpoint: the recursive module
                # naming maps mechanically onto our flattened encoder/
                # decoder (torch_convert.torch_unet_to_flax; forward
                # parity tested vs the reference model)
                import torch as _torch

                from advmix_tpu.models.torch_convert import torch_unet_to_flax

                payload = _torch.load(args.load_from_G, map_location="cpu",
                                      weights_only=False)
                if isinstance(payload, dict) and "state_dict" in payload:
                    payload = payload["state_dict"]
                loaded_g = torch_unet_to_flax(
                    payload, {"params": state.params_g},
                    num_downs=args.downsamples,
                )
                state = state.replace(params_g=loaded_g["params"])
                logger.info(f"=> loaded torch G from {args.load_from_G}")
            else:
                import orbax.checkpoint as ocp

                g_params = ocp.PyTreeCheckpointer().restore(
                    os.path.abspath(args.load_from_G)
                )
                if isinstance(g_params, dict) and "params" in g_params:
                    g_params = g_params["params"]
                state = state.replace(params_g=g_params)
                logger.info(f"=> loaded G from {args.load_from_G}")
        if bottomup:
            if cfg.TRAIN.INT8_TEACHER:
                # measured counterproductive for HigherHRNet (PERF.md: the
                # 512px bottom-up forward is conv-emitter-bound at C=32,
                # int8 serving LOST 18%); the step's teacher_apply hook
                # stays available for callers who want it anyway
                logger.warning(
                    "=> TRAIN.INT8_TEACHER ignored for bottom-up configs "
                    "(measured slower than bf16 on HigherHRNet, PERF.md)"
                )
            step_fn = steps.make_bottomup_advmix_step(
                model, model_g, tx, tx_g, cfg, mesh,
                alpha=args.alpha, adv_loss_weight=args.adv_loss_weight,
            )
        else:
            # deferred until train_dataset exists: TRAIN.INT8_TEACHER
            # calibrates on the first train batches (no throwaway second
            # dataset construction)
            step_fn = None
    else:
        state = state_lib.create_pose_state(model, tx, rng, sample)
        if dict(cfg.MODEL.EXTRA).get("HE_INIT"):
            state = state.replace(params=models.he_reinit_convs(
                state.params, jax.random.PRNGKey(42)))
            logger.info("=> HE_INIT: conv kernels re-initialized (He)")
        if cfg.MODEL.INIT_WEIGHTS and os.path.isfile(cfg.MODEL.PRETRAINED):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            # PRETRAINED_LAYERS selective init (pose_hrnet.py:462-492)
            layers = dict(cfg.MODEL.EXTRA).get("PRETRAINED_LAYERS")
            loaded = load_torch_checkpoint(cfg.MODEL.PRETRAINED, variables,
                                           pretrained_layers=layers)
            state = state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
            logger.info(f"=> loaded pretrained {cfg.MODEL.PRETRAINED}")
        if args.load_from_D:
            # standard-mode warm start from a prior run (orbax final_state
            # dir or torch .pth) — the equal-optimization-budget control
            # arm of scripts/advmix_demo.sh continues standard training
            # with the same extra-epoch budget the advmix arm gets. Runs
            # AFTER the config PRETRAINED load so the explicit CLI warm
            # start wins (the reference applies init_weights at model
            # construction and its fine-tune load later,
            # tools/train.py:198-235).
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            if os.path.isdir(args.load_from_D):
                from advmix_tpu.engine.checkpoint import load_final_state

                loaded = load_final_state(args.load_from_D, variables)
            else:
                loaded = load_torch_checkpoint(args.load_from_D, variables)
            state = state.replace(
                params=loaded["params"], batch_stats=loaded["batch_stats"]
            )
            logger.info(f"=> loaded D from {args.load_from_D}")
        if bottomup:
            step_fn = steps.make_bottomup_step(model, tx, cfg, mesh)
        else:
            step_fn = steps.make_train_step(model, tx, cfg, mesh,
                                            debug=cfg.DEBUG.DEBUG)

    var0 = {"params": state.params_d if advmix else state.params,
            "batch_stats": state.batch_stats_d if advmix else state.batch_stats}
    logger.info(format_summary(model_summary(model, var0, sample),
                               cfg.MODEL.NAME))
    # per-layer params/FLOPs table (reference tools/train.py:102)
    logger.info("\n" + per_layer_summary(model, sample))

    # datasets
    train_dataset = build_dataset(cfg, is_train=True)
    if args.stylize_image:
        # union with the stylized copy (reference tools/train.py:145-163);
        # style_tags feed the --sp_style augmentation exemptions
        from advmix_tpu.data.datasets import ConcatDataset, build_stylized_dataset

        train_dataset = ConcatDataset(
            [train_dataset, build_stylized_dataset(cfg, is_train=True)],
            style_tags=[0.0, 1.0],
        )
    # MINI_COCO debug mode validates on the train set (tools/train.py:127-134)
    valid_dataset = build_dataset(
        cfg,
        is_train=False,
        image_set=cfg.DATASET.TRAIN_SET if cfg.DATASET.MINI_COCO else None,
    )
    # multi-host: each process loads its local slice of the global batch
    # (Loader shards; parallel.device_put_batch assembles via
    # make_array_from_process_local_data)
    n_proc = jax.process_count()
    local_dev = max(1, n_dev // n_proc)
    batch_size = cfg.TRAIN.BATCH_SIZE_PER_GPU * local_dev
    test_batch = cfg.TEST.BATCH_SIZE_PER_GPU * local_dev
    shard_kw = dict(num_shards=n_proc, shard_index=jax.process_index())
    device_warp = bool(cfg.DATASET.DEVICE_WARP) and not bottomup
    train_loader = Loader(train_dataset, batch_size,
                          shuffle=cfg.TRAIN.SHUFFLE, drop_last=True,
                          raw_mode=device_warp,
                          bucket_hw=tuple(cfg.DATASET.WARP_BUCKET),
                          **shard_kw)
    # eval is sharded too: each process evaluates only its slice, then
    # validate() allgathers predictions and runs COCOeval/PCKh on
    # process 0 (an N-host corruption sweep does 1/N of the decode work
    # per host instead of all of it)
    # every epoch's validation prepares the SAME deterministic batches;
    # replay them from host RAM after the first epoch (byte-budgeted —
    # big val sets fall through to the live loader)
    valid_loader = CachedLoader(
        Loader(valid_dataset, test_batch, shuffle=False, **shard_kw)
    )
    if device_warp:
        logger.info("=> device-warp input pipeline (host decodes only; "
                    f"bucket {tuple(cfg.DATASET.WARP_BUCKET)})")
    logger.info(
        f"=> {len(train_dataset)} train / {len(valid_dataset)} val samples"
    )

    if advmix and step_fn is None:
        # deferred top-down advmix step construction (see above): the
        # optional int8 teacher calibrates on the ACTUAL train dataset
        teacher_apply = None
        if cfg.TRAIN.INT8_TEACHER:
            # int8 (W8A8) teacher forward — the teacher is frozen
            # inference; calibrate its activation scales on the first
            # clean train batches through the unscanned construction
            # (ops/quant.py; the step unstacks scanned teacher params
            # in-trace). KD targets become int8-rounded: opt-in.
            from advmix_tpu.ops import quant

            teacher_apply, act_scales = quant.int8_teacher_from_config(
                cfg, dtype,
                {"params": state.params_t,
                 "batch_stats": state.batch_stats_t},
                loader=Loader(train_dataset, cfg.TRAIN.BATCH_SIZE_PER_GPU,
                              shuffle=False),
                n_batches=cfg.TEST.INT8_CALIB_BATCHES,
                margin=float(cfg.TEST.INT8_CALIB_MARGIN),
            )
            logger.info(f"=> int8 teacher: {len(act_scales)} convs "
                        "calibrated")
        step_fn = steps.make_advmix_step(
            model, model_g, tx, tx_g, cfg, mesh,
            alpha=args.alpha, adv_loss_weight=args.adv_loss_weight,
            debug=cfg.DEBUG.DEBUG, teacher_apply=teacher_apply,
        )

    if bottomup:
        prep_train = trainer_lib.make_bottomup_preprocessor(cfg, advmix=advmix)
        eval_step = steps.make_bottomup_eval_step(
            model, cfg, valid_dataset.flip_pairs, mesh,
            scales=tuple(cfg.TEST.SCALE_FACTOR),
        )
        prep_eval = None
    else:
        prep_train = trainer_lib.make_preprocessor(
            cfg, advmix=advmix, train=True,
            random_corruption=args.random_corruption, mesh=mesh,
            sp_style=bool(args.sp_style and args.stylize_image),
            device_warp=device_warp,
        )
        prep_eval = trainer_lib.make_eval_preprocessor(cfg)
        eval_step = steps.make_eval_step(
            model, cfg, valid_dataset.flip_pairs, mesh,
            debug=bool(cfg.DEBUG.DEBUG),
        )

    ckpt = CheckpointManager(output_dir)
    begin_epoch = cfg.TRAIN.BEGIN_EPOCH
    best_perf = -1.0

    if cfg.AUTO_RESUME:
        restored = ckpt.restore(item=state)
        if restored is not None:
            state = jax.tree.map(
                lambda t, s: jnp.asarray(s, getattr(t, "dtype", None)),
                state, restored["state"],
            )
            begin_epoch = int(restored["epoch"]) + 1
            best_perf = float(restored["perf"])
            logger.info(f"=> auto-resumed at epoch {begin_epoch}")

    state = replicate(state, mesh)
    writer = get_tb_writer(tb_dir)
    writer_state = {"train_global_steps": 0, "valid_global_steps": 0}
    key = jax.random.PRNGKey(1234)

    for epoch in range(begin_epoch, cfg.TRAIN.END_EPOCH):
        # per-epoch MultiStepLR writes (tools/train.py:272-281)
        if advmix:
            new_opt_d, lr = optim.epoch_lr_update(state.opt_state_d, cfg, epoch)
            new_opt_g, _ = optim.epoch_lr_update(state.opt_state_g, cfg, epoch)
            state = state.replace(opt_state_d=new_opt_d, opt_state_g=new_opt_g)
        else:
            new_opt, lr = optim.epoch_lr_update(state.opt_state, cfg, epoch)
            state = state.replace(opt_state=new_opt)
        logger.info(f"=> epoch {epoch} lr {lr:.6g}")

        train_loader.set_epoch(epoch)
        if bottomup:
            state, key = trainer_lib.train_epoch_bottomup(
                cfg, step_fn, prep_train, state, train_loader, mesh, epoch,
                key, advmix=advmix,
            )
        else:
            state, key = trainer_lib.train_epoch(
                cfg, step_fn, prep_train, state, train_loader, mesh, epoch,
                key, writer, writer_state, advmix=advmix,
            )

        params = state.params_d if advmix else state.params
        stats = state.batch_stats_d if advmix else state.batch_stats
        if bottomup:
            name_values, perf = trainer_lib.validate_bottomup(
                cfg, eval_step, params, stats, valid_dataset, valid_loader,
                mesh, output_dir,
            )
        else:
            name_values, perf = trainer_lib.validate(
                cfg, eval_step, prep_eval, params, stats, valid_dataset,
                valid_loader, mesh, output_dir, writer, writer_state,
                debug_out_dir=(
                    trainer_lib.output_dir_of(cfg)
                    if cfg.DEBUG.DEBUG else None
                ),
            )

        is_best = perf > best_perf
        best_perf = max(perf, best_perf)
        logger.info(f"=> saving checkpoint to {output_dir} (best: {is_best})")
        ckpt.save(epoch, jax.device_get(state), perf, is_best)

    ckpt.wait()  # barrier the last async checkpoint before the export
    params = state.params_d if advmix else state.params
    stats = state.batch_stats_d if advmix else state.batch_stats
    final = export_final_state(
        output_dir,
        jax.device_get({"params": params, "batch_stats": stats}),
    )
    logger.info(f"=> final state saved to {final}")
    writer.close()


if __name__ == "__main__":
    main()
