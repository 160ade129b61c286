"""Worker for the REAL multi-process test (tests/test_multiprocess.py).

Launched as `python tests/_dist_worker.py <nproc> <pid> <port> <outdir>`.
With nproc=2 it initializes jax.distributed (Gloo CPU collectives, 4
virtual devices per process = 8 global) and runs the production
multi-host code paths FOR REAL — Loader process-sharding,
make_array_from_process_local_data in device_put_batch, the
process_allgather prediction merge and the perf broadcast in validate()
(engine/trainer.py) — instead of the single-process shard simulation.
With nproc=1 it runs the identical workload on a flat 8-device mesh as
the reference arm. Every process writes its metrics to
<outdir>/proc<pid>.json for the test to compare.
"""

import json
import os
import sys


def main():
    nproc, pid, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # repo root, launched from anywhere
    per_proc = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}"
    )
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )
    import jax.numpy as jnp
    import numpy as np

    from advmix_tpu.config import get_default_config
    from advmix_tpu.data import Loader
    from advmix_tpu.data.datasets import SyntheticPoseDataset
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.engine import trainer as trainer_lib
    from advmix_tpu.models.pose_resnet import PoseResNet
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic"
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.SIGMA = 2
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BATCH_SIZE_PER_GPU = 2
    # sync-BN: Loader sharding interleaves samples differently across the
    # process counts, and per-replica BN stats would make the two arms
    # differ through sample->replica placement rather than through the
    # multi-host code under test; global-batch stats are placement-proof
    cfg.TRAIN.CROSS_REPLICA_BN = True
    cfg.freeze()

    mesh = get_mesh()  # all 8 GLOBAL devices
    model = PoseResNet(num_layers=18, num_joints=4,
                       num_deconv_filters=(32, 32, 32))
    tx = optim.get_optimizer(cfg)
    st = state_lib.create_pose_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3))
    )
    st = replicate(st, mesh)
    train_step = steps.make_train_step(model, tx, cfg, mesh)
    prep_eval = trainer_lib.make_eval_preprocessor(cfg)

    # ---- 2 sharded train steps (global batch 16 = 8 local rows/process) --
    ds = SyntheticPoseDataset(cfg, is_train=False, length=24)
    train_loader = Loader(ds, 16 // nproc, shuffle=False, num_threads=1,
                          num_shards=nproc, shard_index=pid)
    losses = []
    it = iter(train_loader)
    for _ in range(2):
        host_batch = next(it)
        raw = device_put_batch(
            {k: host_batch[k] for k in ("image", "joints", "joints_vis")},
            mesh,
        )
        prepped = prep_eval(raw["image"], raw["joints"], raw["joints_vis"])
        st, metrics = train_step(st, prepped)
        losses.append(float(metrics["loss"]))

    # ---- sharded validate: allgather merge + broadcast ----
    val_loader = Loader(
        ds, cfg.TEST.BATCH_SIZE_PER_GPU * jax.local_device_count(),
        shuffle=False, num_threads=1, num_shards=nproc, shard_index=pid,
    )
    name_values, perf = trainer_lib.validate(
        cfg, steps.make_eval_step(model, cfg, ds.flip_pairs, mesh),
        prep_eval, st.params, st.batch_stats, ds, val_loader, mesh,
        os.path.join(outdir, f"val{pid}"),
    )
    out = {
        "pid": pid,
        "nproc": nproc,
        "losses": losses,
        "perf": float(perf),
        "name_values": {k: float(v) for k, v in (name_values or {}).items()},
        "param_sum": float(
            sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(st.params))
        ),
    }
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"worker {pid}/{nproc} done", flush=True)


if __name__ == "__main__":
    main()
