"""Step profiler CLI: capture a jax.profiler trace of the training step and
print the device-time / HBM-bytes breakdown per HLO category.

The TPU-native replacement for the reference's hook-based profiler
(`get_model_summary`, lib/utils/utils.py:110-242) at whole-program scope:
on a bandwidth-bound program (see PERF.md) the bytes column is the one
that predicts throughput.

Usage:
  python tools/profile.py --cfg experiments/synthetic/res18_64x64_smoke.yaml \
      [--advmix --sample_times 3] [--profile_steps 5] [--trace_dir DIR]

Bottom-up configs (MODEL.NAME == pose_higher_hrnet) dispatch the
bottom-up steps automatically, like bench.py's BENCH_CFG path.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if os.environ.get("ADVMIX_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["ADVMIX_PLATFORM"])

from _parse import parse_args  # noqa: E402


def _load_trace(trace_dir: str) -> dict:
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/", "*.trace.json.gz")
    ))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def analyze_kernels(trace_dir: str, n_steps: int,
                    peak_gbs: float = 663.0, peak_tflops: float = 197.0):
    """Per-kernel roofline: for every HLO op, sum device time and
    bytes_accessed/flops across steps, and compare achieved bandwidth and
    FLOP rate against the MEASURED chip peaks (tools/hbm_peak.py for the
    bandwidth; bf16 MXU spec for flops). A kernel's speed-of-light time is
    max(bytes/peak_bw, flops/peak_flops); the sum over kernels bounds the
    step time from below under perfect scheduling."""
    import collections

    data = _load_trace(trace_dir)
    agg = collections.defaultdict(lambda: [0.0, 0, 0, 0])  # dur, bytes, flops, count
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        c = a.get("hlo_category")
        if c is None or c == "while":
            continue
        k = e.get("name", "?")
        agg[k][0] += e["dur"]
        agg[k][1] += int(a.get("bytes_accessed", 0))
        agg[k][2] += int(float(a.get("model_flops", 0)))
        agg[k][3] += 1
    rows = []
    for k, (dur, byt, fl, cnt) in agg.items():
        t_ms = dur / n_steps / 1e3
        gb = byt / n_steps / 1e9
        gfl = fl / n_steps / 1e9
        sol_ms = max(gb / peak_gbs * 1e3, gfl / (peak_tflops * 1e3) * 1e3)
        rows.append((k, t_ms, gb, gfl, sol_ms, cnt // max(n_steps, 1)))
    rows.sort(key=lambda r: -r[1])
    return rows


def analyze_trace(trace_dir: str, n_steps: int) -> list:
    """Sum device events by hlo_category from the newest trace dump."""
    import collections

    data = _load_trace(trace_dir)

    cat_t = collections.Counter()
    cat_b = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        a = e.get("args", {})
        c = a.get("hlo_category")
        if c is None or c == "while":  # containers nest their children
            continue
        cat_t[c] += e["dur"]
        cat_b[c] += int(a.get("bytes_accessed", 0))
    if not cat_t:
        print("(no per-op device events in the trace — the hlo_category "
              "breakdown needs a TPU backend; CPU traces carry host "
              "events only)")
    rows = [
        (c, cat_t[c] / n_steps / 1e3, cat_b[c] / n_steps / 1e9)
        for c in cat_t
    ]
    rows.sort(key=lambda r: -r[1])
    return rows


def main(argv=None):
    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--profile_steps", type=int, default=5)
    extra.add_argument("--trace_dir", type=str, default="/tmp/advmix_trace")
    extra.add_argument("--per_kernel", type=int, default=0,
                       help="also print the top-N kernels with per-kernel "
                            "roofline (vs measured peaks)")
    extra.add_argument("--peak_gbs", type=float, default=663.0,
                       help="measured HBM bandwidth (tools/hbm_peak.py)")
    extra_args, rest = extra.parse_known_args(argv)
    args = parse_args(rest)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from advmix_tpu.config import get_default_config, update_config
    from advmix_tpu import models
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.engine import trainer as trainer_lib
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = get_default_config()
    update_config(cfg, args)

    mesh = get_mesh(args.num_devices or None)
    n_dev = mesh.devices.size
    dtype = (jnp.bfloat16
             if (args.dtype or cfg.TRAIN.DTYPE) == "bfloat16"
             else jnp.float32)
    advmix = bool(args.advmix) and args.sample_times > 1

    model = models.get_pose_net(cfg, dtype=dtype)
    w, h = cfg.MODEL.IMAGE_SIZE
    sample = jnp.zeros((2, h, w, 3), jnp.float32)
    tx = optim.get_optimizer(cfg)
    rng = jax.random.PRNGKey(0)
    bottomup = cfg.MODEL.NAME == "pose_higher_hrnet"
    if advmix:
        model_g = models.get_generator(args, dtype=dtype)
        tx_g = optim.get_generator_optimizer(cfg)
        st = state_lib.create_advmix_state(
            model, model_g, tx, tx_g, rng, sample,
            gen_input_chn=args.gen_input_chn,
        )
        make = (steps.make_bottomup_advmix_step if bottomup
                else steps.make_advmix_step)
        step_fn = make(
            model, model_g, tx, tx_g, cfg, mesh,
            alpha=args.alpha, adv_loss_weight=args.adv_loss_weight,
        )
    else:
        st = state_lib.create_pose_state(model, tx, rng, sample)
        make = steps.make_bottomup_step if bottomup else steps.make_train_step
        step_fn = make(model, tx, cfg, mesh)
    st = replicate(st, mesh)

    bs = cfg.TRAIN.BATCH_SIZE_PER_GPU * n_dev
    rs = np.random.RandomState(0)
    if bottomup:
        # multi-person joints; targets render inside the step per scale
        max_people = 10
        jshape = (bs, max_people, cfg.MODEL.NUM_JOINTS, 2)
        vshape = (bs, max_people, cfg.MODEL.NUM_JOINTS)
        prep_bu = trainer_lib.make_bottomup_preprocessor(cfg, advmix=advmix)

        def prep(raw, k):
            return prep_bu(raw["image"], raw["joints"], raw["joints_vis"], k)
    else:
        jshape = (bs, cfg.MODEL.NUM_JOINTS, 2)
        vshape = (bs, cfg.MODEL.NUM_JOINTS)
        prep = trainer_lib.make_preprocessor(cfg, advmix=advmix, train=True,
                                             mesh=mesh)
    raw = device_put_batch(
        {
            "image": jnp.asarray(
                rs.randint(0, 256, (bs, h, w, 3)).astype(np.float32)),
            "joints": jnp.asarray(
                rs.uniform(0, min(h, w) - 2, jshape).astype(np.float32)),
            "joints_vis": jnp.ones(vshape, jnp.float32),
        },
        mesh,
    )
    key = jax.random.PRNGKey(1)

    def one(state, i):
        batch = prep(raw, jax.random.fold_in(key, i))
        # the step donates its state arg; thread it through
        return step_fn(state, batch)

    # warmup/compile
    st, metrics = one(st, 0)
    jax.device_get(metrics)

    n = extra_args.profile_steps
    with jax.profiler.trace(extra_args.trace_dir):
        for i in range(n):
            st, metrics = one(st, 100 + i)
        jax.device_get(metrics)
        jax.device_get(jax.tree.leaves(st)[0].ravel()[:1])

    rows = analyze_trace(extra_args.trace_dir, n)
    tot_t = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\n=== step profile ({n} steps, batch {bs}, "
          f"{'advmix' if advmix else 'standard'}) ===")
    print(f"{'category':28s} {'ms/step':>9s} {'GB/step':>9s} {'GB/s':>7s}")
    for c, t, b in rows:
        bw = b * 1e3 / t if t else 0.0
        print(f"{c:28s} {t:9.2f} {b:9.2f} {bw:7.0f}")
    print(f"{'TOTAL':28s} {tot_t:9.2f} {tot_b:9.2f} "
          f"{tot_b * 1e3 / max(tot_t, 1e-9):7.0f}")
    print(f"=> {bs * 1e3 / max(tot_t, 1e-9):.1f} img/s device-side")

    if extra_args.per_kernel:
        krows = analyze_kernels(extra_args.trace_dir, n,
                                peak_gbs=extra_args.peak_gbs)
        sol_total = sum(r[4] for r in krows)
        print(f"\n=== top {extra_args.per_kernel} kernels "
              f"(roofline vs measured {extra_args.peak_gbs:.0f} GB/s) ===")
        print(f"{'kernel':48s} {'ms':>7s} {'GB':>7s} {'GFLOP':>8s} "
              f"{'SoL ms':>7s} {'x':>5s} {'n':>3s}")
        for k, t, b, fl, sol, cnt in krows[: extra_args.per_kernel]:
            ratio = t / sol if sol > 0 else float("inf")
            print(f"{k[:48]:48s} {t:7.2f} {b:7.2f} {fl:8.1f} {sol:7.2f} "
                  f"{ratio:5.1f} {cnt:3d}")
        print(f"speed-of-light sum (all kernels): {sol_total:.1f} ms "
              f"({bs * 1e3 / max(sol_total, 1e-9):.0f} img/s); "
              f"measured {tot_t:.1f} ms")


if __name__ == "__main__":
    main()
