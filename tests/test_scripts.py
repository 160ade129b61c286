"""CI-style smoke of the shell scripts (reference surface:
`/root/reference/scripts/{train,test,make_datasets}.sh`).

Each script must run end-to-end on CPU against the synthetic config —
VERDICT r1 found the shipped scripts pointed at nonexistent YAMLs and had
never been executed. These subprocess tests are the gate against that.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_CFG = "experiments/synthetic/res18_64x64_smoke.yaml"


def _run(script, extra, env_extra, cwd, timeout=900):
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    env.update(env_extra)
    return subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script)] + extra,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_train_then_test_scripts(tmp_path):
    out_dir = str(tmp_path / "out")
    log_dir = str(tmp_path / "log")
    opts = ["OUTPUT_DIR", out_dir, "LOG_DIR", log_dir,
            "TRAIN.END_EPOCH", "1"]

    r = _run("train.sh", ["--num_devices", "2"] + opts,
             {"CFG": SMOKE_CFG}, REPO)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    final = os.path.join(
        out_dir, "synthetic", "pose_resnet", "res18_64x64_smoke",
        "final_state",
    )
    assert os.path.isdir(final), (
        f"train.sh did not export {final}; tree: "
        f"{[p for p, _, _ in os.walk(out_dir)]}"
    )

    # test.sh: 1-corruption on-the-fly sweep against the exported weights.
    # argparse flags go via $FLAGS (before the yacs opts; opts are
    # REMAINDER); robust runs write under <OUTPUT_DIR>_robustness
    r = _run(
        "test.sh", opts,
        {"CFG": SMOKE_CFG, "MODEL_FILE": final,
         "FLAGS": "--num_devices 2 --on_the_fly "
                  "--distortions gaussian_noise"}, REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    csvs = []
    for root, _, fs in os.walk(out_dir + "_robustness"):
        csvs += [os.path.join(root, f) for f in fs if f.endswith(".csv")]
    assert csvs, "test.sh produced no mPC/rPC csv"
    with open(csvs[0]) as f:
        header = f.readline()
    assert "clean_" in header and "mean_corrupted_" in header


@pytest.mark.slow
def test_train_config_pretrained_init(tmp_path):
    """MODEL.INIT_WEIGHTS + MODEL.PRETRAINED initializes D from a torch
    checkpoint in BOTH train modes (the reference applies init_weights at
    model construction, `lib/models/pose_resnet.py:270-296`), with an
    explicit --load_from_D taking precedence over the config init."""
    import torch

    from test_models import _TorchPoseResNet18

    torch.manual_seed(3)
    t = _TorchPoseResNet18(num_joints=8, deconv_filters=64)
    pth = str(tmp_path / "pretrained.pth")
    torch.save({"state_dict": t.state_dict()}, pth)
    want_conv1 = t.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)

    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )

    def train(out, extra_flags):
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "train.py"),
             "--cfg", SMOKE_CFG, "--num_devices", "2"] + extra_flags +
            ["OUTPUT_DIR", str(tmp_path / out), "LOG_DIR",
             str(tmp_path / "log"), "TRAIN.END_EPOCH", "0",
             "MODEL.INIT_WEIGHTS", "True", "MODEL.PRETRAINED", pth],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        return os.path.join(
            str(tmp_path / out), "synthetic", "pose_resnet",
            "res18_64x64_smoke", "final_state",
        )

    def conv1_of(final):
        import orbax.checkpoint as ocp

        v = ocp.PyTreeCheckpointer().restore(os.path.abspath(final))
        return np.asarray(v["params"]["conv1"]["kernel"])

    # standard mode: exported D must carry the pretrained weights
    np.testing.assert_allclose(
        conv1_of(train("out_std", [])), want_conv1, atol=1e-6)

    # advmix mode: D (and hence the export) seeds from PRETRAINED too
    np.testing.assert_allclose(
        conv1_of(train("out_adv", ["--advmix", "--sample_times", "3"])),
        want_conv1, atol=1e-6)

    # precedence: an explicit --load_from_D must override the config init
    torch.manual_seed(7)
    t2 = _TorchPoseResNet18(num_joints=8, deconv_filters=64)
    pth2 = str(tmp_path / "warm.pth")
    torch.save({"state_dict": t2.state_dict()}, pth2)
    got = conv1_of(train("out_warm", ["--load_from_D", pth2]))
    np.testing.assert_allclose(
        got, t2.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
        atol=1e-6)


@pytest.mark.slow
def test_make_datasets_script(tmp_path):
    import cv2

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.RandomState(0)
    # two distinct resolutions that land in ONE padded size class
    for i, (h, w) in enumerate([(40, 60), (37, 55)]):
        cv2.imwrite(str(src / f"{i:012d}.jpg"),
                    rng.randint(0, 255, (h, w, 3), np.uint8))
    r = _run(
        "make_datasets.sh",
        ["--corruptions", "gaussian_noise", "--bucket_quantum", "64"],
        {"COCO_ROOT": str(src), "MPII_ROOT": str(tmp_path / "absent"),
         "OUT_ROOT": str(tmp_path)}, REPO,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    for sev in range(5):
        d = tmp_path / "coco-C" / "gaussian_noise" / str(sev)
        files = sorted(os.listdir(d))
        assert files == ["000000000000.jpg", "000000000001.jpg"], files
    # padded render then crop must preserve the original resolution
    out = cv2.imread(str(tmp_path / "coco-C/gaussian_noise/0/000000000001.jpg"))
    assert out.shape == (37, 55, 3)


TINY_HIGHER_OVR = [
    "MODEL.IMAGE_SIZE", "[64,64]", "MODEL.HEATMAP_SIZE", "[16,16]",
    "TEST.BATCH_SIZE_PER_GPU", "2",
    "MODEL.EXTRA.STAGE2.NUM_BLOCKS", "[1,1]",
    "MODEL.EXTRA.STAGE3.NUM_BLOCKS", "[1,1,1]",
    "MODEL.EXTRA.STAGE4.NUM_BLOCKS", "[1,1,1,1]",
    "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
    "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
    "MODEL.EXTRA.STAGE2.NUM_CHANNELS", "[8,16]",
    "MODEL.EXTRA.STAGE3.NUM_CHANNELS", "[8,16,32]",
    "MODEL.EXTRA.STAGE4.NUM_CHANNELS", "[8,16,32,64]",
    "MODEL.EXTRA.DECONV.NUM_CHANNELS", "[8]",
]


def _ochuman_tree(root, n=3):
    """Tiny OCHuman/COCO-format val tree (images + keypoint annotations)."""
    import json as jsonlib

    import cv2

    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(1, n + 1):
        img = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "val2017" / ("%012d.jpg" % i)), img)
        images.append(dict(id=i, width=128, height=96))
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(20, 110)), float(rng.uniform(20, 80)), 2]
        annotations.append(
            dict(id=i, image_id=i, category_id=1, keypoints=kps,
                 num_keypoints=17, bbox=[10, 10, 110, 80], area=8800.0,
                 iscrowd=0)
        )
    jsonlib.dump(
        dict(images=images, annotations=annotations),
        open(root / "annotations" / "person_keypoints_val2017.json", "w"),
    )


@pytest.mark.slow
def test_bottomup_ochuman_corruption_sweep(tmp_path):
    """End-to-end bottom-up corruption sweep (VERDICT r1 item #9):
    tools/test_corruption.py on an OCHuman-format fixture produces the
    mPC/rPC CSV through the bottom-up eval path."""
    root = tmp_path / "ochuman"
    _ochuman_tree(root)

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    # tiny HigherHRNet so CPU compile stays in seconds
    r = subprocess.run(
        [sys.executable, "tools/test_corruption.py",
         "--cfg", "experiments/ochuman/higher_hrnet/w32_512_advmix.yaml",
         "--exp_id", "ochuman_smoke",
         "--num_devices", "2",
         "--on_the_fly", "--distortions", "brightness",
         "OUTPUT_DIR", out_dir, "LOG_DIR", str(tmp_path / "log"),
         "DATASET.ROOT", str(root)]
        + TINY_HIGHER_OVR
        + ["TEST.MODEL_FILE", "none"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    csvs = []
    for rt, _, fs in os.walk(out_dir + "_robustness"):
        csvs += [os.path.join(rt, f) for f in fs if f.endswith(".csv")]
    assert csvs, "bottom-up sweep produced no csv"
    with open(csvs[0]) as f:
        head = f.readline()
        row = f.readline()
    assert "brightness" in head and row.strip(), (head, row)


@pytest.mark.slow
def test_bottomup_multiscale_eval_end_to_end(tmp_path):
    """TEST.SCALE_FACTOR [0.5,1,2] through the FULL bottom-up eval chain —
    validate_bottomup (one jitted multi-scale program) -> host grouping ->
    back-projection -> COCO evaluator -> AP CSV — the same subprocess
    treatment single-scale gets above (VERDICT r4 #10). Asserts the sweep
    completes and emits AP-style numbers, i.e. multi-scale aggregation
    feeds the evaluator a sane contract end-to-end."""
    root = tmp_path / "ochuman"
    _ochuman_tree(root)

    out_dir = str(tmp_path / "out")
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    r = subprocess.run(
        [sys.executable, "tools/test_corruption.py",
         "--cfg", "experiments/ochuman/higher_hrnet/w32_512_advmix.yaml",
         "--exp_id", "ochuman_ms",
         "--num_devices", "2",
         "--on_the_fly", "--distortions", "brightness",
         "OUTPUT_DIR", out_dir, "LOG_DIR", str(tmp_path / "log"),
         "DATASET.ROOT", str(root),
         "TEST.SCALE_FACTOR", "[0.5,1,2]"]
        + TINY_HIGHER_OVR
        + ["TEST.MODEL_FILE", "none"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    csvs = []
    for rt, _, fs in os.walk(out_dir + "_robustness"):
        csvs += [os.path.join(rt, f) for f in fs if f.endswith(".csv")]
    assert csvs, "multi-scale sweep produced no csv"
    with open(csvs[0]) as f:
        head = f.readline().strip().split(",")
        row = f.readline().strip().split(",")
    assert row and len(row) == len(head), (head, row)
    # AP-style sanity: clean metric parses as a float in [0, 1]
    clean = float(row[head.index([h for h in head
                                  if h.startswith("clean_")][0])])
    assert 0.0 <= clean <= 1.0, clean


@pytest.mark.slow
def test_profile_cli_smoke(tmp_path):
    """tools/profile.py runs end-to-end; on CPU the per-op breakdown is
    empty (host traces carry no hlo_category events) but the CLI must
    complete and emit the table scaffold."""
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    r = subprocess.run(
        [sys.executable, "tools/profile.py",
         "--cfg", "experiments/synthetic/res18_64x64_smoke.yaml",
         "--num_devices", "2", "--profile_steps", "2",
         "--trace_dir", str(tmp_path / "trace"),
         "TRAIN.BATCH_SIZE_PER_GPU", "4"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "step profile" in r.stdout


@pytest.mark.slow
def test_profile_cli_bottomup(tmp_path):
    """tools/profile.py dispatches the bottom-up AdvMix step for
    higher_hrnet configs (shrunken stages keep the CPU compile small)."""
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    r = subprocess.run(
        [sys.executable, "tools/profile.py",
         "--cfg", "experiments/coco/higher_hrnet/w32_512_advmix.yaml",
         "--advmix", "--sample_times", "3",
         "--num_devices", "2", "--profile_steps", "1",
         "--trace_dir", str(tmp_path / "trace"),
         "TRAIN.BATCH_SIZE_PER_GPU", "2",
         "MODEL.IMAGE_SIZE", "[64,64]", "MODEL.HEATMAP_SIZE", "[16,16]",
         "MODEL.EXTRA.STAGE2.NUM_BLOCKS", "[1,1]",
         "MODEL.EXTRA.STAGE3.NUM_BLOCKS", "[1,1,1]",
         "MODEL.EXTRA.STAGE4.NUM_BLOCKS", "[1,1,1,1]",
         "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
         "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
         "MODEL.EXTRA.STAGE2.NUM_CHANNELS", "[8,16]",
         "MODEL.EXTRA.STAGE3.NUM_CHANNELS", "[8,16,32]",
         "MODEL.EXTRA.STAGE4.NUM_CHANNELS", "[8,16,32,64]",
         "MODEL.EXTRA.DECONV.NUM_CHANNELS", "[8]"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "step profile" in r.stdout
    assert "advmix" in r.stdout


@pytest.mark.slow
def test_export_cli_roundtrip(tmp_path):
    """tools/export.py: AOT StableHLO export of the inference step +
    deserialize/execute round-trip + orbax weights copy."""
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    out = tmp_path / "export"
    r = subprocess.run(
        [sys.executable, "tools/export.py",
         "--cfg", "experiments/synthetic/res18_64x64_smoke.yaml",
         "--batch", "0", "--out", str(out),  # 0 = batch-polymorphic
         "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (out / "pose_infer.stablehlo").stat().st_size > 10000
    assert (out / "final_state").is_dir()

    # the artifact is loadable without any model code
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    import orbax.checkpoint as ocp

    blob = (out / "pose_infer.stablehlo").read_bytes()
    fn = jexport.deserialize(bytearray(blob))
    variables = ocp.PyTreeCheckpointer().restore(str(out / "final_state"))
    res = fn.call(variables["params"], variables.get("batch_stats", {}),
                  jnp.zeros((4, 64, 64, 3), jnp.float32))
    assert np.asarray(res).shape == (4, 8, 3)
    # polymorphic module serves other batch sizes from the same blob
    res9 = fn.call(variables["params"], variables.get("batch_stats", {}),
                   jnp.zeros((9, 64, 64, 3), jnp.float32))
    assert np.asarray(res9).shape == (9, 8, 3)


def test_demo_summary_reads_write_final_csv_columns(tmp_path):
    """scripts/demo_summary.py must read the columns write_final_csv
    actually emits for BOTH dataset families — a wrong key here silently
    reports mPC/rPC as zero (the round-3 demo script bug)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from test_corruption import write_final_csv, BENCHMARK_15
        import demo_summary
    finally:
        sys.path.pop(0), sys.path.pop(0)

    distortions = list(BENCHMARK_15)
    rng = np.random.RandomState(0)
    for ds, tag, clean in [("synthetic", "standard", 0.8),
                           ("mpii", "advmix", 0.6)]:
        vals = rng.uniform(0.2, 0.5, len(distortions) * 5)
        write_final_csv([clean] + vals.tolist(), distortions,
                        str(tmp_path), f"results_{tag}", ds)
        got_clean, got_mpc, got_rpc = demo_summary.read_arm(
            str(tmp_path), tag)
        want_mpc = np.mean([round(np.mean(vals[i * 5:i * 5 + 5]), 3)
                            for i in range(len(distortions))])
        assert got_clean == clean
        np.testing.assert_allclose(got_mpc, want_mpc, atol=5e-4)
        assert got_rpc > 0 and abs(got_rpc - got_mpc / clean) < 2e-3


@pytest.mark.slow
def test_export_cli_int8(tmp_path):
    """tools/export.py --int8: W8A8 export with dataset-batch calibration;
    the quantized StableHLO module round-trips without model code."""
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    out = tmp_path / "export_i8"
    r = subprocess.run(
        [sys.executable, "tools/export.py",
         "--cfg", "experiments/synthetic/res18_64x64_smoke.yaml",
         "--int8", "--batch", "4", "--out", str(out),
         "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    log = r.stdout + r.stderr
    assert "int8:" in log and "convs calibrated" in log

    import jax.numpy as jnp
    from jax import export as jexport
    import orbax.checkpoint as ocp

    blob = (out / "pose_infer.stablehlo").read_bytes()
    fn = jexport.deserialize(bytearray(blob))
    variables = ocp.PyTreeCheckpointer().restore(str(out / "final_state"))
    res = fn.call(variables["params"], variables.get("batch_stats", {}),
                  jnp.zeros((4, 64, 64, 3), jnp.float32))
    arr = np.asarray(res)
    assert arr.shape == (4, 8, 3) and np.isfinite(arr).all()
    # the module's convs really are int8
    assert "i8" in fn.mlir_module()


@pytest.mark.slow
@pytest.mark.parametrize("use_scan", [False, True])
def test_int8_corruption_sweep_cli(tmp_path, use_scan):
    """TEST.INT8 drives the whole on-the-fly sweep through int8 convs.

    use_scan=True is the shipped-YAML shape (VERDICT r3 #7): the CLI must
    auto-derive the unscanned view for calibration/eval instead of
    requiring a manual MODEL.EXTRA.USE_SCAN override."""
    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    out_dir = str(tmp_path / "out")
    r = subprocess.run(
        [sys.executable, "tools/test_corruption.py",
         "--cfg", "experiments/synthetic/res18_64x64_smoke.yaml",
         "--exp_id", "int8_smoke",
         "--num_devices", "2",
         "--on_the_fly", "--distortions", "brightness",
         "OUTPUT_DIR", out_dir, "LOG_DIR", str(tmp_path / "log"),
         "TEST.INT8", "True", "TEST.INT8_CALIB_BATCHES", "1",
         "TEST.BATCH_SIZE_PER_GPU", "2",
         "MODEL.EXTRA.USE_SCAN", "True" if use_scan else "False"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "int8 eval:" in (r.stdout + r.stderr)
    if use_scan:
        assert "auto-unscanned" in (r.stdout + r.stderr)
    csvs = []
    for root, _, fs in os.walk(out_dir + "_robustness"):
        csvs += [os.path.join(root, f) for f in fs if f.endswith(".csv")]
    assert csvs, "int8 sweep produced no csv"


@pytest.mark.slow
def test_bench_cfg_knob(tmp_path):
    """bench.py honors BENCH_CFG (model swapped by YAML) and still prints
    the driver's one-JSON-line contract."""
    import json as jsonlib

    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
        BENCH_CFG="experiments/synthetic/res18_64x64_smoke.yaml",
        BENCH_BATCH="4", BENCH_STEPS="2", BENCH_WINDOWS="1",
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = jsonlib.loads(line)
    assert out["unit"] == "img/s/chip" and out["value"] > 0
    assert "vs_baseline" in out
    assert "res18_64x64_smoke" in out["metric"]


@pytest.mark.slow
def test_bench_bottomup_cfg(tmp_path):
    """bench.py dispatches the bottom-up AdvMix step for higher_hrnet
    configs (BENCH_OPTS shrinks the model so CPU compile stays small)."""
    import json as jsonlib

    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
        BENCH_CFG="experiments/coco/higher_hrnet/w32_512_advmix.yaml",
        BENCH_OPTS=(
            "MODEL.IMAGE_SIZE [64,64] MODEL.HEATMAP_SIZE [16,16] "
            "MODEL.EXTRA.STAGE2.NUM_BLOCKS [1,1] "
            "MODEL.EXTRA.STAGE3.NUM_BLOCKS [1,1,1] "
            "MODEL.EXTRA.STAGE4.NUM_BLOCKS [1,1,1,1] "
            "MODEL.EXTRA.STAGE3.NUM_MODULES 1 "
            "MODEL.EXTRA.STAGE4.NUM_MODULES 1 "
            "MODEL.EXTRA.STAGE2.NUM_CHANNELS [8,16] "
            "MODEL.EXTRA.STAGE3.NUM_CHANNELS [8,16,32] "
            "MODEL.EXTRA.STAGE4.NUM_CHANNELS [8,16,32,64] "
            "MODEL.EXTRA.DECONV.NUM_CHANNELS [8]"
        ),
        BENCH_BATCH="2", BENCH_STEPS="1", BENCH_WINDOWS="1",
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = jsonlib.loads(line)
    assert out["unit"] == "img/s/chip" and out["value"] > 0
    assert "w32_512_advmix" in out["metric"]


@pytest.mark.slow
def test_serving_bench_cli(tmp_path):
    """tools/serving_bench.py runs all three arms on a tiny config and
    prints the one-JSON-line contract."""
    import json as jsonlib

    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    for arm in ("bf16", "int8pre"):
        r = subprocess.run(
            [sys.executable, "tools/serving_bench.py",
             "--cfg", "experiments/synthetic/res18_64x64_smoke.yaml",
             "--arm", arm, "--batch", "4", "--steps", "2",
             "--num_devices", "2",
             "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, arm + ": " + r.stdout[-2000:] + r.stderr[-2000:]
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out = jsonlib.loads(line)
        assert out["unit"] == "img/s" and out["value"] > 0
        assert arm in out["metric"]


@pytest.mark.slow
def test_serving_bench_bottomup(tmp_path):
    """serving_bench dispatches the bottom-up eval step (flip TTA +
    multi-scale aggregate + on-device peaks) for higher_hrnet configs,
    honoring the TEST.SCALE_FACTOR multi-scale test protocol."""
    import json as jsonlib

    env = dict(os.environ)
    env.update(
        ADVMIX_PLATFORM="cpu", JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache_tests",
    )
    r = subprocess.run(
        [sys.executable, "tools/serving_bench.py",
         "--cfg", "experiments/coco/higher_hrnet/w32_512_advmix.yaml",
         "--arm", "bf16", "--batch", "2", "--steps", "1",
         "--num_devices", "2",
         "TEST.SCALE_FACTOR", "[0.5,1,2]",
         "MODEL.IMAGE_SIZE", "[64,64]", "MODEL.HEATMAP_SIZE", "[16,16]",
         "MODEL.EXTRA.STAGE2.NUM_BLOCKS", "[1,1]",
         "MODEL.EXTRA.STAGE3.NUM_BLOCKS", "[1,1,1]",
         "MODEL.EXTRA.STAGE4.NUM_BLOCKS", "[1,1,1,1]",
         "MODEL.EXTRA.STAGE3.NUM_MODULES", "1",
         "MODEL.EXTRA.STAGE4.NUM_MODULES", "1",
         "MODEL.EXTRA.STAGE2.NUM_CHANNELS", "[8,16]",
         "MODEL.EXTRA.STAGE3.NUM_CHANNELS", "[8,16,32]",
         "MODEL.EXTRA.STAGE4.NUM_CHANNELS", "[8,16,32,64]",
         "MODEL.EXTRA.DECONV.NUM_CHANNELS", "[8]",
         "OUTPUT_DIR", str(tmp_path / "o"), "LOG_DIR", str(tmp_path / "l")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = jsonlib.loads(line)
    assert out["unit"] == "img/s" and out["value"] > 0
    assert "pose_higher_hrnet" in out["metric"]
    assert "scales=[0.5, 1, 2]" in out["metric"]


@pytest.mark.slow
def test_int8_teacher_ab_script(tmp_path):
    """scripts/int8_teacher_ab.sh (VERDICT r4 #3): the int8-teacher KD
    accuracy A/B — standard teacher train, two advmix arms (f32 vs
    TRAIN.INT8_TEACHER) from the same warm start, both swept, deltas
    printed. CPU smoke: 1 epoch/arm, 64 samples, 1-distortion sweep
    (5 subprocess compiles on this 1-core host -> generous timeout)."""
    work = str(tmp_path / "work")
    r = _run(
        "int8_teacher_ab.sh", [work],
        {"EPOCHS": "1", "DISTORTIONS": "gaussian_noise",
         "AB_EXTRA_OPTS": "DATASET.SYNTH_LENGTH 64",
         "OUTPUT_DIR": str(tmp_path / "o"), "LOG_DIR": str(tmp_path / "l")},
        REPO, timeout=2400,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert os.path.isdir(os.path.join(work, "f32_state"))
    assert os.path.isdir(os.path.join(work, "int8_state"))
    # the int8 arm's train log proves the quantized teacher was active
    assert "int8 teacher" in (r.stdout + r.stderr).lower(), (
        r.stdout[-2000:] + r.stderr[-2000:])
    lines = r.stdout.splitlines()
    delta = [ln for ln in lines if ln.startswith("delta")]
    assert delta, lines[-10:]
