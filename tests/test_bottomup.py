"""HigherHRNet bottom-up components: model shapes, AE loss, multi-person
targets, peak extraction, grouping, train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from advmix_tpu.models.higher_hrnet import HigherHRNet
from advmix_tpu.ops import ae as AE
from advmix_tpu.ops.heatmap import generate_target
from advmix_tpu.evaluation.grouping import group_peaks, parse_bottomup

STAGES = dict(
    stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                    NUM_BLOCKS=[4, 4], NUM_CHANNELS=[32, 64],
                    FUSE_METHOD="SUM"),
    stage3_cfg=dict(NUM_MODULES=4, NUM_BRANCHES=3, BLOCK="BASIC",
                    NUM_BLOCKS=[4, 4, 4], NUM_CHANNELS=[32, 64, 128],
                    FUSE_METHOD="SUM"),
    stage4_cfg=dict(NUM_MODULES=3, NUM_BRANCHES=4, BLOCK="BASIC",
                    NUM_BLOCKS=[4, 4, 4, 4],
                    NUM_CHANNELS=[32, 64, 128, 256], FUSE_METHOD="SUM"),
)

TINY_STAGES = dict(
    stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                    NUM_BLOCKS=[1, 1], NUM_CHANNELS=[8, 16],
                    FUSE_METHOD="SUM"),
    stage3_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=3, BLOCK="BASIC",
                    NUM_BLOCKS=[1, 1, 1], NUM_CHANNELS=[8, 16, 32],
                    FUSE_METHOD="SUM"),
    stage4_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
                    NUM_BLOCKS=[1, 1, 1, 1], NUM_CHANNELS=[8, 16, 32, 64],
                    FUSE_METHOD="SUM"),
)


def test_higher_hrnet_shapes_and_params():
    model = HigherHRNet(num_joints=17, **STAGES)
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(v, x, train=False)
    assert len(outs) == 2
    assert outs[0].shape == (1, 32, 32, 34)  # heatmaps + tags at 1/4
    assert outs[1].shape == (1, 64, 64, 17)  # heatmaps at 1/2
    n_params = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert 27e6 < n_params < 31e6, n_params  # HigherHRNet-W32 ~28.6M


def test_bottomup_target_matches_topdown_single_person():
    rng = np.random.RandomState(0)
    joints_hm = rng.uniform(2, 14, (2, 1, 5, 2)).astype(np.float32)
    vis = np.ones((2, 1, 5), np.float32)
    tgt, locs = AE.generate_bottomup_target(
        jnp.asarray(joints_hm), jnp.asarray(vis), (16, 16), 2
    )
    # top-down generator expects image-space joints; feed identity stride
    tgt_td, centers, w = generate_target(
        jnp.asarray(joints_hm[:, 0]), jnp.asarray(vis[:, 0]),
        (16, 16), (16, 16), 2,
    )
    np.testing.assert_allclose(np.asarray(tgt), np.asarray(tgt_td), atol=1e-6)
    np.testing.assert_allclose(np.asarray(locs[:, 0]), np.asarray(centers))


def test_bottomup_target_max_combines_people():
    j1 = np.array([[[[4.0, 4.0]]]], np.float32)  # (1,1,1,2)
    j2 = np.array([[[[10.0, 10.0]]]], np.float32)
    both = np.concatenate([j1, j2], axis=1)  # (1,2,1,2)
    vis = np.ones((1, 2, 1), np.float32)
    tgt, _ = AE.generate_bottomup_target(jnp.asarray(both), jnp.asarray(vis),
                                         (16, 16), 2)
    t = np.asarray(tgt)[0, :, :, 0]
    assert t[4, 4] == 1.0 and t[10, 10] == 1.0


def test_ae_loss_separated_vs_collapsed():
    h = w = 16
    j, m = 3, 2
    locs = np.zeros((1, m, j, 2), np.int32)
    locs[0, 0] = [[2, 2], [3, 3], [4, 4]]
    locs[0, 1] = [[10, 10], [11, 11], [12, 12]]
    vis = np.ones((1, m, j), np.float32)

    # distinct constant tags per person -> pull 0, push ~ 0
    tags = np.zeros((1, h, w, j), np.float32)
    tags[0, :8] = 0.0
    tags[0, 8:] = 10.0
    pull, push = AE.ae_loss(jnp.asarray(tags), jnp.asarray(locs),
                            jnp.asarray(vis))
    assert float(pull) < 1e-6
    assert float(push) < 1e-6

    # identical tags -> push maximal (exp(0) pairs)
    tags2 = np.zeros((1, h, w, j), np.float32)
    pull2, push2 = AE.ae_loss(jnp.asarray(tags2), jnp.asarray(locs),
                              jnp.asarray(vis))
    assert float(push2) == pytest.approx(0.5)
    assert float(pull2) < 1e-6


def test_top_k_peaks_and_grouping():
    h = w = 32
    j = 4
    rng = np.random.RandomState(0)
    heat = np.zeros((1, h, w, j), np.float32)
    tags = np.zeros((1, h, w, j), np.float32)
    p1 = [(5, 6), (7, 8), (9, 10), (11, 12)]
    p2 = [(20, 22), (22, 24), (24, 26), (26, 28)]
    for jj, ((x1, y1), (x2, y2)) in enumerate(zip(p1, p2)):
        heat[0, y1, x1, jj] = 0.9
        heat[0, y2, x2, jj] = 0.8
        tags[0, y1, x1, jj] = 1.0
        tags[0, y2, x2, jj] = 5.0
    peaks = AE.top_k_peaks(jnp.asarray(heat), jnp.asarray(tags), k=5)
    pk = {k: np.asarray(v)[0] for k, v in peaks.items()}
    assert pk["val"][0, 0] == pytest.approx(0.9)

    people = group_peaks(pk, detection_thresh=0.1, tag_thresh=1.0)
    assert people.shape[0] == 2
    # persons sorted by first-joint insertion: tag 1.0 person first
    person_tags = sorted(np.mean(p[p[:, 2] > 0, 3]) for p in people)
    assert person_tags == pytest.approx([1.0, 5.0])
    for p in people:
        assert np.count_nonzero(p[:, 2] > 0) == j  # all joints matched

    ppl, scores = parse_bottomup(heat[0], tags[0], pk)
    assert len(ppl) == 2 and np.all(scores > 0.5)


@pytest.mark.slow
def test_bottomup_step_loss_decreases():
    from advmix_tpu.config import load_config
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.SIGMA = 2
    cfg.freeze()

    mesh = get_mesh(8)
    model = HigherHRNet(num_joints=4, num_deconv_filters=(8,), **TINY_STAGES)
    tx = optim.get_optimizer(cfg)
    st = state_lib.create_pose_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3))
    )
    st = replicate(st, mesh)
    step = steps.make_bottomup_step(model, tx, cfg, mesh)

    rng = np.random.RandomState(0)
    B, M, J = 8, 3, 4
    batch = device_put_batch(
        {
            "image": jnp.asarray(rng.randn(B, 64, 64, 3).astype(np.float32)),
            "joints": jnp.asarray(
                rng.uniform(5, 59, (B, M, J, 2)).astype(np.float32)
            ),
            "joints_vis": jnp.ones((B, M, J), jnp.float32),
        },
        mesh,
    )
    losses = []
    for _ in range(4):
        st, m = step(st, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(m["pull"])) and np.isfinite(float(m["push"]))


@pytest.mark.slow
def test_bottomup_advmix_step():
    from advmix_tpu.config import load_config
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.models.unet import UnetGenerator
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.freeze()
    mesh = get_mesh(8)
    model_d = HigherHRNet(num_joints=4, num_deconv_filters=(8,), **TINY_STAGES)
    model_g = UnetGenerator(input_nc=9, output_nc=3, num_downs=4, ngf=8)
    tx_d = optim.get_optimizer(cfg)
    tx_g = optim.get_generator_optimizer(cfg)
    st = state_lib.create_advmix_state(
        model_d, model_g, tx_d, tx_g, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3)),
    )
    st = replicate(st, mesh)
    step = steps.make_bottomup_advmix_step(
        model_d, model_g, tx_d, tx_g, cfg, mesh
    )
    rng = np.random.RandomState(0)
    B, M, J = 8, 2, 4
    batch = device_put_batch(
        {
            "views": jnp.asarray(rng.randn(B, 64, 64, 9).astype(np.float32)),
            "joints": jnp.asarray(
                rng.uniform(5, 59, (B, M, J, 2)).astype(np.float32)
            ),
            "joints_vis": jnp.ones((B, M, J), jnp.float32),
        },
        mesh,
    )
    losses = []
    for _ in range(3):
        st, m = step(st, batch)
        losses.append(float(m["loss_d"]))
    assert losses[-1] < losses[0], losses
    assert float(m["loss_g"]) <= 0


def test_bottomup_validate_plumbing(tmp_path):
    """Random-weights bottom-up model through the full validate path:
    device forward + peaks -> host grouping -> back-projection -> COCO
    results json -> AP. Checks plumbing, not accuracy."""
    import json as jsonlib
    import os

    import cv2

    from advmix_tpu.config import load_config
    from advmix_tpu.data import build_dataset, Loader
    from advmix_tpu.engine import steps, trainer as trainer_lib
    from advmix_tpu.parallel import get_mesh
    from advmix_tpu.parallel.mesh import replicate

    # tiny generated coco tree
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in (1, 2):
        img = np.full((240, 320, 3), 127, np.uint8)
        kps = []
        for j in range(17):
            x, y = rng.uniform(60, 260), rng.uniform(60, 180)
            kps += [float(x), float(y), 2]
        anns.append(dict(id=i, image_id=i, category_id=1, keypoints=kps,
                         num_keypoints=17,
                         bbox=[50, 50, 220, 140], area=30800.0, iscrowd=0))
        cv2.imwrite(str(root / "val2017" / ("%012d.jpg" % i)), img)
        images.append(dict(id=i, width=320, height=240))
    with open(root / "annotations" / "person_keypoints_val2017.json", "w") as f:
        jsonlib.dump(dict(images=images, annotations=anns), f)

    cfg = load_config()
    cfg.defrost()
    cfg.DATASET.DATASET = "bottomup_coco"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "val2017"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [128, 128]
    cfg.TEST.FLIP_TEST = True
    cfg.freeze()

    mesh = get_mesh(8)
    ds = build_dataset(cfg, is_train=False)
    assert len(ds) == 2
    model = HigherHRNet(num_joints=17, num_deconv_filters=(8,), **TINY_STAGES)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
                   train=False)
    eval_step = steps.make_bottomup_eval_step(model, cfg, ds.flip_pairs, mesh)
    loader = Loader(ds, 8, shuffle=False)
    name_values, ap = trainer_lib.validate_bottomup(
        cfg, eval_step, replicate(v["params"], mesh),
        replicate(v.get("batch_stats", {}), mesh), ds, loader, mesh,
        str(tmp_path),
    )
    assert np.isfinite(ap)
    res = os.path.join(str(tmp_path), "results",
                       "keypoints_val2017_results_bu.json")
    assert os.path.exists(res)


def test_ochuman_dataset_alias(tmp_path):
    """'ochuman' resolves to the bottom-up COCO-format loader."""
    import json as jsonlib
    import os
    import cv2

    from advmix_tpu.config import load_config
    from advmix_tpu.data import build_dataset

    root = tmp_path / "ochuman"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    img = np.full((120, 160, 3), 127, np.uint8)
    cv2.imwrite(str(root / "val2017" / ("%012d.jpg" % 1)), img)
    kps = []
    rng = np.random.RandomState(0)
    for j in range(17):
        kps += [float(rng.uniform(20, 140)), float(rng.uniform(20, 100)), 2]
    jsonlib.dump(
        dict(images=[dict(id=1, width=160, height=120)],
             annotations=[dict(id=1, image_id=1, category_id=1,
                               keypoints=kps, num_keypoints=17,
                               bbox=[10, 10, 140, 100], area=14000.0,
                               iscrowd=0)]),
        open(root / "annotations" / "person_keypoints_val2017.json", "w"),
    )
    cfg = load_config()
    cfg.defrost()
    cfg.DATASET.DATASET = "ochuman"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TEST_SET = "val2017"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.freeze()
    ds = build_dataset(cfg, is_train=False)
    assert len(ds) == 1
    s = ds.get_sample(0, np.random.RandomState(0))
    assert s["image"].shape == (64, 64, 3)
    assert s["joints"].shape[1] == 17  # (M, J, 2) -> J dim check


@pytest.mark.slow
def test_higher_hrnet_use_scan_equivalent():
    """USE_SCAN/REMAT plumb through the HigherHRNet trunk; scanned and
    unrolled construction must agree after stack_for_scan restacking."""
    import jax

    from advmix_tpu.models.higher_hrnet import HigherHRNet
    from advmix_tpu.models import torch_convert as TC

    stages = dict(
        stage2_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2], NUM_CHANNELS=[8, 16],
                        FUSE_METHOD="SUM"),
        stage3_cfg=dict(NUM_MODULES=2, NUM_BRANCHES=3, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2, 2], NUM_CHANNELS=[8, 16, 32],
                        FUSE_METHOD="SUM"),
        stage4_cfg=dict(NUM_MODULES=1, NUM_BRANCHES=4, BLOCK="BASIC",
                        NUM_BLOCKS=[2, 2, 2, 2],
                        NUM_CHANNELS=[8, 16, 32, 64], FUSE_METHOD="SUM"),
    )
    kw = dict(num_joints=4, num_deconv_filters=(8,), num_basic_blocks=1,
              **stages)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    plain = HigherHRNet(**kw)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    outs = plain.apply(v, x, train=False)

    scan = HigherHRNet(use_scan=True, **kw)
    vs_t = scan.init(jax.random.PRNGKey(0), x, train=False)
    vs = {
        "params": TC.stack_for_scan(
            jax.tree.map(np.asarray, v["params"]), vs_t["params"]),
        "batch_stats": TC.stack_for_scan(
            jax.tree.map(np.asarray, v["batch_stats"]),
            vs_t["batch_stats"]),
    }
    outs_s = scan.apply(vs, x, train=False)
    assert len(outs) == len(outs_s) == 2
    for a, b in zip(outs, outs_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_bottomup_multiscale_eval_step():
    """Published multi-scale test protocol (VERDICT r3 item #9): scales
    [0.5, 1, 2] run in ONE program; heat stays at the scale-1 aggregation
    resolution, tags stay scale-1 (stacked 2-dim under flip-test)."""
    from advmix_tpu.config import load_config
    from advmix_tpu.engine import steps
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate

    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.TEST.FLIP_TEST = True
    cfg.freeze()
    mesh = get_mesh(8)
    model = HigherHRNet(num_joints=4, num_deconv_filters=(8,), **TINY_STAGES)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    params = replicate(v["params"], mesh)
    stats = replicate(v.get("batch_stats", {}), mesh)
    pairs = [[1, 2]]

    rng = np.random.RandomState(0)
    batch = device_put_batch(
        {"image": jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))},
        mesh,
    )
    step1 = steps.make_bottomup_eval_step(model, cfg, pairs, mesh)
    heat1, tags1, peaks1 = jax.device_get(step1(params, stats, batch))
    step3 = steps.make_bottomup_eval_step(
        model, cfg, pairs, mesh, scales=(0.5, 1, 2)
    )
    heat3, tags3, peaks3 = jax.device_get(step3(params, stats, batch))

    assert heat3.shape == heat1.shape  # scale-1 aggregation resolution
    assert tags3.shape == tags1.shape == heat1.shape + (2,)  # flip-stacked
    assert peaks3["tag"].shape == peaks1["tag"].shape
    # tags come from scale 1 ONLY -> identical; heat is a 3-scale average
    np.testing.assert_allclose(tags3, tags1, atol=1e-6)
    # relative: random-init heatmap magnitudes are ~1e-12 (0.001-std convs)
    assert np.abs(heat1).max() > 0
    assert np.abs(heat3 - heat1).max() > 0.1 * np.abs(heat1).max()
    # grouping consumes the multi-scale outputs unchanged
    from advmix_tpu.evaluation.grouping import parse_bottomup
    pk = {k: np.asarray(peaks3[k][0]) for k in peaks3}
    ppl, scores = parse_bottomup(heat3[0], tags3[0], pk)
    assert ppl.ndim == 3 and ppl.shape[2] == 5  # [x, y, val, tag0, tag1]
