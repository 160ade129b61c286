"""Bottom-up ignore-region loss masking (VERDICT r3 item #2).

Covers the mask pipeline end to end: COCO RLE/polygon rasterization
(data/masks.py, no pycocotools dependency — the compressed-RLE codec is
round-tripped against a loop-faithful encoder of pycocotools' published
rleToString), the ignore-segmentation loader, the masked heatmap loss
(invariance to predictions inside masked regions), and the dataset ->
step threading.
"""

import json

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from advmix_tpu.data import masks as M


# ---------------------------------------------------------------------------
# RLE codec
# ---------------------------------------------------------------------------

def _rle_to_string(counts):
    """Loop-faithful encoder of pycocotools mask.c rleToString (the inverse
    of our decoder; used here as the round-trip oracle)."""
    out = []
    for i in range(len(counts)):
        x = int(counts[i])
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def _mask_to_counts(mask):
    """Binary (h, w) -> column-major run counts starting with a 0-run."""
    flat = np.asarray(mask, np.uint8).T.reshape(-1)
    counts, prev, run = [], 0, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)
    return counts


def test_rle_decode_uncompressed():
    rng = np.random.RandomState(0)
    m = (rng.rand(13, 7) > 0.6).astype(np.uint8)
    counts = _mask_to_counts(m)
    got = M.rle_decode(counts, 13, 7)
    np.testing.assert_array_equal(got, m)


def test_rle_decode_compressed_string_roundtrip():
    rng = np.random.RandomState(1)
    for h, w in [(5, 5), (17, 31), (64, 48), (1, 9)]:
        m = (rng.rand(h, w) > 0.5).astype(np.uint8)
        counts = _mask_to_counts(m)
        s = _rle_to_string(counts)
        assert M.rle_string_to_counts(s) == [int(c) for c in counts]
        np.testing.assert_array_equal(M.rle_decode(s, h, w), m)


def test_polygon_and_build_valid_mask():
    # axis-aligned rectangle [4, 3] .. [10, 8]
    seg = [[4, 3, 10, 3, 10, 8, 4, 8]]
    valid = M.build_valid_mask([seg], 12, 16)
    assert valid.shape == (12, 16)
    assert valid[5, 7] == 0.0 and valid[3, 4] == 0.0  # inside (inclusive)
    assert valid[0, 0] == 1.0 and valid[10, 12] == 1.0  # outside
    # empty -> all ones
    assert M.build_valid_mask([], 4, 4).min() == 1.0
    assert M.build_valid_mask(None, 4, 4).min() == 1.0


def test_load_coco_ignore_segs(tmp_path):
    """Crowd RLE + zero-keypoint polygon person are ignore regions; the
    annotated person is not."""
    crowd_m = np.zeros((6, 8), np.uint8)
    crowd_m[2:5, 3:7] = 1
    rle = {"counts": _mask_to_counts(crowd_m), "size": [6, 8]}
    ann_file = tmp_path / "ann.json"
    json.dump(
        dict(
            images=[dict(id=7, width=8, height=6)],
            annotations=[
                dict(id=1, image_id=7, category_id=1, iscrowd=1,
                     segmentation=rle, keypoints=[], num_keypoints=0,
                     bbox=[3, 2, 4, 3], area=12.0),
                dict(id=2, image_id=7, category_id=1, iscrowd=0,
                     segmentation=[[0, 0, 2, 0, 2, 2, 0, 2]],
                     keypoints=[0.0] * 51, num_keypoints=0,
                     bbox=[0, 0, 2, 2], area=4.0),
                dict(id=3, image_id=7, category_id=1, iscrowd=0,
                     segmentation=[[5, 0, 7, 0, 7, 1, 5, 1]],
                     keypoints=[5.0, 0.0, 2.0] + [0.0] * 48,
                     num_keypoints=1, bbox=[5, 0, 2, 1], area=2.0),
            ],
        ),
        open(ann_file, "w"),
    )
    segs = M.load_coco_ignore_segs(str(ann_file))
    assert list(segs) == [7] and segs[7]["hw"] == (6, 8)
    assert len(segs[7]["segs"]) == 2  # crowd + zero-kp person, NOT ann 3
    valid = M.build_valid_mask(segs[7]["segs"], 6, 8)
    assert valid[3, 4] == 0.0  # crowd interior
    assert valid[1, 1] == 0.0  # zero-kp person interior
    assert valid[0, 6] == 1.0  # annotated person region stays valid


# ---------------------------------------------------------------------------
# masked loss semantics
# ---------------------------------------------------------------------------

def test_masked_loss_invariant_to_predictions_in_ignored_region():
    from advmix_tpu.ops.ae import bottomup_heatmap_loss

    rng = np.random.RandomState(2)
    pred = jnp.asarray(rng.rand(2, 16, 16, 4).astype(np.float32))
    tgt = jnp.asarray(rng.rand(2, 16, 16, 4).astype(np.float32))
    mask = np.ones((2, 16, 16), np.float32)
    mask[:, 4:9, 4:9] = 0.0
    mask = jnp.asarray(mask)

    base = float(bottomup_heatmap_loss(pred, tgt, mask=mask))
    # arbitrary perturbation strictly inside the ignored region: no effect
    pert = pred.at[:, 5:8, 5:8, :].add(100.0)
    assert float(bottomup_heatmap_loss(pert, tgt, mask=mask)) == base
    # perturbation in the supervised region: loss must move
    pert2 = pred.at[:, 0, 0, 0].add(1.0)
    assert float(bottomup_heatmap_loss(pert2, tgt, mask=mask)) != base
    # and the gradient is exactly zero inside the ignore region
    g = jax.grad(lambda p: bottomup_heatmap_loss(p, tgt, mask=mask))(pred)
    assert float(jnp.abs(g[:, 4:9, 4:9, :]).max()) == 0.0
    assert float(jnp.abs(g).max()) > 0.0


def test_mask_at_resizes_and_rebinarizes():
    from advmix_tpu.engine.steps import _mask_at

    m = np.ones((1, 32, 32), np.float32)
    m[:, 8:24, 8:24] = 0.0
    out = _mask_at(jnp.asarray(m), 16, 16)
    assert out.shape == (1, 16, 16)
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}
    assert float(out[0, 8, 8]) == 0.0 and float(out[0, 0, 0]) == 1.0
    assert _mask_at(None, 16, 16) is None
    same = jnp.asarray(m[:, :16, :16])
    assert _mask_at(same, 16, 16) is same


# ---------------------------------------------------------------------------
# dataset -> step threading
# ---------------------------------------------------------------------------

def _tiny_coco_with_crowd(tmp_path):
    import cv2

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    img = np.full((128, 128, 3), 127, np.uint8)
    cv2.imwrite(str(root / "val2017" / ("%012d.jpg" % 1)), img)
    kps = []
    rng = np.random.RandomState(0)
    for j in range(17):
        kps += [float(rng.uniform(10, 50)), float(rng.uniform(10, 50)), 2]
    crowd_m = np.zeros((128, 128), np.uint8)
    crowd_m[64:128, 64:128] = 1
    json.dump(
        dict(
            images=[dict(id=1, width=128, height=128)],
            annotations=[
                dict(id=1, image_id=1, category_id=1, keypoints=kps,
                     num_keypoints=17, bbox=[5, 5, 55, 55], area=3000.0,
                     iscrowd=0),
                dict(id=2, image_id=1, category_id=1, keypoints=[],
                     num_keypoints=0, iscrowd=1, bbox=[64, 64, 63, 63],
                     area=4096.0,
                     segmentation={"counts": _mask_to_counts(crowd_m),
                                   "size": [128, 128]}),
            ],
        ),
        open(root / "annotations" / "person_keypoints_val2017.json", "w"),
    )
    return root


@pytest.mark.slow
def test_dataset_emits_mask_and_steps_consume_it(tmp_path):
    from advmix_tpu.config import load_config
    from advmix_tpu.data import build_dataset
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.models.higher_hrnet import HigherHRNet
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate
    from test_bottomup import TINY_STAGES

    root = _tiny_coco_with_crowd(tmp_path)
    cfg = load_config()
    cfg.defrost()
    cfg.DATASET.DATASET = "bottomup_coco"
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.TRAIN_SET = "val2017"
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.SIGMA = 2
    cfg.DATASET.FLIP = False
    cfg.DATASET.SCALE_FACTOR = 0.0
    cfg.DATASET.ROT_FACTOR = 0
    cfg.freeze()

    ds = build_dataset(cfg, is_train=True)
    s = ds.get_sample(0, np.random.RandomState(0))
    assert s["mask"].shape == (64, 64)
    # identity-ish warp (square image -> square input): the crowd quadrant
    # lands bottom-right, the annotated quadrant stays valid
    assert float(s["mask"][48, 48]) == 0.0
    assert float(s["mask"][16, 16]) == 1.0

    mesh = get_mesh(8)
    model = HigherHRNet(num_joints=17, num_deconv_filters=(8,),
                        **TINY_STAGES)
    tx = optim.get_optimizer(cfg)
    st = state_lib.create_pose_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3))
    )
    st = replicate(st, mesh)
    step = steps.make_bottomup_step(model, tx, cfg, mesh)

    B = 8
    base = {
        "image": jnp.asarray(
            np.tile(s["image"][None], (B, 1, 1, 1)).astype(np.float32)),
        "joints": jnp.asarray(np.tile(s["joints"][None], (B, 1, 1, 1))),
        "joints_vis": jnp.asarray(np.tile(s["joints_vis"][None], (B, 1, 1))),
    }
    masked = dict(base)
    masked["mask"] = jnp.asarray(
        np.tile(s["mask"][None], (B, 1, 1)).astype(np.float32))
    # put GT energy inside the ignored quadrant so the mask changes the loss
    joints2 = np.tile(s["joints"][None], (B, 1, 1, 1))
    joints2[:, 1, :, :] = 52.0  # second person entirely in the crowd region
    vis2 = np.tile(s["joints_vis"][None], (B, 1, 1))
    vis2[:, 1, :] = 1.0
    base["joints"] = masked["joints"] = jnp.asarray(joints2)
    base["joints_vis"] = masked["joints_vis"] = jnp.asarray(vis2)

    st1, m_unmasked = step(st, device_put_batch(base, mesh))
    # fresh state: donate_argnums invalidated st above? no — step donates
    # its input; rebuild for the masked run
    st = state_lib.create_pose_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3))
    )
    st = replicate(st, mesh)
    step_m = steps.make_bottomup_step(model, tx, cfg, mesh)
    st2, m_masked = step_m(st, device_put_batch(masked, mesh))
    assert np.isfinite(float(m_masked["loss"]))
    assert float(m_masked["loss"]) != float(m_unmasked["loss"])


@pytest.mark.slow
def test_bottomup_advmix_step_with_mask():
    from advmix_tpu.config import load_config
    from advmix_tpu.engine import optim, state as state_lib, steps
    from advmix_tpu.models.higher_hrnet import HigherHRNet
    from advmix_tpu.models.unet import UnetGenerator
    from advmix_tpu.parallel import get_mesh, device_put_batch
    from advmix_tpu.parallel.mesh import replicate
    from test_bottomup import TINY_STAGES

    cfg = load_config()
    cfg.defrost()
    cfg.MODEL.NUM_JOINTS = 4
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.freeze()
    mesh = get_mesh(8)
    model_d = HigherHRNet(num_joints=4, num_deconv_filters=(8,),
                          **TINY_STAGES)
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
    mask = np.ones((B, 64, 64), np.float32)
    mask[:, 32:, 32:] = 0.0
    batch = device_put_batch(
        {
            "views": jnp.asarray(rng.randn(B, 64, 64, 9).astype(np.float32)),
            "joints": jnp.asarray(
                rng.uniform(5, 59, (B, M, J, 2)).astype(np.float32)),
            "joints_vis": jnp.ones((B, M, J), jnp.float32),
            "mask": jnp.asarray(mask),
        },
        mesh,
    )
    losses = []
    for _ in range(3):
        st, m = step(st, batch)
        losses.append(float(m["loss_d"]))
    assert losses[-1] < losses[0], losses
