"""OKS-NMS (numpy oracle vs jax) and COCO keypoint evaluator tests."""

import numpy as np
import jax.numpy as jnp

from advmix_tpu.ops import nms as N
from advmix_tpu.evaluation.cocoeval_np import COCOKeypointEval, compute_oks


def _person(rng, cx, cy, spread=30.0, score=0.9, j=17):
    kps = np.zeros(j * 3)
    kps[0::3] = cx + rng.randn(j) * spread
    kps[1::3] = cy + rng.randn(j) * spread
    kps[2::3] = 1.0
    return kps


def test_oks_iou_identical_is_one():
    rng = np.random.RandomState(0)
    g = _person(rng, 100, 100)
    ious = N.oks_iou_np(g, g[None, :], 5000.0, np.array([5000.0]))
    np.testing.assert_allclose(ious, [1.0], atol=1e-9)


def test_oks_nms_suppresses_duplicates():
    rng = np.random.RandomState(1)
    p1 = _person(rng, 100, 100)
    p2 = p1 + np.tile([1.0, 1.0, 0.0], 17)  # near-duplicate
    p3 = _person(rng, 400, 400)  # far away
    kpts = np.stack([p1, p2, p3])
    scores = np.array([0.9, 0.8, 0.7])
    areas = np.array([5000.0, 5000.0, 5000.0])
    keep = N.oks_nms_np(kpts, scores, areas, thresh=0.9)
    assert keep == [0, 2]


def test_oks_nms_jax_matches_numpy():
    rng = np.random.RandomState(2)
    n, j = 12, 17
    kpts = np.zeros((n, j, 3))
    for i in range(n):
        cx, cy = rng.uniform(50, 300, 2)
        p = _person(rng, cx, cy, spread=15.0, j=j)
        kpts[i, :, 0] = p[0::3]
        kpts[i, :, 1] = p[1::3]
        kpts[i, :, 2] = 1.0
    scores = rng.uniform(0.1, 1.0, n)
    areas = rng.uniform(3000, 8000, n)
    for thresh in [0.3, 0.5, 0.9]:
        ref = N.oks_nms_np(
            kpts.reshape(n, -1), scores, areas, thresh
        )
        keep_mask = np.asarray(
            N.oks_nms_jax(
                jnp.asarray(kpts), jnp.asarray(scores), jnp.asarray(areas),
                thresh,
            )
        )
        assert sorted(ref) == list(np.where(keep_mask)[0]), thresh


def test_soft_oks_nms_rescoring():
    rng = np.random.RandomState(3)
    p1 = _person(rng, 100, 100)
    p2 = p1.copy()
    kpts = np.stack([p1, p2])
    scores = np.array([0.9, 0.8])
    areas = np.array([5000.0, 5000.0])
    keep = N.soft_oks_nms_np(kpts, scores, areas, thresh=0.9)
    # soft nms keeps both (rescored), highest first
    assert keep[0] == 0 and len(keep) == 2


def test_bbox_nms():
    dets = np.array(
        [
            [0, 0, 10, 10, 0.9],
            [1, 1, 11, 11, 0.8],  # high overlap with first
            [50, 50, 60, 60, 0.7],
        ],
        np.float64,
    )
    assert N.bbox_nms_np(dets, 0.5) == [0, 2]
    assert N.bbox_nms_np(dets, 0.95) == [0, 1, 2]


# ---------------------------------------------------------------------------
# COCO keypoint evaluator
# ---------------------------------------------------------------------------

def _make_gt(n_img=4, people_per_img=2, seed=0):
    rng = np.random.RandomState(seed)
    images, anns = [], []
    aid = 1
    gt_by_img = {}
    for img_id in range(1, n_img + 1):
        images.append(dict(id=img_id, width=640, height=480))
        gt_by_img[img_id] = []
        for _ in range(people_per_img):
            cx, cy = rng.uniform(100, 500), rng.uniform(100, 350)
            kps = _person(rng, cx, cy, spread=25.0)
            x0, y0 = kps[0::3].min() - 5, kps[1::3].min() - 5
            w = kps[0::3].max() - x0 + 10
            h = kps[1::3].max() - y0 + 10
            ann = dict(
                id=aid,
                image_id=img_id,
                category_id=1,
                keypoints=list(kps),
                num_keypoints=17,
                bbox=[x0, y0, w, h],
                area=float(w * h),
                iscrowd=0,
            )
            anns.append(ann)
            gt_by_img[img_id].append(ann)
            aid += 1
    return dict(images=images, annotations=anns), gt_by_img


def test_perfect_detections_ap1():
    gt, gt_by_img = _make_gt()
    dts = [
        dict(image_id=a["image_id"], category_id=1,
             keypoints=list(a["keypoints"]), score=0.95)
        for a in gt["annotations"]
    ]
    ev = COCOKeypointEval(gt, dts)
    stats = ev.run()
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)  # AP
    np.testing.assert_allclose(stats[5], 1.0, atol=1e-6)  # AR


def test_no_detections_ap0():
    gt, _ = _make_gt()
    ev = COCOKeypointEval(gt, [])
    stats = ev.run()
    assert stats[0] == -1.0 or stats[0] == 0.0  # no dets -> AP 0/undefined

def test_half_detections():
    gt, _ = _make_gt(n_img=4, people_per_img=2)
    # detect only the first person in each image, perfectly
    dts = [
        dict(image_id=a["image_id"], category_id=1,
             keypoints=list(a["keypoints"]), score=0.9)
        for i, a in enumerate(gt["annotations"]) if i % 2 == 0
    ]
    ev = COCOKeypointEval(gt, dts)
    stats = ev.run()
    # recall capped at 0.5; 101-pt interpolated AP ~ 0.5 (precision 1 up to
    # recall 0.5, 0 beyond -> includes the recall=0.5 point: 51/101)
    assert 0.45 < stats[0] < 0.55
    np.testing.assert_allclose(stats[5], 0.5, atol=1e-6)


def test_jittered_detections_degrade_with_noise():
    gt, _ = _make_gt(n_img=6, people_per_img=2, seed=1)
    rng = np.random.RandomState(7)

    def jitter(sigma):
        dts = []
        for a in gt["annotations"]:
            kps = np.asarray(a["keypoints"], dtype=float).copy()
            kps[0::3] += rng.randn(17) * sigma
            kps[1::3] += rng.randn(17) * sigma
            dts.append(
                dict(image_id=a["image_id"], category_id=1,
                     keypoints=list(kps), score=0.9)
            )
        return COCOKeypointEval(gt, dts).run()[0]

    ap_small = jitter(1.0)
    ap_big = jitter(25.0)
    assert ap_small > ap_big
    assert ap_small > 0.8


def test_crowd_and_empty_keypoints_ignored():
    gt, _ = _make_gt(n_img=2, people_per_img=1)
    # add a zero-keypoint annotation: must be ignored, not count as missed GT
    gt["annotations"].append(
        dict(id=99, image_id=1, category_id=1, keypoints=[0.0] * 51,
             num_keypoints=0, bbox=[0, 0, 50, 50], area=2500.0, iscrowd=0)
    )
    dts = [
        dict(image_id=a["image_id"], category_id=1,
             keypoints=list(a["keypoints"]), score=0.95)
        for a in gt["annotations"] if a["num_keypoints"] > 0
    ]
    stats = COCOKeypointEval(gt, dts).run()
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)


def test_compute_oks_scale_invariance():
    rng = np.random.RandomState(5)
    kps = _person(rng, 100, 100, spread=20.0)
    gt = dict(keypoints=list(kps), bbox=[50, 50, 100, 100], area=10000.0)
    dt_exact = dict(keypoints=list(kps), score=1.0)
    ious = compute_oks([dt_exact], [gt])
    np.testing.assert_allclose(ious[0, 0], 1.0, atol=1e-9)


def test_crowd_annotation_allows_multiple_matches():
    """iscrowd=1 GT is ignore-only: detections overlapping it are neither
    rewarded nor penalized, and several may match it (COCOeval semantics)."""
    gt, _ = _make_gt(n_img=1, people_per_img=1, seed=3)
    real = gt["annotations"][0]
    crowd = dict(real)
    crowd.update(id=500, iscrowd=1,
                 keypoints=[v for v in real["keypoints"]])
    gt["annotations"].append(crowd)

    # two detections on the same spot: one matches the real GT, the second
    # would be a false positive — but the crowd ann absorbs it as ignored
    dts = [
        dict(image_id=1, category_id=1, keypoints=list(real["keypoints"]),
             score=0.95),
        dict(image_id=1, category_id=1, keypoints=list(real["keypoints"]),
             score=0.90),
    ]
    stats = COCOKeypointEval(gt, dts).run()
    np.testing.assert_allclose(stats[0], 1.0, atol=1e-6)

    # sanity: WITHOUT the crowd ann the duplicate drags AP below 1
    gt2, _ = _make_gt(n_img=1, people_per_img=1, seed=3)
    stats2 = COCOKeypointEval(gt2, dts).run()
    assert stats2[0] < 1.0
