"""Differential test of the from-scratch COCO keypoint evaluator against a
loop-faithful pycocotools oracle (VERDICT r2 missing #1 / next #3).

Every AP/mPC the framework reports flows through
advmix_tpu/evaluation/cocoeval_np.py; these fixtures sweep its edge cases
— crowd annotations, ignore regions (num_keypoints == 0), area-range
boundaries, >maxDets detections, empty images, detections without GT and
vice versa — and require the full 10-stat vector to match the oracle
bit-for-bit on 100+ randomized fixtures.
"""

import numpy as np
import pytest

from advmix_tpu.evaluation.cocoeval_np import COCOKeypointEval

from cocoeval_oracle import OracleCOCOeval

J = 17


def _rand_keypoints(rng, cx, cy, spread, vis_p=0.8):
    kps = []
    for _ in range(J):
        x = cx + rng.uniform(-spread, spread)
        y = cy + rng.uniform(-spread, spread)
        v = int(rng.rand() < vis_p) * int(rng.randint(1, 3))
        kps += [float(x), float(y), float(v)]
    return kps


def make_fixture(seed):
    """One randomized COCO-format gt dict + detection list."""
    rng = np.random.RandomState(seed)
    n_imgs = rng.randint(2, 6)
    images = [{"id": 100 + i} for i in range(n_imgs)]
    anns = []
    dts = []
    ann_id = 1
    for im in images:
        kind = rng.randint(0, 6)
        if kind == 0:
            continue  # empty image: no gts, no dts
        n_gt = rng.randint(0, 5)
        if kind == 1:
            n_gt = 0  # dts without gts
        centers = []
        for g in range(n_gt):
            cx, cy = rng.uniform(50, 400, 2)
            # areas straddling the 32^2 / 96^2 range boundaries
            area = float(rng.choice([
                rng.uniform(500, 1500),
                32.0 ** 2 + rng.uniform(-30, 30),
                rng.uniform(3000, 8000),
                96.0 ** 2 + rng.uniform(-300, 300),
                rng.uniform(15000, 60000),
            ]))
            spread = np.sqrt(area) / 2
            iscrowd = int(rng.rand() < 0.15)
            all_invisible = rng.rand() < 0.15  # ignore region
            kps = _rand_keypoints(
                rng, cx, cy, spread, vis_p=0.0 if all_invisible else 0.8)
            anns.append({
                "id": ann_id,
                "image_id": im["id"],
                "category_id": 1,
                "keypoints": kps,
                "area": area,
                "bbox": [cx - spread, cy - spread, 2 * spread, 2 * spread],
                "iscrowd": iscrowd,
            })
            ann_id += 1
            centers.append((cx, cy, spread))
        if kind == 2:
            continue  # gts without dts
        n_dt = rng.randint(1, 26) if kind != 3 else rng.randint(21, 30)
        for d in range(n_dt):
            if centers and rng.rand() < 0.7:
                cx, cy, spread = centers[rng.randint(len(centers))]
                noise = rng.uniform(0, spread * 0.8)
            else:
                cx, cy = rng.uniform(50, 400, 2)
                spread, noise = rng.uniform(10, 120), 0.0
            kps = _rand_keypoints(rng, cx + noise, cy + noise, spread,
                                  vis_p=1.0)
            # detection keypoint v-slots carry scores in COCO results;
            # the evaluator must not read them as visibility
            for k in range(J):
                kps[3 * k + 2] = float(rng.rand())
            dts.append({
                "image_id": im["id"],
                "category_id": 1,
                "keypoints": kps,
                "score": float(rng.rand()),
            })
    return {"images": images, "annotations": anns}, dts


@pytest.mark.parametrize("seed", range(110))
def test_stats_match_oracle(seed):
    gt, dt = make_fixture(seed)
    ours = COCOKeypointEval(gt, dt).run()
    oracle = OracleCOCOeval(gt, dt).run()
    np.testing.assert_array_equal(
        np.asarray(ours), np.asarray(oracle),
        err_msg=f"fixture seed {seed}",
    )


def test_fixture_space_covers_edges():
    """The 110 fixtures actually exercise crowds, ignore regions, area
    boundaries, >20-det images and empty images."""
    has_crowd = has_ignore = has_many = has_empty = has_boundary = False
    for seed in range(110):
        gt, dt = make_fixture(seed)
        per_img = {}
        for d in dt:
            per_img[d["image_id"]] = per_img.get(d["image_id"], 0) + 1
        ann_imgs = {a["image_id"] for a in gt["annotations"]}
        dt_imgs = set(per_img)
        for a in gt["annotations"]:
            if a["iscrowd"]:
                has_crowd = True
            if all(v == 0 for v in a["keypoints"][2::3]):
                has_ignore = True
            if 32.0**2 - 30 <= a["area"] <= 32.0**2 + 30:
                has_boundary = True
        if any(n > 20 for n in per_img.values()):
            has_many = True
        if any(im["id"] not in ann_imgs and im["id"] not in dt_imgs
               for im in gt["images"]):
            has_empty = True
    assert all([has_crowd, has_ignore, has_many, has_empty, has_boundary])
