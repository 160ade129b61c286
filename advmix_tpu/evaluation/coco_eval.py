"""COCO keypoint evaluation driver.

Behavioral reference: `COCODataset.evaluate` (`lib/dataset/coco.py:295-454`):
per-detection rescoring (mean keypoint score above IN_VIS_THRE times box
score), per-image OKS-NMS (greedy or soft), results-json writing with the
same schema, then COCO keypoint AP via our pycocotools-free evaluator.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict, defaultdict

import numpy as np

from ..native import greedy_from_matrix, oks_nms, soft_oks_nms
from .cocoeval_np import COCOKeypointEval, STATS_NAMES

# Per-image candidate count above which greedy OKS-NMS routes through the
# SINGLE-image Pallas OKS-matrix kernel on TPU (the O(N^2) OKS matrix
# dominates there; the greedy scan stays on host in C++). Below it,
# per-image device dispatch overhead exceeds the host numpy/C++ loop —
# which is why the PRODUCTION path batches every image of the eval pass
# into ONE padded launch instead (oks_matrix_batched_pallas, used when
# the pass holds >= PALLAS_BATCHED_MIN_IMAGES images of 2..128
# candidates).
PALLAS_NMS_MIN_CANDIDATES = 96
PALLAS_BATCHED_MIN_IMAGES = 16
PALLAS_BATCHED_MAX_CANDIDATES = 128


def _tpu_available() -> bool:
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _oks_matrices_batched(cand, num_joints, interpret: bool = False):
    """One padded Pallas launch for all images' pairwise OKS matrices.

    cand: list of (image_id, img_kpts). Images are padded to the max
    candidate count (pow-2 rounded, <= 128); returns
    {image_id: (n, n) float sim matrix}."""
    from ..ops.pallas.oks_kernel import oks_matrix_batched_pallas

    m = len(cand)
    p = 1
    maxn = max(len(kp) for _, kp in cand)
    while p < maxn:
        p *= 2
    kpts = np.zeros((m, p, num_joints, 2), np.float32)
    areas = np.zeros((m, p), np.float32)
    for i, (_, img_kpts) in enumerate(cand):
        for k, pp in enumerate(img_kpts):
            kpts[i, k] = np.asarray(pp["keypoints"])[:, :2]
            areas[i, k] = pp["area"]
    sims = np.asarray(
        oks_matrix_batched_pallas(kpts, areas, interpret=interpret)
    )
    return {
        iid: sims[i][: len(kp), : len(kp)]
        for i, (iid, kp) in enumerate(cand)
    }


def _oks_nms_pallas(kpts_flat: np.ndarray, scores: np.ndarray,
                    areas: np.ndarray, thresh: float,
                    interpret: bool = False):
    """Greedy OKS-NMS with the pairwise OKS matrix computed on-TPU
    (ops/pallas/oks_kernel.py, the analog of the reference's CUDA
    `lib/nms/nms_kernel.cu:33-77` tile kernel); greedy scan on host C++."""
    from ..ops.pallas.oks_kernel import oks_matrix_pallas

    n = kpts_flat.shape[0]
    kpts = kpts_flat.reshape(n, -1, 3)[:, :, :2].astype(np.float32)
    sim = np.asarray(
        oks_matrix_pallas(kpts, areas.astype(np.float32),
                          interpret=interpret)
    )
    return greedy_from_matrix(sim, scores.astype(np.float32), thresh)


def evaluate_coco_keypoints(cfg, dataset, preds, output_dir, all_boxes, img_path):
    """preds: (N, J, 3) in original image coords; all_boxes: (N, 6)
    [center(2), scale(2), area, score]; img_path: list of image paths."""
    rank = cfg.RANK
    res_folder = os.path.join(output_dir, "results")
    os.makedirs(res_folder, exist_ok=True)
    if cfg.TEST.TEST_ROBUST and cfg.TEST.CORRUPTION_TYPE != "clean":
        res_file = os.path.join(
            res_folder,
            "keypoints_{}_results_{}_{}_{}.json".format(
                dataset.image_set, rank, cfg.TEST.CORRUPTION_TYPE,
                cfg.TEST.SEVERITY,
            ),
        )
    else:
        res_file = os.path.join(
            res_folder,
            f"keypoints_{dataset.image_set}_results_{rank}.json",
        )

    num_joints = dataset.num_joints
    in_vis_thre = cfg.TEST.IN_VIS_THRE
    oks_thre = cfg.TEST.OKS_THRE

    # group by image (the reference parses the 12-digit id from the path,
    # coco.py:322)
    by_image = defaultdict(list)
    for idx in range(len(preds)):
        image_id = int(str(img_path[idx])[-16:-4])
        by_image[image_id].append(
            dict(
                keypoints=np.asarray(preds[idx]),
                center=np.asarray(all_boxes[idx][0:2]),
                scale=np.asarray(all_boxes[idx][2:4]),
                area=float(all_boxes[idx][4]),
                score=float(all_boxes[idx][5]),
                image=image_id,
            )
        )

    # rescore: kpt_score * box_score (coco.py:339-353)
    for img_kpts in by_image.values():
        for p in img_kpts:
            box_score = p["score"]
            kpt_scores = p["keypoints"][:, 2]
            visible = kpt_scores > in_vis_thre
            kpt_score = (
                float(kpt_scores[visible].mean()) if visible.any() else 0.0
            )
            p["score"] = kpt_score * box_score

    # production TPU path: every image's OKS matrix in ONE padded Pallas
    # launch; greedy scans stay per-image on host C++
    batched_sims = {}
    if (not cfg.TEST.SOFT_NMS and _tpu_available()):
        cand = [
            (iid, kp) for iid, kp in by_image.items()
            if 2 <= len(kp) <= PALLAS_BATCHED_MAX_CANDIDATES
        ]
        if len(cand) >= PALLAS_BATCHED_MIN_IMAGES:
            batched_sims = _oks_matrices_batched(cand, dataset.num_joints)

    oks_nmsed = []
    for image_id, img_kpts in by_image.items():
        kpts_flat = np.array(
            [p["keypoints"].flatten() for p in img_kpts]
        )
        scores = np.array([p["score"] for p in img_kpts])
        areas = np.array([p["area"] for p in img_kpts])
        if cfg.TEST.SOFT_NMS:
            keep = soft_oks_nms(kpts_flat, scores, areas, oks_thre)
        elif image_id in batched_sims:
            keep = greedy_from_matrix(
                batched_sims[image_id], scores.astype(np.float32), oks_thre
            )
        elif (len(img_kpts) >= PALLAS_NMS_MIN_CANDIDATES
              and _tpu_available()):
            keep = _oks_nms_pallas(kpts_flat, scores, areas, oks_thre)
        else:
            keep = oks_nms(kpts_flat, scores, areas, oks_thre)
        if len(keep) == 0:
            oks_nmsed.append(img_kpts)
        else:
            oks_nmsed.append([img_kpts[k] for k in keep])

    # write results json (schema per coco.py:408-439)
    results = []
    for img_kpts in oks_nmsed:
        for p in img_kpts:
            kp = np.zeros(num_joints * 3)
            kp[0::3] = p["keypoints"][:, 0]
            kp[1::3] = p["keypoints"][:, 1]
            kp[2::3] = p["keypoints"][:, 2]
            results.append(
                dict(
                    image_id=p["image"],
                    category_id=1,
                    keypoints=[float(v) for v in kp],
                    score=float(p["score"]),
                    center=[float(v) for v in p["center"]],
                    scale=[float(v) for v in p["scale"]],
                )
            )
    with open(res_file, "w") as f:
        json.dump(results, f, sort_keys=True, indent=4)

    if "test" in dataset.image_set:
        return {"Null": 0}, 0

    evaluator = COCOKeypointEval(dataset.ann_file, results)
    stats = evaluator.run()
    name_value = OrderedDict(zip(STATS_NAMES, [float(s) for s in stats]))
    return name_value, name_value["AP"]
