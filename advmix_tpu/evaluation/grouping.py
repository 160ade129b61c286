"""Greedy associative-embedding grouping (host side).

Public-spec implementation of the Newell/HigherHRNet bottom-up parser: per
joint (in a fixed order), match candidate detections to existing person
groups by tag distance via the Hungarian algorithm
(scipy.optimize.linear_sum_assignment), seeding new groups for unmatched
high-score detections; then optional refinement filling missing joints from
the heatmaps near the person's mean tag.

Device side produces the per-joint top-k peak tensors (ops/ae.py:
top_k_peaks); this module consumes numpy copies of them.
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

# HigherHRNet's COCO-17 processing order: stable joints (nose, eyes, ears,
# shoulders, hips) seed person groups before the noisier limb extremities.
COCO_JOINT_ORDER = [0, 1, 2, 3, 4, 5, 6, 11, 12, 7, 8, 9, 10, 13, 14, 15, 16]


def group_peaks(
    peaks: dict,  # numpy arrays (J, k): x, y, val, tag  (single image)
    detection_thresh: float = 0.1,
    tag_thresh: float = 1.0,
    max_people: int = 30,
    joint_order=None,
):
    """Returns (P, J, 4) arrays [x, y, val, tag] for P grouped people."""
    num_joints, k = peaks["val"].shape
    if joint_order is None:
        joint_order = (
            COCO_JOINT_ORDER if num_joints == 17 else list(range(num_joints))
        )

    groups = []  # each: dict(joints=(J,4) array, tags=list of tag values)

    for j in joint_order:
        vals = peaks["val"][j]
        sel = vals > detection_thresh
        if not np.any(sel):
            continue
        dets = np.stack(
            [peaks["x"][j][sel], peaks["y"][j][sel], vals[sel],
             peaks["tag"][j][sel]],
            axis=1,
        )  # (D, 4)

        if not groups:
            for d in dets[:max_people]:
                g = {"joints": np.zeros((num_joints, 4), np.float32),
                     "tags": [d[3]]}
                g["joints"][j] = d
                groups.append(g)
            continue

        group_tags = np.array([np.mean(g["tags"]) for g in groups])
        diff = np.abs(dets[:, 3][:, None] - group_tags[None, :])  # (D, P)
        # cost favors low tag distance and high detection score
        cost = np.round(diff) * 100 - dets[:, 2][:, None]
        rows, cols = linear_sum_assignment(cost)
        assigned = set()
        for r, c in zip(rows, cols):
            if diff[r, c] < tag_thresh:
                groups[c]["joints"][j] = dets[r]
                groups[c]["tags"].append(dets[r, 3])
                assigned.add(r)
        for r in range(dets.shape[0]):
            if r not in assigned and len(groups) < max_people:
                g = {"joints": np.zeros((num_joints, 4), np.float32),
                     "tags": [dets[r, 3]]}
                g["joints"][j] = dets[r]
                groups.append(g)

    if not groups:
        return np.zeros((0, num_joints, 4), np.float32)
    return np.stack([g["joints"] for g in groups])


def refine_group(
    joints: np.ndarray,  # (J, 4)
    heatmaps: np.ndarray,  # (H, W, J)
    tags: np.ndarray,  # (H, W, J)
):
    """Fill missing joints from the heatmap penalized by tag distance
    (HigherHRNet's refine step)."""
    h, w, num_joints = heatmaps.shape
    seen = joints[:, 2] > 0
    if not np.any(seen):
        return joints
    person_tag = np.mean(joints[seen, 3])
    out = joints.copy()
    for j in range(num_joints):
        if joints[j, 2] > 0:
            continue
        score = heatmaps[:, :, j] - np.round(
            np.abs(tags[:, :, j] - person_tag)
        )
        yy, xx = np.unravel_index(np.argmax(score), (h, w))
        val = heatmaps[yy, xx, j]
        if val > 0:
            out[j] = [xx, yy, val, person_tag]
    return out


def quarter_offset_np(coords_xy: np.ndarray, heatmap: np.ndarray):
    """Quarter-pixel refinement toward the larger neighbor (numpy, one
    joint map). coords_xy: (2,) [x, y]."""
    h, w = heatmap.shape
    px, py = int(coords_xy[0]), int(coords_xy[1])
    x, y = float(coords_xy[0]), float(coords_xy[1])
    if 1 < px < w - 1 and 1 < py < h - 1:
        x += 0.25 * np.sign(heatmap[py, px + 1] - heatmap[py, px - 1])
        y += 0.25 * np.sign(heatmap[py + 1, px] - heatmap[py - 1, px])
    return np.array([x, y])


def parse_bottomup(
    heatmaps: np.ndarray,  # (H, W, J) aggregated
    tags: np.ndarray,  # (H, W, J)
    peaks: dict,  # (J, k) numpy peak tensors from the device
    detection_thresh: float = 0.1,
    tag_thresh: float = 1.0,
    max_people: int = 30,
    refine: bool = True,
    adjust: bool = True,
):
    """Full parse: group -> refine -> sub-pixel adjust -> scores.

    Returns (people (P, J, 4) in heatmap coords, scores (P,))."""
    people = group_peaks(peaks, detection_thresh, tag_thresh, max_people)
    if refine:
        people = np.stack(
            [refine_group(p, heatmaps, tags) for p in people]
        ) if len(people) else people
    if adjust and len(people):
        for p in people:
            for j in range(people.shape[1]):
                if p[j, 2] > 0:
                    p[j, :2] = quarter_offset_np(p[j, :2], heatmaps[:, :, j])
    if not len(people):
        return people, np.zeros((0,), np.float32)
    scores = np.array([
        p[p[:, 2] > 0, 2].mean() if np.any(p[:, 2] > 0) else 0.0
        for p in people
    ])
    return people, scores
