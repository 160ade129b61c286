"""Loop-faithful oracle of the published HigherHRNet AE grouping.

Mirrors `match_by_tag` from the official HigherHRNet lib/core/group.py
structure-for-structure (the reference repo ships no bottom-up code —
SURVEY §6): per-joint loop in joint_order, joint_dict/tag_dict keyed by
the seeding tag's first component, candidate list truncated to
max_num_people, `round(norm)*100 - val` cost shaping, explicit 1e10
padding to a square matrix when detections outnumber groups, and the
row/col/threshold guard deciding join vs seed-new-group.

The production implementation (advmix_tpu/evaluation/grouping.py) is a
vectorized restructuring (no dict keying, scipy rectangular assignment,
batch seeding); tests/test_grouping_oracle.py asserts both produce
identical people on randomized multi-person fixtures — the same oracle
treatment the COCO evaluator got (tests/cocoeval_oracle.py).
"""

from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment


def py_max_match(scores: np.ndarray):
    """Minimum-cost assignment pairs, the published py_max_match contract
    (Munkres().compute on the padded square matrix; scipy solves the same
    minimization)."""
    rows, cols = linear_sum_assignment(scores)
    return list(zip(rows.tolist(), cols.tolist()))


def match_by_tag(
    tag_k: np.ndarray,  # (J, K, T)
    loc_k: np.ndarray,  # (J, K, 2) [x, y]
    val_k: np.ndarray,  # (J, K)
    joint_order,
    detection_threshold: float = 0.1,
    tag_threshold: float = 1.0,
    max_num_people: int = 30,
    ignore_too_much: bool = False,
    use_detection_val: bool = True,
) -> np.ndarray:
    num_joints = tag_k.shape[0]
    default_ = np.zeros((num_joints, 3 + tag_k.shape[2]))
    joint_dict = {}
    tag_dict = {}
    for i in range(len(joint_order)):
        idx = joint_order[i]
        tags = tag_k[idx]
        joints = np.concatenate(
            (loc_k[idx], val_k[idx, :, None], tags), axis=1
        )
        mask = joints[:, 2] > detection_threshold
        tags = tags[mask]
        joints = joints[mask]
        if joints.shape[0] == 0:
            continue

        if i == 0 or len(joint_dict) == 0:
            for tag, joint in zip(tags, joints):
                key = tag[0]
                joint_dict.setdefault(key, np.copy(default_))[idx] = joint
                tag_dict[key] = [tag]
        else:
            grouped_keys = list(joint_dict.keys())[:max_num_people]
            grouped_tags = [
                np.mean(tag_dict[k], axis=0) for k in grouped_keys
            ]
            if ignore_too_much and len(grouped_keys) == max_num_people:
                continue
            diff = joints[:, None, 3:] - np.array(grouped_tags)[None, :, :]
            diff_normed = np.linalg.norm(diff, ord=2, axis=2)
            diff_saved = np.copy(diff_normed)
            if use_detection_val:
                diff_normed = np.round(diff_normed) * 100 - joints[:, 2:3]
            num_added = diff.shape[0]
            num_grouped = diff.shape[1]
            if num_added > num_grouped:
                diff_normed = np.concatenate(
                    (
                        diff_normed,
                        np.zeros((num_added, num_added - num_grouped))
                        + 1e10,
                    ),
                    axis=1,
                )
            pairs = py_max_match(diff_normed)
            for row, col in pairs:
                if (
                    row < num_added
                    and col < num_grouped
                    and diff_saved[row][col] < tag_threshold
                ):
                    key = grouped_keys[col]
                    joint_dict[key][idx] = joints[row]
                    tag_dict[key].append(tags[row])
                else:
                    key = tags[row][0]
                    joint_dict.setdefault(key, np.copy(default_))[idx] = (
                        joints[row]
                    )
                    tag_dict[key] = [tags[row]]

    if not joint_dict:
        return np.zeros((0, num_joints, 3 + tag_k.shape[2]), np.float32)
    return np.array([joint_dict[k] for k in joint_dict]).astype(np.float32)
