"""Differential parity of the production AE grouping against a
loop-faithful oracle of the published HigherHRNet match_by_tag on
randomized multi-person fixtures (VERDICT r3 item #3: "keep/assignment
parity on >=50 fixtures")."""

import numpy as np
import pytest

from advmix_tpu.evaluation.grouping import COCO_JOINT_ORDER, group_peaks
from grouping_oracle import match_by_tag


def _random_fixture(rng, num_joints, k, tdim, num_people):
    """Peaks with realistic structure: per-person tag clusters + noise
    detections, continuous values (ties/collisions have measure zero)."""
    person_tags = rng.uniform(-4, 4, (num_people, tdim))
    x = rng.uniform(0, 96, (num_joints, k)).astype(np.float64)
    y = rng.uniform(0, 72, (num_joints, k)).astype(np.float64)
    val = rng.uniform(0, 1, (num_joints, k))
    # drop some detections under the threshold entirely
    val[rng.rand(num_joints, k) < 0.3] *= 0.05
    tag = np.zeros((num_joints, k, tdim))
    for j in range(num_joints):
        for c in range(k):
            if rng.rand() < 0.75 and num_people:
                p = rng.randint(num_people)
                tag[j, c] = person_tags[p] + rng.randn(tdim) * 0.15
            else:  # outlier tag (seeds its own group or joins by luck)
                tag[j, c] = rng.uniform(-6, 6, tdim)
    return x, y, val, tag


@pytest.mark.parametrize("tdim", [1, 2])
def test_group_peaks_matches_published_oracle(tdim):
    rng = np.random.RandomState(0 if tdim == 1 else 1)
    n_checked = 0
    for case in range(30):
        num_joints = int(rng.choice([4, 9, 17]))
        k = int(rng.randint(3, 9))
        num_people = int(rng.randint(0, 5))
        x, y, val, tag = _random_fixture(rng, num_joints, k, tdim,
                                         num_people)
        order = (COCO_JOINT_ORDER if num_joints == 17
                 else list(range(num_joints)))
        max_people = int(rng.choice([2, 5, 30]))

        want = match_by_tag(
            tag, np.stack([x, y], axis=2), val, order,
            detection_threshold=0.1, tag_threshold=1.0,
            max_num_people=max_people,
        )
        peaks = {"x": x, "y": y, "val": val,
                 "tag": tag[..., 0] if tdim == 1 else tag}
        got = group_peaks(peaks, detection_thresh=0.1, tag_thresh=1.0,
                          max_people=max_people, joint_order=order)
        assert got.shape == want.shape, (case, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6,
                                   err_msg=f"case {case}")
        n_checked += 1
        # the fixtures must exercise real grouping, not just seeding
    assert n_checked == 30


def test_group_peaks_oracle_parity_stress_many_detections():
    """Detections outnumber groups (exercises the oracle's 1e10 padding
    arm vs our rectangular assignment) and groups outnumber max_people
    (exercises candidate-list truncation)."""
    rng = np.random.RandomState(7)
    for case in range(20):
        num_joints = 6
        k = 12
        x, y, val, tag = _random_fixture(rng, num_joints, k, 2,
                                         num_people=2)
        val = np.maximum(val, 0.2)  # everything above threshold
        order = list(range(num_joints))
        want = match_by_tag(
            tag, np.stack([x, y], axis=2), val, order,
            detection_threshold=0.1, tag_threshold=1.0, max_num_people=3,
        )
        got = group_peaks(
            {"x": x, "y": y, "val": val, "tag": tag},
            detection_thresh=0.1, tag_thresh=1.0, max_people=3,
            joint_order=order,
        )
        assert got.shape == want.shape, case
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6,
                                   err_msg=f"case {case}")
        assert got.shape[0] > 3  # seeding really is uncapped


def test_group_peaks_ignore_too_much_arm():
    rng = np.random.RandomState(3)
    x, y, val, tag = _random_fixture(rng, 5, 8, 1, num_people=4)
    val = np.maximum(val, 0.3)
    order = list(range(5))
    want = match_by_tag(
        tag, np.stack([x, y], axis=2), val, order,
        max_num_people=2, ignore_too_much=True,
    )
    got = group_peaks(
        {"x": x, "y": y, "val": val, "tag": tag},
        max_people=2, joint_order=order, ignore_too_much=True,
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_top_k_peaks_gathers_tag_vectors():
    """Flip-test stacks tagmaps as (B, H, W, J, 2); the peak extractor must
    gather the whole tag vector at each peak."""
    import jax.numpy as jnp
    from advmix_tpu.ops.ae import top_k_peaks

    rng = np.random.RandomState(0)
    heat = rng.rand(2, 16, 12, 3).astype(np.float32)
    tags = rng.randn(2, 16, 12, 3, 2).astype(np.float32)
    pk = top_k_peaks(jnp.asarray(heat), jnp.asarray(tags), k=4)
    assert pk["tag"].shape == (2, 3, 4, 2)
    x = np.asarray(pk["x"], np.int64)
    y = np.asarray(pk["y"], np.int64)
    got = np.asarray(pk["tag"])
    for b in range(2):
        for j in range(3):
            for c in range(4):
                np.testing.assert_allclose(
                    got[b, j, c], tags[b, y[b, j, c], x[b, j, c], j]
                )
    # scalar tagmaps keep the scalar contract
    pk1 = top_k_peaks(jnp.asarray(heat), jnp.asarray(tags[..., 0]), k=4)
    assert pk1["tag"].shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(pk1["tag"]), got[..., 0])
