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


def _parity(x, y, val, tag, order, max_people=30, thresh=0.1, tag_th=1.0):
    want = match_by_tag(
        tag, np.stack([x, y], axis=2), val, order,
        detection_threshold=thresh, tag_threshold=tag_th,
        max_num_people=max_people,
    )
    got = group_peaks(
        {"x": x, "y": y, "val": val, "tag": tag},
        detection_thresh=thresh, tag_thresh=tag_th,
        max_people=max_people, joint_order=order,
    )
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    return got


# ---------------------------------------------------------------------------
# Adversarial fixtures (VERDICT r4 #6): the official HigherHRNet repo is
# not available to generate golden vectors, so the oracle pair is anchored
# on exactly the degenerate inputs where a shared misreading would hide —
# exact cost ties, key collisions, detection storms, T=2 tag ties — plus a
# property test of the published joint-order dependence.
# ---------------------------------------------------------------------------


def test_adversarial_exact_rounded_tie_three_groups():
    """Three groups at integer-rounding-equivalent tag distances from each
    detection AND equal detection scores: every cost-matrix entry is
    EXACTLY round(d)*100 - v with ties across all 3 columns. Assignment
    tie-breaking must match the published padded-matrix formulation."""
    J, K = 4, 3
    x = np.tile(np.arange(K, dtype=np.float64) * 10, (J, 1))
    y = np.tile(np.arange(K, dtype=np.float64) * 7, (J, 1))
    val = np.full((J, K), 0.5)
    tag = np.zeros((J, K, 1))
    # joint 0 seeds groups at tags 0.0, 1.0, 2.0; all later detections sit
    # at distance exactly 0.5 from two neighbors (round -> 0 and 0) or
    # symmetric integers, forcing equal-cost ties
    tag[0, :, 0] = [0.0, 1.0, 2.0]
    for j in range(1, J):
        tag[j, :, 0] = [0.5, 1.5, 0.5]  # each 0.5 from two seed means
    _parity(x, y, val, tag, list(range(J)))


def test_adversarial_key_collision_merges_groups():
    """The published joint_dict is keyed by the seed tag's FIRST component:
    two seeds with identical tag[0] (different joints, far apart in the
    image) must land in the SAME person, the second RESETTING the group's
    tag list. group_peaks must mirror that quirk exactly."""
    J, K = 3, 2
    x = np.array([[0.0, 50.0], [5.0, 60.0], [9.0, 70.0]])
    y = np.array([[0.0, 40.0], [5.0, 50.0], [9.0, 60.0]])
    val = np.full((J, K), 0.9)
    tag = np.zeros((J, K, 1))
    tag[0, :, 0] = [1.0, 9.0]   # joint 0 seeds keys 1.0 and 9.0
    tag[1, :, 0] = [1.0, 30.0]  # det far from both means (dist 4.0 & 25.0
    # after mean drift) -> candidate fails tag_thresh -> seeds; key 1.0
    # COLLIDES with group 1, key 30.0 is new
    tag[2, :, 0] = [5.0, 5.0]
    got = _parity(x, y, val, tag, list(range(J)), tag_th=0.5)
    # the collision really happened: fewer people than raw seed count
    assert got.shape[0] < 6


def test_adversarial_detection_storm_beyond_max_people():
    """40 above-threshold detections per joint against max_people=5: the
    candidate list truncates, the cost matrix pads 1e10 columns, and the
    uncapped seeding storm grows groups far past max_people — parity on
    group count, membership, and insertion order."""
    rng = np.random.RandomState(42)
    J, K = 5, 40
    x = rng.uniform(0, 128, (J, K))
    y = rng.uniform(0, 96, (J, K))
    val = rng.uniform(0.3, 1.0, (J, K))
    tag = rng.uniform(-8, 8, (J, K, 1))
    got = _parity(x, y, val, tag, list(range(J)), max_people=5)
    assert got.shape[0] > 5


def test_adversarial_t2_first_component_ties():
    """T=2 vector tags whose FIRST components are identical across people
    (they differ only in the second component): grouping distance is the
    L2 norm over the vector, but seed KEYS collide on the scalar first
    component — both effects at once."""
    J, K = 4, 3
    rng = np.random.RandomState(9)
    x = rng.uniform(0, 64, (J, K))
    y = rng.uniform(0, 64, (J, K))
    val = np.full((J, K), 0.8)
    tag = np.zeros((J, K, 2))
    tag[..., 0] = 2.0                      # all first components tie
    tag[0, :, 1] = [0.0, 4.0, 8.0]          # distinct people in dim 2
    for j in range(1, J):
        tag[j, :, 1] = [0.1, 4.1, 7.9]      # near their person's tag
    _parity(x, y, val, tag, list(range(J)))


def test_property_joint_order_dependence_matches():
    """The published algorithm is ORDER-DEPENDENT: processing joints in a
    different order changes the greedy group evolution. Both
    implementations must (a) agree under every permutation and (b) show
    the dependence itself on a crafted fixture (identical results under
    all orders would mean the order plumbing is dead code)."""
    rng = np.random.RandomState(17)
    J, K = 6, 6
    x, y, val, tag = _random_fixture(rng, J, K, 1, num_people=3)
    val = np.maximum(val, 0.25)
    outs = []
    for seed in range(6):
        order = list(np.random.RandomState(seed).permutation(J))
        outs.append(_parity(x, y, val, tag, order, max_people=4))
    shapes = {o.shape[0] for o in outs}
    differs = len(shapes) > 1 or any(
        o.shape != outs[0].shape or not np.allclose(o, outs[0])
        for o in outs[1:]
    )
    assert differs, "joint order had no effect on any permutation"


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
