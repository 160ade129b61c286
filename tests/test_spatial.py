"""GSPMD spatial partitioning (parallel/spatial.py): images sharded
(B, H) over a (data, model) mesh must produce the same outputs as a
replicated forward — XLA inserts the conv halo exchanges. The torch
reference's DataParallel (`tools/train.py:106`) has no intra-image
analog; this is inference scaling for the large-input bottom-up family.
"""

import numpy as np
import jax
import jax.numpy as jnp

from advmix_tpu.models.pose_resnet import PoseResNet
from advmix_tpu.models.higher_hrnet import HigherHRNet
from advmix_tpu.parallel import get_mesh, make_spatial_forward
from advmix_tpu.parallel.spatial import spatial_sharding

from test_bottomup import TINY_STAGES


def test_mesh_model_parallel_axes():
    mesh = get_mesh(8, model_parallel=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)


def test_spatial_forward_matches_replicated_resnet():
    """PoseResNet-18 (strided convs + BN + transposed-conv head): the
    spatially partitioned forward is numerically the replicated one."""
    model = PoseResNet(num_layers=18, num_joints=4,
                       num_deconv_filters=(16, 16, 16))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(1), x[:1], train=False)
    want = np.asarray(model.apply(v, x, train=False))

    mesh = get_mesh(8, model_parallel=4)
    fwd = make_spatial_forward(model, mesh)
    xs = jax.device_put(x, spatial_sharding(mesh))
    # rows really are split: each addressable shard holds H/4 = 16 rows
    assert {s.data.shape for s in xs.addressable_shards} == {(2, 16, 64, 3)}
    got = np.asarray(jax.device_get(fwd(v, xs)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-5)


def test_spatial_forward_higher_hrnet_two_scale():
    """HigherHRNet returns a two-scale pytree (1/4 and 1/2 resolution);
    both outputs must match the replicated forward under (B, H)
    sharding."""
    model = HigherHRNet(num_joints=5, **TINY_STAGES)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(3), x[:1], train=False)
    want = model.apply(v, x, train=False)

    mesh = get_mesh(8, model_parallel=4)
    fwd = make_spatial_forward(model, mesh)
    xs = jax.device_put(x, spatial_sharding(mesh))
    got = fwd(v, xs)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(jax.device_get(g)), np.asarray(w),
            rtol=2e-4, atol=5e-5,
        )
