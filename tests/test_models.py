import jax
import jax.numpy as jnp
import numpy as np

from shapeclipper_tpu.models.estimator import Estimator, reset_scale_params
from shapeclipper_tpu.models.layers import BottleneckLinear, LatentProjection
from shapeclipper_tpu.models.resnet import resnet18, resnet34


def test_resnet_shapes():
    net = resnet34(num_classes=1024)
    x = jnp.zeros((2, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (2, 1024)
    feat_net = resnet18(num_classes=None)
    v18 = feat_net.init(jax.random.PRNGKey(1), x, train=False)
    assert feat_net.apply(v18, x, train=False).shape == (2, 512)


def test_resnet_batchnorm_updates():
    net = resnet18(num_classes=None)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = net.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    diffs = sum(float(jnp.abs(a - b).sum()) for a, b in zip(old, new))
    assert diffs > 0


def test_bottleneck_linear_zero_init_is_relu_identity():
    blk = BottleneckLinear(8, zero_init=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    variables = blk.init(jax.random.PRNGKey(1), x, train=False)
    out = blk.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax.nn.relu(x)),
                               atol=1e-5)


def test_latent_projection_shape():
    proj = LatentProjection(512, 64)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 512))
    variables = proj.init(jax.random.PRNGKey(1), x, train=False)
    assert proj.apply(variables, x, train=False).shape == (3, 64)


def test_estimator_init_biases():
    est = Estimator(size_range=0.2, perspect_range=0.0)
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
    variables = est.init(jax.random.PRNGKey(1), imgs, train=False)
    out = est.apply(variables, imgs, train=False)
    # elev and theta forced to angle 0 => (cos, sin) = (1, 0)
    np.testing.assert_allclose(np.asarray(out.trig_elev),
                               np.tile([1.0, 0.0], (4, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.trig_theta),
                               np.tile([1.0, 0.0], (4, 1)), atol=1e-5)
    # scales start at exactly 1
    np.testing.assert_allclose(np.asarray(out.scale_focal), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.scale_dist), 1.0, atol=1e-6)
    # azim normalized
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out.trig_azim, axis=-1)), 1.0, atol=1e-5)


def test_reset_scale_params():
    est = Estimator()
    imgs = jnp.zeros((1, 32, 32, 3))
    variables = est.init(jax.random.PRNGKey(0), imgs, train=False)
    params = dict(variables["params"])
    # perturb then reset
    params["size_fc"] = {"kernel": jnp.ones_like(params["size_fc"]["kernel"]),
                         "bias": jnp.ones_like(params["size_fc"]["bias"])}
    params = reset_scale_params(params)
    assert float(jnp.abs(params["size_fc"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(params["perspect_fc"]["bias"]).sum()) == 0.0
