import jax
import jax.numpy as jnp
import numpy as np

from shapeclipper_tpu.utils import tree
from shapeclipper_tpu.utils.log import AverageMeter, Timer, get_time


def test_move_to_device_and_host():
    t = {"a": np.ones((2, 3)), "b": {"c": np.zeros(4)}}
    d = tree.move_to_device(t)
    assert isinstance(d["a"], jax.Array)
    h = tree.to_host(d)
    np.testing.assert_array_equal(h["a"], t["a"])


def test_detach_tensors_blocks_gradient():
    def f(x):
        return jnp.sum(tree.detach_tensors({"x": x})["x"] * x)

    x = jnp.ones(3)
    g = jax.grad(f)(x)
    # d/dx [stop_grad(x) * x] = stop_grad(x) = 1
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_tree_norm():
    t = {"a": jnp.ones((2, 2)), "b": jnp.ones(5) * 2}
    np.testing.assert_allclose(float(tree.tree_norm(t)),
                               np.sqrt(4 + 20), rtol=1e-6)


def test_get_layer_dims():
    assert tree.get_layer_dims([3, 64, 64, 1]) == [(3, 64), (64, 64), (64, 1)]


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2


def test_get_time():
    assert get_time(90061) == (1, 1, 1, 1)


def test_timer_eta():
    t = Timer()
    t.begin_iter()
    t.end_iter(max_epoch=10, ep=0, it_per_ep=100)
    assert t.arrival >= 0 and t.it_per_sec >= 0
