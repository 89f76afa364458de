"""Real-TPU kernel experiments (VERDICT round-1 items 1a/6):

  1. Pallas fused SDF forward (+fwd-mode grad) vs the XLA `sdf_with_gradient`
     path at the train shape [12, 512*64] and the eval-grid shape.
  2. Pallas chamfer reduction-grid kernel vs the tiled-XLA scan at
     100k x 100k.

Each phase is individually bounded and prints compile + steady-state times,
so a Mosaic compile pathology shows up as a number, not a hang. Run phases
selectively: python scripts/bench_kernels.py [sdf|chamfer|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    # benched fns return scalar reductions, so the host fetch is tiny (the
    # axon tunnel moves ~30 MB/s — fetching full outputs would swamp timing)
    leaves = jax.tree_util.tree_leaves(x)
    return float(np.asarray(leaves[0]).ravel()[0])  # true host fetch


def timeit(name, f, *args, iters=10):
    t0 = time.perf_counter()
    out = f(*args)
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    sync(out)
    run_ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:48s} compile {compile_s:7.1f}s   run {run_ms:8.2f} ms")
    return run_ms


def bench_sdf():
    from shapeclipper_tpu.models.implicit import SDFNetwork, sdf_with_gradient
    from shapeclipper_tpu.ops.fused_sdf import fused_sdf_forward

    net = SDFNetwork()
    B, N, C = 12, 512 * 64, 64
    pts = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.3
    params = net.init(jax.random.PRNGKey(0), pts[:, :8], lat)["params"]

    def scalarize(f):
        return lambda *a: jax.tree_util.tree_map(
            lambda t: jnp.mean(t) if t is not None else None, f(*a),
            is_leaf=lambda t: t is None)

    xla = jax.jit(scalarize(
        lambda p, x, l: sdf_with_gradient(net.apply, p, x, l)))
    t_xla = timeit(f"XLA sdf_with_gradient [{B},{N}]", xla, params, pts, lat)

    xla_nograd = jax.jit(scalarize(
        lambda p, x, l: net.apply({"params": p}, x, l)))
    timeit(f"XLA sdf fwd only      [{B},{N}]", xla_nograd, params, pts, lat)

    pallas_grad = jax.jit(scalarize(lambda p, x, l: fused_sdf_forward(
        p, x, l, compute_grad=True, interpret=False)))
    t_pal = timeit(f"Pallas fused fwd+grad [{B},{N}]", pallas_grad,
                   params, pts, lat)

    pallas_nograd = jax.jit(scalarize(lambda p, x, l: fused_sdf_forward(
        p, x, l, compute_grad=False, interpret=False)))
    timeit(f"Pallas fused fwd only [{B},{N}]", pallas_nograd, params, pts, lat)
    print(f"--> pallas/xla fwd+grad speedup: {t_xla / t_pal:.2f}x")


def bench_pair():
    """Training fwd+bwd: XLA nested-vjp vs the fused Pallas pair at the
    train shape (the round-3 headline kernel)."""
    from shapeclipper_tpu.models.implicit import SDFNetwork, sdf_with_gradient
    from shapeclipper_tpu.ops.fused_sdf import fused_sdf_train

    net = SDFNetwork()
    B, N, C = 12, 512 * 64, 64
    pts = jax.random.uniform(jax.random.PRNGKey(1), (B, N, 3),
                             minval=-1, maxval=1)
    lat = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.3
    params = net.init(jax.random.PRNGKey(0), pts[:, :8], lat)["params"]

    def loss_of(fn):
        def f(p, x, l):
            s, fe, g = fn(p, x, l)
            return ((s ** 2).mean() + (fe ** 2).mean()
                    + ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean())
        return f

    vjp_g = jax.jit(jax.grad(loss_of(
        lambda p, x, l: sdf_with_gradient(net.apply, p, x, l)),
        argnums=(0, 1, 2)))
    t_x = timeit(f"XLA vjp fwd+bwd       [{B},{N}]", vjp_g, params, pts, lat)

    def bf16_apply(v, x, l):  # tpu.implicit_dtype=bfloat16 equivalent
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: a.astype(jnp.bfloat16), t)
        return net.apply(cast(v), x.astype(jnp.bfloat16),
                         l.astype(jnp.bfloat16)).astype(jnp.float32)

    vjp_bf16 = jax.jit(jax.grad(loss_of(
        lambda p, x, l: sdf_with_gradient(bf16_apply, p, x, l)),
        argnums=(0, 1, 2)))
    timeit(f"XLA vjp fwd+bwd bf16  [{B},{N}]", vjp_bf16, params, pts, lat)

    mm = os.environ.get("SCL_PAIR_MM", "float32")
    pal_g = jax.jit(jax.grad(loss_of(fused_sdf_train), argnums=(0, 1, 2)))
    t_p = timeit(f"Pallas pair fwd+bwd   [{B},{N}] mm={mm}", pal_g,
                 params, pts, lat)
    print(f"--> pallas-pair/xla fwd+bwd speedup: {t_x / t_p:.2f}x")

    # numeric cross-check on device
    gx = vjp_g(params, pts, lat)
    gp = pal_g(params, pts, lat)
    errs = [float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
            for a, b in zip(jax.tree_util.tree_leaves(gx),
                            jax.tree_util.tree_leaves(gp))]
    print(f"--> max rel grad err across leaves: {max(errs):.3e}")


def bench_sdf_eval_shape():
    """The ACTUAL eval-grid configuration (compute_grad=False, 32k-point
    chunks, eval batch): decides the fused_eval default."""
    from shapeclipper_tpu.models.implicit import SDFNetwork
    from shapeclipper_tpu.ops.fused_sdf import fused_sdf_forward

    net = SDFNetwork()
    B, N, C = 4, 32768, 64
    pts = jax.random.uniform(jax.random.PRNGKey(5), (B, N, 3),
                             minval=-0.6, maxval=0.6)
    lat = jax.random.normal(jax.random.PRNGKey(6), (B, C)) * 0.3
    params = net.init(jax.random.PRNGKey(0), pts[:, :8], lat)["params"]

    def scalarize(f):
        return lambda *a: jax.tree_util.tree_map(
            lambda t: jnp.mean(t) if t is not None else None, f(*a),
            is_leaf=lambda t: t is None)

    xla = jax.jit(scalarize(lambda p, x, l: net.apply({"params": p}, x, l)))
    t_x = timeit(f"XLA eval fwd          [{B},{N}]", xla, params, pts, lat)
    pal = jax.jit(scalarize(lambda p, x, l: fused_sdf_forward(
        p, x, l, compute_grad=False, interpret=False)))
    t_p = timeit(f"Pallas eval fwd       [{B},{N}]", pal, params, pts, lat)
    print(f"--> pallas/xla eval-shape speedup: {t_x / t_p:.2f}x")


def bench_chamfer():
    from shapeclipper_tpu.ops import chamfer

    N = 100_000
    a = jax.random.uniform(jax.random.PRNGKey(3), (1, N, 3))
    b = jax.random.uniform(jax.random.PRNGKey(4), (1, N, 3))

    os.environ["SCL_CHAMFER_IMPL"] = "xla"
    xla = jax.jit(lambda x, y: tuple(
        jnp.mean(d) for d in chamfer.chamfer_distance_sq(x, y)[:2]))
    timeit(f"XLA chamfer {N}x{N}", xla, a, b, iters=3)
    d_xla = jax.device_get(xla(a, b))

    os.environ["SCL_CHAMFER_IMPL"] = "pallas"
    pal = jax.jit(lambda x, y: tuple(
        jnp.mean(d) for d in chamfer.chamfer_distance_sq(x, y)[:2]))
    timeit(f"Pallas chamfer {N}x{N}", pal, a, b, iters=3)
    d_pal = jax.device_get(pal(a, b))
    err = max(abs(float(d_xla[0]) - float(d_pal[0])),
              abs(float(d_xla[1]) - float(d_pal[1])))
    print(f"--> pallas vs xla |mean d^2| err: {err:.3e}")
    del os.environ["SCL_CHAMFER_IMPL"]


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    if which in ("sdf", "all"):
        bench_sdf()
    if which in ("pair", "all"):
        bench_pair()
    if which in ("evalshape", "all"):
        bench_sdf_eval_shape()
    if which in ("chamfer", "all"):
        bench_chamfer()
