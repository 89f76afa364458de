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

    xla = jax.jit(lambda p, x, l: sdf_with_gradient(net.apply, p, x, l))
    t_xla = timeit(f"XLA sdf_with_gradient [{B},{N}]", xla, params, pts, lat)

    xla_nograd = jax.jit(lambda p, x, l: net.apply({"params": p}, x, l))
    timeit(f"XLA sdf fwd only      [{B},{N}]", xla_nograd, params, pts, lat)

    pallas_grad = jax.jit(lambda p, x, l: fused_sdf_forward(
        p, x, l, compute_grad=True, interpret=False))
    t_pal = timeit(f"Pallas fused fwd+grad [{B},{N}]", pallas_grad,
                   params, pts, lat)

    pallas_nograd = jax.jit(lambda p, x, l: fused_sdf_forward(
        p, x, l, compute_grad=False, interpret=False))
    timeit(f"Pallas fused fwd only [{B},{N}]", pallas_nograd, params, pts, lat)
    print(f"--> pallas/xla fwd+grad speedup: {t_xla / t_pal:.2f}x")


def bench_chamfer():
    from shapeclipper_tpu.ops import chamfer

    N = 100_000
    a = jax.random.uniform(jax.random.PRNGKey(3), (1, N, 3))
    b = jax.random.uniform(jax.random.PRNGKey(4), (1, N, 3))

    os.environ["SCL_CHAMFER_IMPL"] = "xla"
    xla = jax.jit(lambda x, y: chamfer.chamfer_distance_sq(x, y)[:2])
    d_xla = None
    t = timeit(f"XLA chamfer {N}x{N}", xla, a, b, iters=3)
    d_xla = jax.device_get(xla(a, b))

    os.environ["SCL_CHAMFER_IMPL"] = "pallas"
    pal = jax.jit(lambda x, y: chamfer.chamfer_distance_sq(x, y)[:2])
    timeit(f"Pallas chamfer {N}x{N}", pal, a, b, iters=3)
    d_pal = jax.device_get(pal(a, b))
    err = max(float(np.abs(d_xla[0] - d_pal[0]).max()),
              float(np.abs(d_xla[1] - d_pal[1]).max()))
    print(f"--> pallas vs xla max |d^2| err: {err:.3e}")
    del os.environ["SCL_CHAMFER_IMPL"]


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    if which in ("sdf", "all"):
        bench_sdf()
    if which in ("chamfer", "all"):
        bench_chamfer()
