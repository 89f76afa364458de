"""Time ONE chamfer variant on the real TPU at the production eval shape
(VERDICT round-3 item 2: measure and close the chamfer gap).

Usage: python scripts/bench_chamfer.py VARIANT [N] [B]
  VARIANT in:
    dists_xla     - chamfer_dists_sq, XLA bidirectional one-pass scan
                    (tiles via SCL_CHAMFER_TILE1/TILE2)
    dists_pallas  - chamfer_dists_sq, Pallas dist-only reduction-grid kernel
    prod_xla      - chamfer_distance_sq (dist+argmin), XLA scan — the
                    round-3 production eval path, the baseline to beat
    prod_pallas   - chamfer_distance_sq, Pallas dist+argmin kernel
  append `_nodot` to an XLA variant to form the cross-distance tile from
  explicit per-coordinate squared differences (SCL_CHAMFER_CROSS=nodot)
  instead of an MXU dot

Each invocation is a fresh process so a Mosaic compile pathology can be
bounded with `timeout` from the driver loop; the result is ONE JSON line on
stdout (also appended to output/chamfer_timing_r4.jsonl). Calls are EAGER
(not jit-wrapped), exactly as `eval3d/metrics.py:190` dispatches them — and
round 3 measured jit-wrapping these to hit 30-40+ min tunnel compiles.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    variant = sys.argv[1]
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    variant_base = variant
    for cross in ("nodot", "dot"):
        if variant.endswith("_" + cross):
            os.environ["SCL_CHAMFER_CROSS"] = cross
            variant_base = variant[:-len("_" + cross)]
            break
    impl = "pallas" if variant_base.endswith("pallas") else "xla"
    os.environ["SCL_CHAMFER_IMPL"] = impl
    if variant_base == "dists_xla_bidir":
        os.environ["SCL_CHAMFER_DISTS"] = "bidir"
    if variant_base == "dists_xla_bidir_prune":
        os.environ["SCL_CHAMFER_DISTS"] = "bidir_prune"

    import jax
    import numpy as np
    from shapeclipper_tpu.ops import chamfer

    a = jax.random.uniform(jax.random.PRNGKey(3), (B, N, 3))
    b = jax.random.uniform(jax.random.PRNGKey(4), (B, N, 3))

    if variant_base.startswith("dists"):
        fn = lambda: chamfer.chamfer_dists_sq(a, b)        # noqa: E731
    else:
        fn = lambda: chamfer.chamfer_distance_sq(a, b)[:2]  # noqa: E731

    def run_once():
        d1, d2 = fn()
        # true host fetch of scalars (block_until_ready lies through axon)
        return float(np.asarray(d1.mean())), float(np.asarray(d2.mean()))

    t0 = time.perf_counter()
    m1, m2 = run_once()
    compile_s = time.perf_counter() - t0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once()
    run_s = (time.perf_counter() - t0) / iters

    rec = dict(variant=variant, impl=impl, B=B, N=N,
               dists=os.environ.get("SCL_CHAMFER_DISTS", "bidir"),
               cross=os.environ.get("SCL_CHAMFER_CROSS", "nodot"),
               tile1=int(os.environ.get("SCL_CHAMFER_TILE1", 4096)),
               tile2=int(os.environ.get("SCL_CHAMFER_TILE2", 16384)),
               compile_s=round(compile_s, 1),
               s_per_batch=round(run_s, 4),
               ms_per_sample=round(run_s / B * 1000, 1),
               mean_d1=m1, mean_d2=m2,
               backend=jax.default_backend())
    line = json.dumps(rec)
    print(line)
    os.makedirs("output", exist_ok=True)
    with open("output/chamfer_timing_r4.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
