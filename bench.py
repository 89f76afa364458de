"""Benchmark: Pix3D training iterations/sec/chip on the flagship config.

Measures the steady-state jit'd train step (forward + all losses incl. the
CLIP-NN consistency branch + grad + Adam) at the reference's training
configuration (reference `options/pix3d/config.yaml`): global batch 12,
224x224 images, 512 rays/image, 64 samples/ray, ResNet34 encoder + ResNet18
viewpoint estimator, k_nearest=5, n_views=1. Synthetic image data is used so
the number is pure device throughput (the reference's host dataloader is
overlapped/prefetched in real training).

Baseline: the reference publishes no throughput numbers (BASELINE.md), so
there is NO measured denominator. vs_baseline divides by an ASSUMED 2.0 it/s
for the PyTorch reference on one A100 at this config (an estimate, labeled as
such in the JSON) — the honest primary numbers are `value` (it/s/chip),
`step_ms`, `flops_per_step` (XLA cost analysis), and `mfu` (vs. the chip's
bf16 peak; encoders and implicit MLPs default to bf16 compute, see
output/ab_bf16.json).

Robustness: the axon TPU tunnel has been observed DOWN for 5+ hours, and a
backend init can hang rather than fail (CLAUDE.md). Round 4 lost its official
number because the probe loop alone outlived the driver's timeout. So this
script now runs as a SUPERVISOR by default: it probes for the device under a
hard wall-clock deadline, runs the actual measurement in a subprocess with
its own timeout, and ALWAYS prints exactly one JSON line to stdout — the
measurement if it succeeded, otherwise a fallback with `ok: false` and the
most recent committed local measurement — before exiting 0.

Env knobs:
  SCL_BENCH_PROBE_DEADLINE  max seconds spent probing for the device (900)
  SCL_BENCH_RUN_TIMEOUT     max seconds for the measurement subprocess (1800)
  SCL_BENCH_ITERS           timed iterations in the measurement (20)

Prints ONE JSON line:
  {"metric": "pix3d_train_iters_per_sec_per_chip", "value": N,
   "unit": "it/s", "vs_baseline": N/2.0, "step_ms": ..., "flops_per_step":
   ..., "mfu": ..., "device": ..., "ok": true, "baseline_note": "..."}
"""

import glob
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("SCL_BENCH", "1")

ASSUMED_A100_REFERENCE_ITS = 2.0
BASELINE_NOTE = ("vs_baseline divides by an ASSUMED 2.0 it/s A100 "
                 "reference (nothing published; BASELINE.md)")
# newest successful run is tee'd here so the fallback line can report the
# last real measurement without a hardcoded round-specific filename
LOCAL_ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "output", "bench_local_latest.json")


def _last_measured():
    """Most recent committed measurement value, for the fallback line."""
    paths = [LOCAL_ARTIFACT] + sorted(
        glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "output", "bench_r*_local.json")),
        reverse=True)
    for path in paths:
        try:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line.startswith("{"):
                        val = json.loads(line).get("value")
                        if val is not None:
                            return val, os.path.basename(path)
        except Exception:
            continue
    return None, None


def _fallback(reason):
    last, src = _last_measured()
    print(json.dumps({
        "metric": "pix3d_train_iters_per_sec_per_chip",
        "value": None, "unit": "it/s", "vs_baseline": None, "ok": False,
        "error": str(reason)[:300],
        "last_measured_its": last,
        "note": ("bench could not run (TPU tunnel outages of 5+ h have been "
                 "observed); last_measured_its is the most recent committed "
                 f"measurement ({src})"),
    }))


def _wait_for_device(deadline):
    """Probe for a reachable device until `deadline` (time.time()).

    Probes in a subprocess so a hung backend init can be timed out without
    poisoning this process. Returns True if the device answered."""
    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jnp.ones((4, 4)).sum()))")
    sleep_s = float(os.environ.get("SCL_BENCH_PROBE_SLEEP", "60"))
    i = 0
    while True:
        remaining = deadline - time.time()
        if remaining <= 5:
            return False
        i += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True,
                               timeout=min(240, max(remaining, 10)))
            if r.returncode == 0:
                if i > 1:
                    print(f"bench: device reachable after {i - 1} retries",
                          file=sys.stderr)
                return True
            err = (r.stderr or b"").decode(errors="replace").strip()[-200:]
        except subprocess.TimeoutExpired:
            err = "probe timeout"
        left = deadline - time.time()
        print(f"bench: device probe {i} failed ({err}); "
              f"{left:.0f}s of probe budget left", file=sys.stderr)
        if left > sleep_s:
            time.sleep(sleep_s)


def supervise():
    """Always print exactly one JSON line, bounded in wall-clock."""
    probe_deadline = time.time() + float(
        os.environ.get("SCL_BENCH_PROBE_DEADLINE", "900"))
    run_timeout = float(os.environ.get("SCL_BENCH_RUN_TIMEOUT", "1800"))

    if not _wait_for_device(probe_deadline):
        _fallback("device unreachable within probe deadline")
        return

    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--run"], stdout=subprocess.PIPE,
                           stderr=sys.stderr, timeout=run_timeout)
    except subprocess.TimeoutExpired:
        _fallback(f"measurement subprocess exceeded {run_timeout:.0f}s "
                  "(tunnel compiles have taken 500+ s; raise "
                  "SCL_BENCH_RUN_TIMEOUT if the tunnel is just slow)")
        return

    line = None
    for cand in (r.stdout or b"").decode(errors="replace").splitlines():
        cand = cand.strip()
        if cand.startswith("{"):
            line = cand
    if r.returncode == 0 and line is not None:
        try:
            parsed = json.loads(line)
        except Exception:
            parsed = None
        if parsed and parsed.get("value") is not None:
            print(line)
            # tee as the fallback's "last measured" value — but only when
            # measuring the DEFAULT config: A/B arms run under SCL_*
            # overrides and must not masquerade as the flagship number
            overrides = [k for k in ("SCL_FOLD_EIKONAL", "SCL_IMPLICIT_DTYPE",
                                     "SCL_DEVICE_ISOSURFACE", "SCL_FUSED_EVAL",
                                     "SCL_CHAMFER_CROSS", "SCL_CHAMFER_DISTS",
                                     "SCL_REMAT_RENDERER", "SCL_BENCH_BATCH")
                         if os.environ.get(k) is not None]
            if not overrides:
                try:
                    os.makedirs(os.path.dirname(LOCAL_ARTIFACT),
                                exist_ok=True)
                    with open(LOCAL_ARTIFACT, "w") as f:
                        f.write(line + "\n")
                except Exception:
                    pass
            else:
                print(f"bench: not updating {os.path.basename(LOCAL_ARTIFACT)}"
                      f" (A/B overrides active: {overrides})", file=sys.stderr)
            return
    _fallback(f"measurement subprocess rc={r.returncode}, "
              f"last stdout line: {line!r}"[:280])


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from shapeclipper_tpu.config import options
    from shapeclipper_tpu.data import synthetic
    from shapeclipper_tpu.data.base import default_collate
    from shapeclipper_tpu.models.graph import Graph, summarize_loss
    from shapeclipper_tpu.train.pretrainer import make_optimizer
    from shapeclipper_tpu.utils.easydict import EasyDict as edict

    opt = options.load_options(
        os.path.join(os.path.dirname(__file__), "options/pix3d/config.yaml"))
    if os.environ.get("SCL_BENCH_BATCH"):
        # batch-scaling sweep arm (MFU headroom study) — the overrides guard
        # in supervise() keeps these runs out of bench_local_latest.json
        opt.batch_size = int(os.environ["SCL_BENCH_BATCH"])
    opt.H, opt.W = opt.image_size       # 224 x 224
    opt.data.dataset = "synthetic"
    opt.data.num_workers = 0
    opt.data.max_img_cat = opt.batch_size
    opt.data.synthetic = edict(azim_range=[-180, 180], elev_range=[-90, 90],
                               theta_range=[-90, 90])
    opt.seed = 0

    n_chips = len(jax.devices())
    graph = Graph(opt)
    state = graph.init(jax.random.PRNGKey(0))
    params, stats = state["params"], state["batch_stats"]
    tx = make_optimizer(opt, params, lambda p: True)
    opt_state = tx.init(params)

    ds = synthetic.Dataset(opt, split="train")
    batch = default_collate([ds[i] for i in range(opt.batch_size)])
    batch = edict({k: jnp.asarray(v) for k, v in batch.items()})

    def step(params, stats, opt_state, batch, rng):
        def loss_fn(p):
            _, loss, new_stats = graph.forward(p, stats, batch, rng,
                                               training=True, get_loss=True)
            loss = summarize_loss(opt, loss)
            return loss.all, (loss, new_stats)

        (_, (loss, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_stats, new_opt_state, loss["all"]

    step = jax.jit(step, donate_argnums=(0, 1, 2))

    import numpy as np

    rng = jax.random.PRNGKey(1)
    # warmup / compile; float() forces a true device->host sync (some TPU
    # attach transports make block_until_ready effectively async)
    for _ in range(3):
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss_all = step(params, stats, opt_state,
                                                  batch, r)
    float(np.asarray(loss_all))

    # measured FLOPs/step from XLA's cost model (same compiled executable —
    # the compile cache hits)
    flops = None
    try:
        rng_probe = jax.random.PRNGKey(2)
        cost = step.lower(params, stats, opt_state, batch,
                          rng_probe).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost["flops"]) if cost and "flops" in cost else None
    except Exception:
        pass

    n_iters = int(os.environ.get("SCL_BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        rng, r = jax.random.split(rng)
        params, stats, opt_state, loss_all = step(params, stats, opt_state,
                                                  batch, r)
    float(np.asarray(loss_all))
    dt = time.perf_counter() - t0

    its = n_iters / dt / max(n_chips, 1)
    step_s = dt / n_iters
    # bf16 peak FLOP/s per chip (public specs); f32 work runs at half or less,
    # so this MFU is a conservative lower bound
    kind = jax.devices()[0].device_kind.lower()
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12, "v5": 459e12,
             "v6 lite": 918e12, "v6e": 918e12, "v4": 275e12, "v3": 123e12}
    peak = next((v for k, v in sorted(peaks.items(), key=lambda kv: -len(kv[0]))
                 if k in kind), None)
    mfu = (flops / step_s / (peak * max(n_chips, 1))
           if flops and peak else None)
    print(json.dumps({
        "metric": "pix3d_train_iters_per_sec_per_chip",
        "value": round(its, 4),
        "unit": "it/s",
        "vs_baseline": round(its / ASSUMED_A100_REFERENCE_ITS, 4),
        "step_ms": round(step_s * 1000, 3),
        "batch_size": int(opt.batch_size),
        "samples_per_sec_per_chip": round(its * opt.batch_size, 2),
        "flops_per_step": flops,
        "mfu": round(mfu, 5) if mfu is not None else None,
        "device": jax.devices()[0].device_kind,
        "ok": True,
        "baseline_note": BASELINE_NOTE,
    }))


if __name__ == "__main__":
    if "--run" in sys.argv[1:]:
        main()       # measurement child: crash loudly, supervisor handles it
    else:
        try:
            supervise()
        except Exception as e:  # noqa: BLE001 — still print ONE parseable line
            import traceback
            traceback.print_exc(file=sys.stderr)
            _fallback(f"{type(e).__name__}: {e}")
        sys.exit(0)
