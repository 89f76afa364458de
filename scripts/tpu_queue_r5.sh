#!/bin/bash
# Round-5 TPU measurement queue: probe the axon tunnel until it is up, then
# run the pending TPU measurements serially (the chip is exclusive):
#   1. bench.py                          -> flagship step rate (eikonal fold
#      + bf16 implicit defaults); writes output/bench_local_latest.json
#   2. bench.py with SCL_FOLD_EIKONAL=0  -> fold-off arm of the step A/B
#   3. bench_eval.py 8 100               -> metric-eval samples/s
#   4. bench_chamfer dists_pallas        -> patient Mosaic compile attempt
#      (wall-clock capped; skipped near round end so it can never collide
#      with the driver's round-end bench)
# Logs to output/tpu_queue_r5.log. Waits for any running pytest (pid file)
# to exit before heavy TPU jobs (single-core host starves TPU clients).
set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_queue_r5.log
echo "=== tpu_queue_r5 start $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((4,4)).sum()))" >/dev/null 2>&1
}

# 1. wait for the tunnel (probe every 5 min, give up after 8 h)
for i in $(seq 1 96); do
    if probe; then
        echo "tunnel UP at $(date -u +%FT%TZ) (probe $i)" >> "$LOG"
        break
    fi
    if [ "$i" -eq 96 ]; then
        echo "tunnel still DOWN at $(date -u +%FT%TZ); giving up" >> "$LOG"
        exit 1
    fi
    sleep 300
done

# 2. wait for pytest to release the single CPU core
if [ -f /tmp/pytest.pid ]; then
    while kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; do sleep 60; done
fi

probe || { echo "tunnel dropped before benches $(date -u +%FT%TZ)" >> "$LOG"; exit 1; }

echo "--- bench.py (fold on, defaults) $(date -u +%FT%TZ)" >> "$LOG"
SCL_BENCH_PROBE_DEADLINE=600 timeout 3000 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench.py SCL_FOLD_EIKONAL=0 $(date -u +%FT%TZ)" >> "$LOG"
SCL_FOLD_EIKONAL=0 SCL_BENCH_PROBE_DEADLINE=300 timeout 3000 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench_eval 8 100 $(date -u +%FT%TZ)" >> "$LOG"
timeout 5400 python scripts/bench_eval.py 8 100 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

# The patient Mosaic-compile attempt can hold the chip for hours; skip it
# near round end so it cannot collide with the driver's round-end bench.
CUTOFF_UTC="${SCL_QUEUE_CHAMFER_CUTOFF:-18:00}"
if [ "$(date -u +%H:%M)" \< "$CUTOFF_UTC" ]; then
    echo "--- chamfer dists_pallas (patient) $(date -u +%FT%TZ)" >> "$LOG"
    timeout 7200 python scripts/bench_chamfer.py dists_pallas >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
else
    echo "--- chamfer dists_pallas SKIPPED (past $CUTOFF_UTC UTC)" >> "$LOG"
fi

echo "=== tpu_queue_r5 done $(date -u +%FT%TZ) ===" >> "$LOG"
