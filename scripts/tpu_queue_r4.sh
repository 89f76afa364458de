#!/bin/bash
# Round-4 TPU measurement queue: probe the axon tunnel until it is up, then
# run the pending TPU measurements serially (the chip is exclusive):
#   1. bench.py                      -> flagship step rate
#   2. bench_eval.py 8 100           -> fused one-program metric eval (STATUS item 11)
#   3. bench_chamfer.py dists_pallas -> patient Mosaic compile attempt (cached
#      by the persistent XLA compile cache if it ever finishes)
# Logs to output/tpu_queue_r4.log. Waits for any running pytest (pid file)
# to exit before heavy TPU jobs (single-core host starves TPU clients).
set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_queue_r4.log
echo "=== tpu_queue start $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
    timeout 90 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((4,4)).sum()))" >/dev/null 2>&1
}

# 1. wait for the tunnel (probe every 5 min, give up after 10 h)
for i in $(seq 1 120); do
    if probe; then
        echo "tunnel UP at $(date -u +%FT%TZ) (probe $i)" >> "$LOG"
        break
    fi
    if [ "$i" -eq 120 ]; then
        echo "tunnel still DOWN at $(date -u +%FT%TZ); giving up" >> "$LOG"
        exit 1
    fi
    sleep 300
done

# 2. wait for pytest to release the single CPU core
if [ -f /tmp/pytest.pid ]; then
    while kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; do sleep 60; done
fi

# re-probe right before the heavy jobs (tunnel can drop again)
probe || { echo "tunnel dropped before benches $(date -u +%FT%TZ)" >> "$LOG"; exit 1; }

echo "--- bench.py $(date -u +%FT%TZ)" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench_eval 8 100 $(date -u +%FT%TZ)" >> "$LOG"
timeout 5400 python scripts/bench_eval.py 8 100 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

# The patient Mosaic-compile attempt can hold the chip for hours; skip it
# near round end so it cannot collide with the driver's round-end bench.
CUTOFF_UTC="${SCL_QUEUE_CHAMFER_CUTOFF:-14:00}"
if [ "$(date -u +%H:%M)" \< "$CUTOFF_UTC" ]; then
    echo "--- chamfer dists_pallas (patient) $(date -u +%FT%TZ)" >> "$LOG"
    timeout 10800 python scripts/bench_chamfer.py dists_pallas >> "$LOG" 2>&1
    echo "rc=$?" >> "$LOG"
else
    echo "--- chamfer dists_pallas SKIPPED (past $CUTOFF_UTC UTC)" >> "$LOG"
fi

echo "=== tpu_queue done $(date -u +%FT%TZ) ===" >> "$LOG"
