#!/bin/bash
# Round-5 follow-up TPU queue: waits for tpu_queue_r5.sh (pid file
# /tmp/queue_r5.pid) to release the exclusive chip, then
#   1. completes the step-time default matrix (queue r5 measured
#      fold=on/bf16 17.43 and fold=off/bf16 18.57 it/s):
#        arm 3: fold=on,  implicit f32   -> isolates the bf16 effect
#        arm 4: fold=off, implicit f32   -> r4's exact config, same tunnel
#      (flags explicit: the repo defaults changed to fold=off/bf16 after
#      the r5 measurements)
#   2. re-measures bench_eval: today's run showed device isosurface 0.32x
#      vs host (0.495 vs 1.524 samples/s) — the OPPOSITE of the r4 claim;
#      need a second sample before touching the default.
# Appends to output/tpu_queue_r5.log so the whole matrix reads in one place.
set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_queue_r5.log

if [ -f /tmp/queue_r5.pid ]; then
    while kill -0 "$(cat /tmp/queue_r5.pid)" 2>/dev/null; do sleep 60; done
fi
# serialize behind any foreground pytest (single CPU core)
if [ -f /tmp/pytest.pid ]; then
    while kill -0 "$(cat /tmp/pytest.pid)" 2>/dev/null; do sleep 60; done
fi

echo "=== tpu_queue_r5b start $(date -u +%FT%TZ) ===" >> "$LOG"

probe() {
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((4,4)).sum()))" >/dev/null 2>&1
}
for i in $(seq 1 24); do
    probe && break
    [ "$i" -eq 24 ] && { echo "tunnel DOWN; r5b giving up $(date -u +%FT%TZ)" >> "$LOG"; exit 1; }
    sleep 300
done

echo "--- bench.py fold=on implicit=f32 $(date -u +%FT%TZ)" >> "$LOG"
SCL_FOLD_EIKONAL=1 SCL_IMPLICIT_DTYPE=float32 SCL_BENCH_PROBE_DEADLINE=300 \
    timeout 3000 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench.py fold=off implicit=f32 (r4 config) $(date -u +%FT%TZ)" >> "$LOG"
SCL_FOLD_EIKONAL=0 SCL_IMPLICIT_DTYPE=float32 SCL_BENCH_PROBE_DEADLINE=300 \
    timeout 3000 python bench.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "--- bench_eval 8 100 (repeat; device-vs-host iso variance) $(date -u +%FT%TZ)" >> "$LOG"
timeout 5400 python scripts/bench_eval.py 8 100 >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

echo "=== tpu_queue_r5b done $(date -u +%FT%TZ) ===" >> "$LOG"
