#!/bin/bash
# Round-5 session-D TPU queue: wait for the running Pallas-chamfer compile
# attempt (pid file /tmp/chamfer.pid, bounded by its own timeout 5400) to
# release the exclusive chip, then run serially:
#   1. bench.py at defaults            -> same-session anchor + refreshes
#                                         output/bench_local_latest.json
#   2. SCL_BENCH_BATCH=24 bench.py     -> batch-scaling MFU sweep arm
#   3. SCL_BENCH_BATCH=48 bench.py     -> batch-scaling MFU sweep arm
# Logs to output/tpu_queue_r5d.log; sweep JSON lines to
# output/batch_sweep_r5.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_queue_r5d.log
SWEEP=output/batch_sweep_r5.jsonl
echo "=== tpu_queue_r5d start $(date -u +%FT%TZ) ===" >> "$LOG"

# 1. wait for the chamfer job to exit (it holds the exclusive TPU)
if [ -f /tmp/chamfer.pid ]; then
    CPID=$(cat /tmp/chamfer.pid)
    while kill -0 "$CPID" 2>/dev/null; do sleep 30; done
    echo "chamfer job $CPID exited at $(date -u +%FT%TZ)" >> "$LOG"
fi
sleep 10

probe() {
    timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.ones((4,4)).sum()))" >/dev/null 2>&1
}
for i in $(seq 1 24); do
    if probe; then
        echo "tunnel UP at $(date -u +%FT%TZ) (probe $i)" >> "$LOG"
        break
    fi
    if [ "$i" -eq 24 ]; then
        echo "tunnel DOWN at $(date -u +%FT%TZ); giving up" >> "$LOG"
        exit 1
    fi
    sleep 240
done

run_bench() {  # $1 = batch ('' for defaults), $2 = label
    echo "--- bench batch=${1:-default} start $(date -u +%FT%TZ)" >> "$LOG"
    if [ -n "$1" ]; then
        OUT=$(SCL_BENCH_BATCH="$1" timeout 2400 python bench.py 2>>"$LOG")
    else
        OUT=$(timeout 2400 python bench.py 2>>"$LOG")
    fi
    RC=$?
    echo "$OUT" >> "$LOG"
    echo "$OUT" | tail -1 >> "$SWEEP"
    echo "--- bench batch=${1:-default} rc=$RC $(date -u +%FT%TZ)" >> "$LOG"
}

run_bench "" anchor
run_bench 24 b24
run_bench 48 b48
echo "=== tpu_queue_r5d done $(date -u +%FT%TZ) ===" >> "$LOG"
