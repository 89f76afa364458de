"""bf16-implicit A/B (VERDICT round-1 item 4): run the synthetic convergence
validation at float32 vs tpu.implicit_dtype=bfloat16 over several seeds, in
ONE process so the jit cache is shared (each dtype compiles once).

Usage: python scripts/ab_bf16.py [n_steps] [n_seeds]
Writes output/ab_bf16.json with per-run summaries + means.
"""
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from validate_training import main as validate  # noqa: E402


def run(n_steps=300, n_seeds=3):
    results = []
    for dtype in (None, "bfloat16"):
        for seed in range(n_seeds):
            tag = f"_ab_{dtype or 'f32'}_s{seed}"
            validate(n_steps, seed=seed, implicit_dtype=dtype, tag=tag)
            with open(f"output/validate{tag}/summary.json") as f:
                results.append(json.load(f))

    def agg(dt, key):
        vals = [r[key] for r in results if r["implicit_dtype"] == dt]
        return sum(vals) / len(vals)

    summary = {"runs": results}
    for dt in ("float32", "bfloat16"):
        summary[dt] = {k: agg(dt, k) for k in
                       ("loss_last10", "cd_final", "it_per_sec")}
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"},
                     indent=2))
    with open("output/ab_bf16.json", "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
        int(sys.argv[2]) if len(sys.argv) > 2 else 3)
