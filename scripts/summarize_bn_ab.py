"""Summarize the BN-sharding convergence A/B (VERDICT round-2 item 5a):
mesh=1 vs mesh=8 runs of scripts/validate_training.py over seeds.

    python scripts/summarize_bn_ab.py
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    runs = {}
    for path in sorted(glob.glob("output/validate_bn_mesh*_s*/summary.json")):
        tag = path.split("/")[1].replace("validate_bn_", "")
        with open(path) as f:
            runs[tag] = json.load(f)
    if not runs:
        print("no summaries found")
        return
    out = {"runs": runs}
    for mesh in ("mesh1", "mesh8"):
        vals = [r for t, r in runs.items() if t.startswith(mesh)]
        if vals:
            out[mesh] = {
                "n": len(vals),
                "cd_final_mean": sum(r["cd_final"] for r in vals) / len(vals),
                "loss_last10_mean": sum(r["loss_last10"]
                                        for r in vals) / len(vals),
            }
    if "mesh1" in out and "mesh8" in out:
        m1, m8 = out["mesh1"]["cd_final_mean"], out["mesh8"]["cd_final_mean"]
        out["cd_rel_delta"] = (m8 - m1) / m1
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}, indent=1))
    with open("output/bn_sharding_ab.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
