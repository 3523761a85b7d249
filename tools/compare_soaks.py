"""Compare two soak runs' metric trajectories (e.g. fp32 vs bf16 training).

Usage: python tools/compare_soaks.py checkpoints/soak_r2_conan \
           checkpoints/soak_r2_conan_bf16 [key ...]
Prints one JSON line per common logged step with the requested keys from each
run side by side, then a summary of final-step deltas.  Defaults to the main
generator losses.
"""

from __future__ import annotations

import json
import sys


def load(path):
    out = {}
    for line in open(f"{path}/metrics.jsonl"):
        m = json.loads(line)
        if m.get("prefix") == "tr":
            out[m["step"]] = m
    return out


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    keys = sys.argv[3:] or ["l1", "ssim", "uv", "fdiff", "vq_loss", "total_g"]
    a, b = load(a_dir), load(b_dir)
    common = sorted(set(a) & set(b))
    for s in common:
        row = {"step": s}
        for k in keys:
            if k in a[s] and k in b[s]:
                row[k] = [round(a[s][k], 4), round(b[s][k], 4)]
        print(json.dumps(row))
    if common:
        last = common[-1]
        summary = {"final_step": last}
        for k in keys:
            if k in a[last] and k in b[last] and abs(a[last][k]) > 1e-9:
                summary[k + "_rel_delta"] = round(
                    (b[last][k] - a[last][k]) / abs(a[last][k]), 4)
        print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
