"""Combine individual bench_scaling --worker measurements into the
BENCH_SCALING.json summary (per-stage min across all rounds per config).

The shared sandbox host fluctuates several-fold minute-to-minute, so the
protocol (BASELINE.md) runs measurement pairs at DIFFERENT times across
a session and takes the per-stage min per config — min approximates the
uncontended run. This tool folds any number of such jsonl files.

Usage: python tools/combine_scaling.py runs1.jsonl [runs2.jsonl ...] \
           [--out BENCH_SCALING.json]
"""

from __future__ import annotations

import json
import sys

STAGES = ("ingest_s", "compact_s", "transcode_s", "cluster_s", "verify_s")


def main():
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    runs: dict[int, list[dict]] = {}
    for path in args:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                r = json.loads(line)
                runs.setdefault(int(r["cpus"]), []).append(r)
    if len(runs) != 2:
        sys.exit(f"need exactly 2 cpu configs, got {sorted(runs)}")
    lo, hi = sorted(runs)
    results = {}
    for c in (lo, hi):
        rs = runs[c]
        best = dict(min(rs, key=lambda r: r["total_s"]))
        mins = {k: min(r[k] for r in rs) for k in STAGES}
        best["stage_min_total_s"] = round(sum(mins.values()), 2)
        best.update({f"min_{k}": v for k, v in mins.items()})
        best["n_rounds"] = len(rs)
        results[c] = best
    speedup = results[lo]["stage_min_total_s"] / results[hi]["stage_min_total_s"]
    eff = speedup / (hi / lo)
    summary = {
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        "speedup_lo_to_hi": round(speedup, 3),
        "n_lo": lo, "n_hi": hi,
        "scaling_efficiency": round(eff, 3),
        "gate": ">=0.8",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(summary, f)


if __name__ == "__main__":
    main()
