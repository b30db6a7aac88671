#!/usr/bin/env python3
"""Merge the two sf100 slice legs and classify the sf10->sf100 decade.

The sf100 slice runs as two Bench invocations (index slice with warm =
builds; scan slice with SPARK_GRAFT_WARM=0) against no SF2 side; this
script joins their per-query times with the SAME-SESSION sf10 leg
(both RUNS=1, same machine, same frozen classes) and applies Bench's
own classification rules: ratio > 15 on a >=0.3 s baseline = superlinear
(partitioned into the declared quadratic oracles), baseline < 0.3 s =
ratio_noisy (annotated, unmeasured). Writes docs/bench_sf100_slice.json.

Usage: merge_sf100.py <sf100_index.out> <sf100_scan.out> <sf10_leg.out> [out]
"""
import json
import sys

# mirrors Bench.SUPERLINEAR_DECLARED: the two quadratic oracles plus the
# n^1.5 sqrt-K-law IVF dedup production twin
QUADRATIC_ORACLES = {"d05_dedup_embedding", "d09_dedup_semantic",
                     "d05b_dedup_embedding_ivf"}


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    a, b, sf10p = sys.argv[1], sys.argv[2], sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "docs/bench_sf100_slice.json"
    ja, jb, j10 = load(a), load(b), load(sf10p)
    q100 = {**ja["queries"], **jb["queries"]}
    q10 = j10["queries"]
    failed = sorted(set(ja.get("failed", []) + jb.get("failed", [])))
    ratios, noisy = {}, []
    for k, v in sorted(q100.items()):
        t10 = q10.get(k)
        if t10 is None or t10 <= 0 or v < 0:
            continue
        ratios[k] = round(v / t10, 2)
        if t10 < 0.3:
            noisy.append(k)
    sl = [k for k, r in ratios.items()
          if r > 15.0 and q10.get(k, 0) >= 0.3]
    declared = sorted(k for k in sl if k in QUADRATIC_ORACLES)
    undeclared = sorted(k for k in sl if k not in QUADRATIC_ORACLES)
    doc = {
        "sf": ja["sf"], "sf2": j10["sf"],
        "n_queries": len(q100),
        "queries": {k: round(v, 3) for k, v in sorted(q100.items())},
        "queries_sf10": {k: round(q10[k], 3) for k in sorted(q100) if k in q10},
        "scale_ratio": ratios,
        "superlinear": undeclared,
        "superlinear_declared": declared,
        "ratio_noise_floor_sec": 0.3,
        "ratio_noisy": sorted(noisy),
        "failed": failed,
        "value": round(sum(v for v in q100.values() if v >= 0), 1),
        "unit": "sec",
        "note": ("production-path slice at sf100 (index slice warm=builds; "
                 "scan slice SPARK_GRAFT_WARM=0, both RUNS=1); ratios vs the "
                 "same-session sf10 leg"),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: {len(q100)} queries, value={doc['value']}s, "
          f"superlinear={undeclared}, declared={declared}, noisy={noisy}, "
          f"failed={failed}")
    if undeclared or failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
