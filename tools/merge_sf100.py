#!/usr/bin/env python3
"""Merge sf100 slice legs and classify the sf10->sf100 decade.

The sf100 slice runs as several Bench invocations (index slice with
warm = the builds; scan slices with SPARK_GRAFT_WARM=0; disk-casualty
re-runs isolated) against no SF2 side; this script joins their
per-query times — later legs override earlier ones, so an isolated
re-run supersedes a crashed in-suite sample — with the SAME-SESSION
sf10 leg (all RUNS=1, same machine, same frozen classes) and applies
Bench's classification: ratio > 15 on a >=0.3 s baseline = superlinear
(partitioned into Bench.SUPERLINEAR_DECLARED), baseline < 0.3 s =
ratio_noisy. Queries failing in one leg but succeeding in a later
re-run are not failures. Writes the merged artifact.

Usage: merge_sf100.py <sf10_leg(.out|.json)> <outJson> <leg1.out> [leg2.out ...]
"""
import json
import sys

# mirrors Bench.SUPERLINEAR_DECLARED: the two quadratic oracles plus the
# n^1.5 sqrt-K-law IVF dedup production twin
SUPERLINEAR_DECLARED = {"d05_dedup_embedding", "d09_dedup_semantic",
                        "d05b_dedup_embedding_ivf"}


def load(path):
    if path.endswith(".json"):
        return json.load(open(path))
    for line in open(path):
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main():
    sf10p, out = sys.argv[1], sys.argv[2]
    legs = [load(p) for p in sys.argv[3:]]
    j10 = load(sf10p)
    q10 = j10["queries"]
    q100, failed = {}, set()
    for leg in legs:
        for k, v in leg["queries"].items():
            if v >= 0:
                q100[k] = v
                failed.discard(k)
            elif k not in q100:
                failed.add(k)
    ratios, noisy = {}, []
    for k, v in sorted(q100.items()):
        t10 = q10.get(k)
        if t10 is None or t10 <= 0:
            continue
        ratios[k] = round(v / t10, 2)
        if t10 < 0.3:
            noisy.append(k)
    sl = [k for k, r in ratios.items() if r > 15.0 and q10.get(k, 0) >= 0.3]
    declared = sorted(k for k in sl if k in SUPERLINEAR_DECLARED)
    undeclared = sorted(k for k in sl if k not in SUPERLINEAR_DECLARED)
    doc = {
        "sf": legs[0]["sf"], "sf2": j10["sf"],
        "n_queries": len(q100),
        "queries": {k: round(v, 3) for k, v in sorted(q100.items())},
        "queries_sf10": {k: round(q10[k], 4)
                         for k in sorted(q100) if k in q10},
        "scale_ratio": {k: ratios[k] for k in sorted(ratios)},
        "superlinear": undeclared,
        "superlinear_declared": declared,
        "ratio_noise_floor_sec": 0.3,
        "ratio_noisy": sorted(noisy),
        "failed": sorted(failed),
        "value": round(sum(q100.values()), 1),
        "unit": "sec",
        "runs": 1,
        "excluded": {
            "d03b_dedup_lsh_prebuilt": "band-bucket pair mining did not "
                "complete a 50-min box at sf100 in this sandbox (index "
                "build itself completed, 3.5 GB); known cost cliff to "
                "characterize next round",
            "d05b_dedup_embedding_ivf": "declared n^1.5 sqrt-K law -> "
                "~31x of its 41 s sf10 time (~21 min) projected; "
                "measured and declared on the sf1->sf10 decade instead",
            "src10_xml_roundtrip": "the sf100 XML corpus write "
                "(~30+ GB) exceeds the sandbox's free disk; format "
                "path measured at sf10 (ratio 4.1 r12)",
        },
        "note": ("production-path slice at sf100 (22 GB): scan slice "
                 "SPARK_GRAFT_WARM=0, index slice warm=builds, disk-"
                 "casualty queries re-run isolated after freeing the "
                 "27 GB src13 CDA corpus; ratios vs the same-session "
                 "sf10 leg (both RUNS=1)"),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out}: {len(q100)} queries, value={doc['value']}s, "
          f"superlinear={undeclared}, declared={declared}, "
          f"noisy={noisy}, failed={sorted(failed)}")
    if undeclared or failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
