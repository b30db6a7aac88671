#!/bin/bash
# sf100 production-path slice leg (r13): the prebuilt-index serving slice
# (warm pass = the index builds) plus the top core queries by sf10 cost
# (scan-dominated -> warm pass skipped, SPARK_GRAFT_WARM=0). Ratios are
# computed offline against the same-session sf10 leg by
# tools/merge_sf100.py (both RUNS=1, same machine, same classes).
set -e
CLS=${1:-/tmp/benchcls2}
SF100=${2:-/tmp/sf100}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# src10 stays excluded at sf100 (the XML corpus write alone is ~30+ GB —
# over this sandbox's headroom with the 22 GB dataset + 27 GB CDA corpus
# resident); src13 runs as its OWN leg so its corpus can be freed before
# the next leg instead of compounding into a disk casualty.
INDEX_SLICE='^(s02b|s03b|s04b|s12b|s15b|d03b|d05b_|s11_|s13_|s14_|d08b)'
SCAN_SLICE='^(m04_|m07_|d08_d|q29_|q32_|q28_|d02_|t17_|t21_|st05_|p05_|t16_|d13_|d14_|d04_d|d07_|q41_|c52_|c14c)'
SRC13_SLICE='^src13'

run_leg() { # name sfdir only warm out
  SPARK_GRAFT_SF_DIR=$2 SPARK_GRAFT_SF2_DIR= SPARK_GRAFT_RUNS=1 \
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY=$3 SPARK_GRAFT_WARM=$4 \
  GRAFT_SCRATCH=/tmp/scratch_$1 \
  java -Xmx96g $OPENS -cp "$CLS:/opt/spark/jars/*" graft.Bench \
    > $5 2>${5%.out}.err
}

echo "[slice] index slice at sf100 (warm = builds)"
run_leg sf100 $SF100 "$INDEX_SLICE" 1 /tmp/sf100_index.out
echo "[slice] scan slice at sf100 (no warm)"
run_leg sf100 $SF100 "$SCAN_SLICE" 0 /tmp/sf100_scan.out
echo "[slice] src13 leg at sf100 (own leg: its CDA corpus is ~27 GB, freed after)"
run_leg sf100 $SF100 "$SRC13_SLICE" 0 /tmp/sf100_src13.out
rm -rf /tmp/scratch_sf100/src13_cda 2>/dev/null || true
echo "[slice] done"
