#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run DuckDB oracle SQL
against the sf parquet tables and diff against Verify.scala's parquet
dumps (sorted columns, sorted rows, exact values)."""
import duckdb, json, math, sys, os, glob

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v
def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], sorted(data, key=lambda r: tuple(str(x) for x in r))

fails = 0
for name in sorted(oracle):
    res_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not res_glob:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        scols, srows = rows_of(con.execute(
            f"SELECT * FROM read_parquet('{os.path.join(out_dir,name)}/*.parquet')"))
        ocols, orows = rows_of(con.execute(oracle[name]))
    except Exception as e:
        print(f"FAIL {name}: exec error {e}"); fails += 1; continue
    if [c.lower() for c in scols] != [c.lower() for c in ocols]:
        print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); fails += 1; continue
    if len(srows) != len(orows):
        print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}"); fails += 1; continue
    bad = [(i,a,b) for i,(a,b) in enumerate(zip(srows,orows)) if a != b]
    if bad:
        i,a,b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
        fails += 1
    else:
        print(f"ok   {name} ({len(srows)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
