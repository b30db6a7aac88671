#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/localgate.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sf parquet tables, sorts columns by name + rows by all columns, and
compares row counts, dtypes and values. Queries without oracle SQL get a
rows>0 check only.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    n_pass = n_fail = 0
    for name in names:
        if only and name not in only:
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                             ignore_index=True)
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {len(spark_df)})")
            n_pass += ok; n_fail += (not ok)
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name} oracle err: {e}")
            n_fail += 1
            continue
        s, o = norm(spark_df), norm(odf)
        problems = []
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        elif len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        else:
            for c in s.columns:
                # driver's gate accepts int32 vs int64; flag cross-kind only
                # (e.g. DuckDB HUGEINT -> float/object vs Spark int)
                if s[c].dtype.kind != o[c].dtype.kind:
                    problems.append(f"dtype[{c}] {s[c].dtype} vs {o[c].dtype}")
                elif s[c].dtype.kind == 'i':
                    s[c] = s[c].astype('int64'); o[c] = o[c].astype('int64')
            if not problems:
                neq = (s != o) & ~(s.isna() & o.isna())
                if neq.any().any():
                    bad = neq.any(axis=1)
                    problems.append(f"{int(bad.sum())} differing rows; first:\n"
                                    f"spark:\n{s[bad].head(3)}\noracle:\n{o[bad].head(3)}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
