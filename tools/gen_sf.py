#!/usr/bin/env python3
"""Generate synthetic testdata at an arbitrary scale factor.

The driver ships sf0.001/sf0.01/sf0.1 only (TESTDATA.md); this tool extends
the same deterministic star schema to larger SFs (sf1 = 10x the largest
shipped) so the gate + bench can produce measured scale evidence instead of
plan asserts alone. Distributions are reverse-engineered from the shipped
parquet (row-count ratios, value ranges, category frequencies, the planted
exact/near-duplicate structure in `documents`, unit-norm 64-dim embeddings)
so every operator sees the same workload shape, just bigger. Seeded --
identical output for identical (sf, seed).

Usage: python3 tools/gen_sf.py <sf> <outDir> [seed]
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = sys.argv[2]
SEED = int(sys.argv[3]) if len(sys.argv) > 3 else 42
# --zipf (optional 5th token or anywhere): skew join/group keys with a
# Zipf(1.5) popularity law instead of uniform — the skew-resilience leg.
# lineitem.l_suppkey and events.user_id become hot-key columns where the
# top key holds a double-digit percent of all rows (what a hot hospital
# site / hot user looks like at 100 TB); everything else is identical,
# so the same queries run on both variants and only the key distribution
# differs.
ZIPF = "--zipf" in sys.argv

def zipf_keys(n_rows, n_keys):
    """Zipf(1.5) ranks mapped onto a deterministic key permutation, so
    hot keys are scattered over the id domain (not key 0..k)."""
    r = rng.zipf(1.5, n_rows)
    r = np.minimum(r, n_keys) - 1  # ranks 0..n_keys-1
    perm = np.random.default_rng(SEED + 7).permutation(n_keys)
    return perm[r].astype(np.int64)
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(SEED)

N_CUST = int(150_000 * SF)
N_SUPP = int(10_000 * SF)
N_PART = int(200_000 * SF)
N_ORD = int(1_500_000 * SF)
N_LI = int(6_000_000 * SF)
N_EV = int(1_000_000 * SF)
N_USER = int(15_000 * SF)
N_DOC = int(50_000 * SF)
N_EMB = int(20_000 * SF)

DAY_US = 86_400_000_000

def write(name, cols):
    t = pa.table(cols)
    # Bound row groups so a Spark scan of the single file gets real
    # parallelism: a parquet split is processed only by the task holding
    # the row-group START, so one giant row group = one task for the
    # whole table (found at sf10: documents was 1 rg / 264 MB -> every
    # text query ran single-task). Target >=32 groups, floor 16k rows.
    rg = max(16_384, min(1 << 20, t.num_rows // 32 or 1))
    pq.write_table(t, f"{OUT}/{name}.parquet", row_group_size=rg)
    print(f"{name:12s} {t.num_rows:>10,d} rows  {os.path.getsize(f'{OUT}/{name}.parquet')/1e6:8.1f} MB")

def days_us(start_day, n_days, n):
    """Uniform random midnight timestamps (us) over n_days from start_day (epoch days)."""
    d = rng.integers(0, n_days, n)
    return ((start_day + d) * DAY_US).astype("int64")

def ts_col(us):
    return pa.array(us, type=pa.timestamp("us"))

EPOCH_1995 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
EPOCH_2024 = (np.datetime64("2024-01-01") - np.datetime64("1970-01-01")).astype(int)

# --- region / nation (fixed) ---
write("region", {
    "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
})
write("nation", {
    "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
    "n_name": [f"NATION_{i}" for i in range(25)],
    "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
})

# --- customer ---
write("customer", {
    "c_custkey": np.arange(N_CUST, dtype=np.int64),
    "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
    "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
    "c_mktsegment": np.array(["HOUSEHOLD", "FURNITURE", "BUILDING", "MACHINERY",
                              "AUTOMOBILE"])[rng.integers(0, 5, N_CUST)],
})

# --- supplier ---
write("supplier", {
    "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
    "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
    "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
})

# --- part ---
ADJ = np.array(["blue", "cold", "hot", "large", "new", "old", "red", "small"])
NOUN = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"])
pn_a = ADJ[rng.integers(0, 8, N_PART)]
pn_n = NOUN[rng.integers(0, 8, N_PART)]
write("part", {
    "p_partkey": np.arange(N_PART, dtype=np.int64),
    "p_name": np.char.add(np.char.add(pn_a, " "), pn_n),
    "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[rng.integers(0, 25, N_PART)],
    "p_type": np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
                        "STANDARD"])[rng.integers(0, 6, N_PART)],
    "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
    "p_retailprice": np.round(rng.uniform(900, 1000, N_PART), 2),
})

# --- orders (dates: 1995-01-01 .. 2001-08-01, day granularity) ---
write("orders", {
    "o_orderkey": np.arange(N_ORD, dtype=np.int64),
    "o_custkey": rng.integers(0, N_CUST, N_ORD).astype(np.int64),
    "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
    "o_orderdate": ts_col(days_us(EPOCH_1995, 2405, N_ORD)),
    "o_orderpriority": np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW",
                                 "4-NOT SPECIFIED"])[rng.integers(0, 5, N_ORD)],
})

# --- lineitem (fks drawn independently; per-order count ~ Poisson(4)) ---
write("lineitem", {
    "l_orderkey": rng.integers(0, N_ORD, N_LI).astype(np.int64),
    "l_partkey": rng.integers(0, N_PART, N_LI).astype(np.int64),
    "l_suppkey": zipf_keys(N_LI, N_SUPP) if ZIPF
        else rng.integers(0, N_SUPP, N_LI).astype(np.int64),
    "l_linenumber": rng.integers(1, 8, N_LI).astype(np.int32),
    "l_quantity": rng.integers(1, 51, N_LI).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, N_LI), 2),
    "l_discount": np.round(rng.integers(0, 11, N_LI) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, N_LI) / 100.0, 2),
    "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)],
    "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, N_LI)],
    "l_shipdate": ts_col(days_us(EPOCH_1995 + 1, 2499, N_LI)),
})

# --- events (Jan 2024, value ~ Exp(mean 50)) ---
ev_ts = (EPOCH_2024 * DAY_US + rng.integers(0, 31 * DAY_US, N_EV)).astype("int64")
write("events", {
    "event_id": np.arange(N_EV, dtype=np.int64),
    "ts": ts_col(ev_ts),
    "user_id": zipf_keys(N_EV, N_USER) if ZIPF
        else rng.integers(0, N_USER, N_EV).astype(np.int64),
    "event_type": np.array(["view", "click", "purchase", "signup",
                            "error"])[rng.integers(0, 5, N_EV)],
    "value": np.round(rng.exponential(50.0, N_EV), 2),
    "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, N_EV)],
})

# --- documents (vocab, 10..100 words; planted exact + near dups) ---
# The driver's fixed 31-word vocabulary saturates above its own largest
# SF: at sf1 every possible word-trigram occurs in ~90 documents, so a
# document-frequency-capped near-dup index (correctly) treats ALL
# shingles as stop-shingles and the workload degenerates. Real corpora
# grow vocabulary with size (Heaps' law, ~sqrt exponent); extend the
# vocab the same way for SF > 0.1 so shingle statistics at sf1 match
# the shipped SFs' shape. At sf <= 0.1 the vocab is exactly the
# driver's 31 words.
BASE_VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data",
              "dup", "fast", "filter", "group", "hash", "join", "key",
              "line", "merge", "order", "part", "query", "row", "scan",
              "slow", "small", "sort", "spark", "stream", "table", "the",
              "value", "vector", "window"]
n_vocab = max(31, round(31 * (SF / 0.1) ** 0.5))
compounds = [a + b for a in BASE_VOCAB for b in BASE_VOCAB
             if a not in ("a", "the") and b not in ("a", "the")]
VOCAB = np.array(BASE_VOCAB + compounds[:n_vocab - 31])
LANGS = np.array(["en", "de", "zh", "fr", "es"])
texts = []
for i in range(N_DOC):
    r = rng.random()
    if i > 10 and r < 0.0035:           # exact duplicate of an earlier doc
        texts.append(texts[rng.integers(0, i)])
    elif i > 10 and r < 0.055:          # near duplicate: one word ins/del
        w = texts[rng.integers(0, i)].split()
        pos = int(rng.integers(8, max(9, len(w))))
        if rng.random() < 0.5 and len(w) > 10:
            del w[pos % len(w)]
        else:
            w.insert(pos % (len(w) + 1), str(VOCAB[rng.integers(0, len(VOCAB))]))
        texts.append(" ".join(w))
    else:
        n = int(rng.integers(10, 101))
        texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB), n)]))
write("documents", {
    "doc_id": np.arange(N_DOC, dtype=np.int64),
    "text": texts,
    "lang": LANGS[rng.choice(5, N_DOC, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])],
    "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, N_DOC)],
    "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
})

# --- embeddings (unit-norm 64-dim float32, label 0..9) ---
V = rng.standard_normal((N_EMB, 64)).astype(np.float32)
V /= np.linalg.norm(V, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": np.arange(N_EMB, dtype=np.int64),
    "embedding": pa.array(list(V), type=pa.list_(pa.float32())),
    "label": rng.integers(0, 10, N_EMB).astype(np.int32),
})
print("done", OUT)
