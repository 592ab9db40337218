#!/usr/bin/env python3
"""Dtype parity audit — catches what check_oracle.py can't.

The driver's hash compare is pandas-DTYPE-sensitive: DuckDB sum(BIGINT)
returns HUGEINT, which pandas materializes as float64/object, while the
Spark parquet carries int64 — values equal, hashes differ (the r9
g12_modularity failure mode). check_oracle.py compares VALUES (Python
1 == 1.0), so it passes on exactly this bug class.

Usage: check_dtypes.py <sfDir> <verifyOutDir>

For each oracle, loads the Spark parquet and the DuckDB result both as
pandas DataFrames and reports any column whose dtype differs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

fails = 0
for d in sorted(glob.glob(os.path.join(out, "*"))):
    name = os.path.basename(d)
    if not os.path.isdir(d) or name not in oracles:
        continue
    sp = pd.read_parquet(d)
    try:
        od = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    bad = []
    for c in sp.columns:
        if c not in od.columns:
            continue  # schema mismatch is check_oracle's job
        sd, dd = str(sp[c].dtype), str(od[c].dtype)
        # empty object columns and tz-aware vs naive timestamps are
        # hash-equivalent after the driver's str() canonicalization of
        # non-numeric cells; numeric dtype divergence is the real risk
        if sd != dd and not (sp.empty or od.empty):
            num = {"int8","int16","int32","int64","uint8","uint16",
                   "uint32","uint64","float32","float64"}
            if sd in num or dd in num:
                bad.append((c, sd, dd))
    if bad:
        print(f"{name}: DTYPE MISMATCH {bad}")
        fails += 1
print(f"[dtype-audit] {fails} mismatching queries" if fails
      else "[dtype-audit] clean")
sys.exit(1 if fails else 0)
