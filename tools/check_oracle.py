#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only,names]

With a third argument (comma-separated query names), only those oracle
entries are compared — pairs with Verify's SPARK_GRAFT_ONLY filter for
local iteration on one query without the full dump.

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB with views over <sfDir>'s tables,
sorts columns by name, and value-compares row by row.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        unknown = names - set(oracle)
        if unknown:
            raise SystemExit(f"unknown query names: {sorted(unknown)}")
        oracle = {n: s for n, s in oracle.items() if n in names}
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
            etypes = dict(r[:2] for r in con.execute(f"DESCRIBE {sql}").fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            gtypes = dict(r[:2] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall())
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failed.append(name)
            continue
        # The driver's hasher folds the DECLARED column type (e.g. decimal
        # precision), not just values — round 2 failed on sum() width
        # inference. Compare declared types the same way.
        tmism = {c: (gtypes.get(c), etypes.get(c)) for c in etypes
                 if gtypes.get(c) != etypes.get(c)}
        if tmism:
            print(f"FAIL {name}: declared types differ (spark, oracle): {tmism}")
            failed.append(name)
            continue
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failed.append(name)
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failed.append(name)
            continue
        erows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        grows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(erows, grows)) if a != b]
        if mism:
            i, a, b = mism[0]
            print(f"FAIL {name}: {len(mism)}/{len(erows)} rows differ; first @{i}:")
            print(f"  oracle: {a}")
            print(f"  spark : {b}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(erows)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
