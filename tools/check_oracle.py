#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's t2 gate: for each query parquet
written by graft.Verify, run the corresponding oracle SQL in DuckDB over the
same testdata tables and compare rows/schema/values exactly.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Not part of the shipped engine — uses the driver-side python stack.)
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        # driver semantics: sort columns by name, then hash values
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = list(exp[c]), list(got[c])
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        if a != b:
                            bad = (c, i, a, b, abs(a - b))
                            break
                    elif str(a) != str(b):
                        bad = (c, i, a, b, None)
                        break
                except Exception as e:
                    bad = (c, i, a, b, f"cmp err {e}")
                    break
            if bad:
                break
        if bad:
            c, i, a, b, d = bad
            print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r} diff={d}")
            n_bad += 1
        else:
            print(f"ok   {name}: {len(exp)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
