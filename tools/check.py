#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet result, runs the matching SQL from
<verifyOutDir>/oracle_sql.json in DuckDB (tables = views over <sfDir>), and
compares: column names (sorted), dtypes loosely, and values exactly
(rows compared in result order; arrays compared element-wise).
"""
import sys, json, glob
import duckdb

def canon(df):
    # sort columns by name, like the driver
    return df[sorted(df.columns)]

def cell_eq(a, b):
    import math
    import numpy as np
    if isinstance(a, np.ndarray):
        a = a.tolist()
    if isinstance(b, np.ndarray):
        b = b.tolist()
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a = list(a) if a is not None else None
        b = list(b) if b is not None else None
        if a is None or b is None or len(a) != len(b):
            return False
        return all(cell_eq(x, y) for x, y in zip(a, b))
    # numpy scalars vs python
    try:
        return a == b
    except Exception:
        return str(a) == str(b)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        try:
            mine = canon(con.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        probs = []
        if list(mine.columns) != list(want.columns):
            probs.append(f"cols {list(mine.columns)} != {list(want.columns)}")
        elif len(mine) != len(want):
            probs.append(f"rows {len(mine)} != {len(want)}")
        else:
            if list(map(str, mine.dtypes)) != list(map(str, want.dtypes)):
                probs.append(
                    f"dtypes {list(map(str, mine.dtypes))} != "
                    f"{list(map(str, want.dtypes))}")
            mv, wv = mine.values.tolist(), want.values.tolist()
            bad = [i for i, (r1, r2) in enumerate(zip(mv, wv))
                   if not all(cell_eq(a, b) for a, b in zip(r1, r2))]
            if bad:
                i = bad[0]
                probs.append(f"{len(bad)} rows differ; first row {i}: "
                             f"{mv[i]} != {wv[i]}")
        if probs:
            print(f"FAIL {name}: " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
