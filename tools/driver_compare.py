#!/usr/bin/env python3
"""Mimic the driver's comparison more closely than compare_oracle.py:

- Spark result read via pandas.read_parquet (pyarrow) -> DECIMAL columns
  become Python Decimal objects ('123.40', scale-padded).
- Oracle via duckdb fetchdf -> DECIMAL columns become float64 ('123.4').
- Columns sorted by name, rows sorted by all columns, then cell VALUES
  compared via str() (a proxy for value-hashing): any representation
  difference (Decimal vs float, trailing zeros) fails, exactly like the
  driver's hash check.

Usage: driver_compare.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells(df):
    return [[str(v) for v in row] for row in df.itertuples(index=False)]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(glob.glob(f"{out_dir}/*/")):
        name = name.rstrip("/").split("/")[-1]
        try:
            got = pd.concat([pd.read_parquet(p) for p in
                             sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
                            ignore_index=True)
            got = canon(got)
            if name not in oracles:
                # rows-only check: canonicalization must not blow up
                print(f"PASS {name} (rows-only, {len(got)} rows)")
                n_pass += 1
                continue
            exp = canon(con.execute(oracles[name]).fetchdf())
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            ce, cg = cells(exp), cells(got)
            if ce != cg:
                bad = [(a, b) for a, b in zip(ce, cg) if a != b]
                print(f"FAIL {name}: {len(bad)} value-repr mismatches of {len(ce)} rows")
                for a, b in bad[:3]:
                    print(f"  exp={a}\n  got={b}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
