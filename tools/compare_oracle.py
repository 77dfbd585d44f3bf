#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Reads oracle_sql.json, runs each oracle in DuckDB against the sfDir parquet
tables, reads the Spark-written parquet from verifyOutDir, canonicalizes
both (columns sorted by name, rows sorted by all columns), and compares
values exactly. Mirrors (a strict superset of) what the driver checks.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            exp, got = canon(exp), canon(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1
                continue
            if [str(t) for t in exp.dtypes] != [str(t) for t in got.dtypes]:
                print(f"WARN {name}: dtypes exp={list(map(str, exp.dtypes))} got={list(map(str, got.dtypes))}")
            if len(exp) != len(got):
                print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
                n_fail += 1
                continue
            if not exp.equals(got):
                neq = (exp != got) & ~(exp.isna() & got.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {bad.sum()} mismatched rows of {len(exp)}")
                print("  expected:", exp[bad].head(3).to_dict("records"))
                print("  got     :", got[bad].head(3).to_dict("records"))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
