#!/usr/bin/env python3
"""Dev-only parity checker mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py <sf_dir> <verify_out_dir>

Loads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB with
views over <sf_dir>/*.parquet, and compares: columns sorted by name, rows
sorted, values hashed. NOT part of the shipped library (driver-side
python per the environment contract).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "item"):
        v = v.item()
        if isinstance(v, float):
            return round(v, 9)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # Declared = every oracle key plus every produced output dir: a query
    # that Verify declared but failed to produce (or marked _ERROR) is a
    # FAILURE, not a silent skip — r4's red family shipped invisibly
    # because missing outputs were simply not iterated.
    produced = {n for n in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(set(oracle) | produced):
        d = os.path.join(out_dir, name)
        if name not in produced:
            print(f"✗ {name}: DECLARED BUT MISSING (no Verify output)")
            n_bad += 1
            continue
        if os.path.exists(os.path.join(d, "_ERROR")):
            head = open(os.path.join(d, "_ERROR")).read().splitlines()[:1]
            print(f"✗ {name}: VERIFY ERROR: {head[0] if head else ''}")
            n_bad += 1
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"✗ {name}: column mismatch spark={list(g.columns)} duck={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"✗ {name}: row count spark={len(g)} duck={len(e)}")
            n_bad += 1
            continue
        gv = [[norm(v) for v in row] for row in g.itertuples(index=False)]
        ev = [[norm(v) for v in row] for row in e.itertuples(index=False)]
        if gv != ev:
            print(f"✗ {name}: VALUE mismatch")
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b:
                    print(f"    row {i}: spark={a}")
                    print(f"           duck ={b}")
                    if i > 5:
                        break
            n_bad += 1
        else:
            print(f"✓ {name}: {len(g)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
