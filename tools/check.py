#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ spark parquet result, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB over the same
sfDir parquet tables, and compares (columns sorted by name, rows sorted,
exact value equality). Mirrors what the driver does so we can de-risk
locally before the round snapshot.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        if list(map(str, got.dtypes)) != list(map(str, want.dtypes)):
            print(f"FAIL {name}: dtypes {dict(zip(got.columns, map(str, got.dtypes)))}"
                  f" != {dict(zip(want.columns, map(str, want.dtypes)))}")
            n_fail += 1
            continue
        eq = got.equals(want)
        if not eq:
            # locate first differing cell for debugging
            diff_msg = ""
            for c in got.columns:
                a, b = got[c], want[c]
                neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    diff_msg = f" col={c} row={i} got={a[i]!r} want={b[i]!r}"
                    break
            print(f"FAIL {name}: value mismatch{diff_msg}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
