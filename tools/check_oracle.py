#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables and diff.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver SFs are single files; ReplicaGen dirs are spark-written
        # directories of part files — read either layout
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        # dtype-strict: the driver's gate hashes typed values, so a HUGEINT
        # oracle column vs a BIGINT spark column must fail here too even
        # though pandas `==` would coerce them equal (VERDICT r1 item 2).
        dt_mism = [
            (c, str(g[c].dtype), str(w[c].dtype))
            for c in g.columns if g[c].dtype != w[c].dtype
        ]
        if dt_mism:
            c, gd, wd = dt_mism[0]
            print(f"FAIL {name}: {len(dt_mism)} col(s) dtype-differ; first: "
                  f"col={c} spark={gd} oracle={wd}")
            n_fail += 1
            continue
        mism = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                mism.append((c, idx, a[idx], b[idx]))
        if mism:
            c, i, av, bv = mism[0]
            print(f"FAIL {name}: {len(mism)} col(s) differ; first: "
                  f"col={c} row={i} spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
