#!/usr/bin/env python3
"""Local correctness loop (mimics the driver's DuckDB-oracle compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
For each query result parquet in outDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), sorts columns by
name and rows by all columns, and compares values.
Driver-side tooling only — not part of the library.
"""
import json, sys, math
import duckdb

def canon(df):
    # sort columns by name, then rows by all columns
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_vals(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def main():
    sf, out = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    ok = fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
                fail += 1; continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
                fail += 1; continue
            # dtype-kind strictness: the driver hashes typed values, so an
            # int64 col vs float64 col mismatches even when 3 == 3.0 here.
            kinds_bad = [(c, g[c].dtype, e[c].dtype) for c in g.columns
                         if g[c].dtype.kind != e[c].dtype.kind]
            if kinds_bad:
                print(f"FAIL {name}: dtype kinds {kinds_bad}")
                fail += 1; continue
            bad = None
            for c in g.columns:
                gv, ev = g[c].tolist(), e[c].tolist()
                for i, (x, y) in enumerate(zip(gv, ev)):
                    if not cmp_vals(x, y):
                        bad = (c, i, x, y); break
                if bad: break
            if bad:
                print(f"FAIL {name}: col={bad[0]} row={bad[1]} got={bad[2]!r} exp={bad[3]!r}")
                fail += 1
            else:
                print(f"OK   {name} ({len(g)} rows)")
                ok += 1
        except Exception as ex:
            print(f"ERR  {name}: {ex}")
            fail += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
