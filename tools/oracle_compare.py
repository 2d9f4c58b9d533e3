#!/usr/bin/env python3
"""Dev-side replay of the driver's DuckDB oracle comparison.

Usage: python3 tools/oracle_compare.py [verify_out_dir] [sf_dir]
Not part of the library — the engine is pure Scala/Spark; this mirrors the
driver's correctness gate so failures are caught before a round ends.
"""
import sys, json, duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vfy"
d = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

ok = bad = 0
for name, sql in sorted(json.load(open(f"{out}/oracle_sql.json")).items()):
    try:
        s = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        o = con.execute(sql).fetchdf()
        cols = sorted(s.columns)
        s2 = s[cols].sort_values(cols).reset_index(drop=True)
        o2 = o[sorted(o.columns)].sort_values(sorted(o.columns)).reset_index(drop=True)
        eq = s2.equals(o2)
        ok += eq
        bad += not eq
        print(name, len(s2), len(o2), "EXACT:", eq)
        if not eq:
            if list(s2.columns) != list(o2.columns):
                print("  cols:", list(s2.columns), "vs", list(o2.columns))
            elif len(s2) == len(o2):
                try:
                    print(s2.compare(o2).head(5))
                except Exception:
                    print("  dtypes:", s2.dtypes.to_dict(), o2.dtypes.to_dict())
    except Exception as e:
        bad += 1
        print(name, "ERR", str(e)[:300])
print(f"== {ok} ok, {bad} bad ==")
sys.exit(1 if bad else 0)
