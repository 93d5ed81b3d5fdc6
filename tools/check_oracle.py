#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Registers each testdata table as a DuckDB view, runs every oracle_sql.json
entry, and compares with the Spark parquet dump: same columns (by name),
same row count, and value-identical after sorting rows by all columns.
"""
import json, sys, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        ec = sorted(exp.columns); gc = sorted(got.columns)
        if ec != gc:
            print(f"FAIL {name}: columns {gc} != {ec}"); fail += 1; continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fail += 1; continue
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        g = got[ec].sort_values(ec).reset_index(drop=True)
        bad = None
        for c in ec:
            ev, gv = e[c].tolist(), g[c].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                eq = (a == b) or (a is None and b is None)
                try:
                    if not eq and isinstance(a, float) and isinstance(b, float):
                        eq = (math.isnan(a) and math.isnan(b)) or a == b
                except Exception:
                    pass
                if not eq and str(a) == str(b):
                    eq = True
                if not eq:
                    bad = (c, i, a, b); break
            if bad: break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i}: got {b!r} want {a!r}"); fail += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {ex}"); fail += 1
sys.exit(1 if fail else 0)
