#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
sfDir, loads the Spark result parquet from verifyOutDir/<name>/, sorts
columns by name, and compares values exactly (and with tolerance, to
separate real bugs from float noise).
"""
import duckdb
import glob
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if exp.shape != got.shape:
            print(f"FAIL {name}: shape exp={exp.shape} got={got.shape}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            ev, gv = exp[c].values, got[c].values
            for i in range(len(ev)):
                e, g = ev[i], gv[i]
                if isinstance(e, float) and isinstance(g, float):
                    if math.isnan(e) and math.isnan(g):
                        continue
                    if e != g:
                        tol = "tiny" if abs(e - g) <= 1e-9 * max(1, abs(e)) else "REAL"
                        bad.append(f"{c}[{i}]: exp={e!r} got={g!r} ({tol})")
                elif e != g:
                    bad.append(f"{c}[{i}]: exp={e!r} got={g!r}")
                if len(bad) >= 5:
                    break
            if len(bad) >= 5:
                break
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad))
            n_fail += 1
        else:
            print(f"PASS {name} ({exp.shape[0]} rows)")
            n_pass += 1
    # queries with no oracle: rows-only
    import os
    have = {d.split("/")[-1] for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
    for name in sorted(have - set(oracle)):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
