#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/local_verify.py <sfdir> <verify_outdir> [query ...]

Reads <verify_outdir>/<name>/ parquet dumps (written by `sbt "runMain
graft.Verify <sfdir> <verify_outdir>"`) and <verify_outdir>/oracle_sql.json,
runs each oracle against DuckDB views named after the testdata tables, and
compares values with columns sorted by name (like the driver) and rows in
produced order.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cmp_frames(a: pd.DataFrame, b: pd.DataFrame):
    """a=spark, b=duckdb. Returns (ok, msg)."""
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return False, f"row count differs: spark={len(a)} duck={len(b)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
                aa = av.astype(float).to_numpy()
                bb = bv.astype(float).to_numpy()
                eq = (aa == bb) | (np.isnan(aa) & np.isnan(bb))
            else:
                eq = (av.astype(str).to_numpy() == bv.astype(str).to_numpy())
        except Exception as e:
            return False, f"col {c}: compare error {e}"
        if not eq.all():
            i = int(np.argmax(~eq))
            return False, (f"col {c}: {int((~eq).sum())}/{len(eq)} mismatches; "
                           f"first at row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    return True, "ok"

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    verify_errs = {}
    if os.path.exists(f"{outdir}/verify_errors.json"):
        with open(f"{outdir}/verify_errors.json") as f:
            verify_errs = json.load(f)
    # Iterate the UNION of dumped dirs and known oracle names: a query that
    # crashed in Verify (no dir) must FAIL here, not silently vanish
    # (round-7 driver run dropped 11 crashed queries this way).
    dirs = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
    n_ok = n_fail = 0
    for name in sorted(dirs | set(oracles)):
        d = os.path.join(outdir, name)
        if only and name not in only:
            continue
        if name in verify_errs:
            print(f"FAIL {name}: verify crashed: {verify_errs[name][:200]}")
            n_fail += 1
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows={len(spark_df)})")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        ok, msg = cmp_frames(spark_df, duck_df)
        print(("OK  " if ok else "FAIL") + f" {name}: {msg} (rows={len(spark_df)})")
        n_ok += ok
        n_fail += not ok
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
