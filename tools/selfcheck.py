#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <outDir> <sfDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB over the <sfDir>
parquet tables, and compares: columns sorted by name, rows sorted by all
columns, exact match for non-floats, 1e-9 tolerance flagged for floats
(exact mismatches reported either way so we can chase determinism).

Dev tooling only — not part of the Scala library.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists -> tuples so they sort/compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    # sort on rounded float keys: a sub-1e-9 float diff on a sort-key column
    # must not misalign rows (which would show as spurious diffs elsewhere)
    keys = [
        (df[c].round(9) if df[c].dtype.kind == "f" else df[c]).rename(f"__k_{c}")
        for c in df.columns
    ]
    order = pd.concat(keys, axis=1).sort_values(
        by=[k.name for k in keys], kind="mergesort").index
    return df.loc[order].reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        # _SUCCESS gate: a per-task committer interrupted by Verify's query
        # timeout can leave committed part files with no _SUCCESS marker —
        # partial rows must fail, not verify
        if not os.path.exists(f"{out_dir}/{name}/_SUCCESS"):
            print(f"FAIL {name}: incomplete output (no _SUCCESS)")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = normalize(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            exp = normalize(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            g, e = got[c], exp[c]
            # the driver's hash is over rendered values, so a float/int kind
            # mismatch (e.g. DuckDB HUGEINT -> float64 "1236.0" vs Spark int64
            # "1236") fails its gate even when every value is equal — catch it
            # here instead of in CORRECTNESS_r{N}
            if g.dtype.kind != e.dtype.kind and {g.dtype.kind, e.dtype.kind} != {"i", "u"}:
                bad.append((c, -1, f"dtype kind {g.dtype}!={e.dtype}"))
                continue
            if np.issubdtype(g.dtype, np.floating) or np.issubdtype(e.dtype, np.floating):
                ga = g.astype(float).to_numpy()
                ea = e.astype(float).to_numpy()
                both_nan = np.isnan(ga) & np.isnan(ea)
                close = np.isclose(ga, ea, rtol=0, atol=1e-9) | both_nan
                exact = (ga == ea) | both_nan
                if not close.all():
                    bad.append((c, int((~close).sum()), "float"))
                elif not exact.all():
                    print(f"  warn {name}.{c}: {int((~exact).sum())} rows differ within 1e-9 (would fail exact hash)")
            else:
                eq = (g.isna() & e.isna()) | (g == e)
                if not eq.all():
                    bad.append((c, int((~eq).sum()), str(g.dtype)))
        if bad:
            print(f"FAIL {name}: mismatched cols {bad}")
            for c, _, _ in bad[:2]:
                mism = got[c] != exp[c]
                print(f"  {c} got: {got[c][mism].head(3).tolist()} exp: {exp[c][mism].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    for name in sorted(set(os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)) - set(oracle)):
        print(f"SKIP {name}: no oracle (rows-only)")
        n_skip += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
