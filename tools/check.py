#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: check.py <sfDir> <verifyOutDir>

Reads each <out>/<name> parquet result (Spark side), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, and compares schema + values row by row.

Mirrors the DRIVER's harness shape (learned the hard way in round 5):
the driver re-sorts both frames with pandas sort_values before hashing,
and a list/ndarray-typed cell is unhashable there — so this gate (a) does
the same pandas re-sort, failing exactly where the driver would, and
(b) rejects array-typed result columns outright, since the driver can
never adjudicate them even when a row-order compare would pass.
"""
import json, sys, glob, os
import duckdb
import numpy as np


def array_cols(df):
    """Columns whose cells are list/ndarray — unhashable for the driver."""
    bad = []
    for c in df.columns:
        if df[c].dtype == object:
            s = df[c].dropna()
            if len(s) and isinstance(s.iloc[0], (list, np.ndarray)):
                bad.append(c)
    return bad


def driver_sort(df):
    """The driver's pandas re-sort; raises like the driver on bad cells."""
    if len(df.columns) == 0:
        return df
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); n_noracle += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1; continue
        arr = array_cols(got) + [c for c in array_cols(exp) if c not in array_cols(got)]
        if arr:
            print(f"FAIL {name}: array-typed result column(s) {arr} — the "
                  f"driver's pandas sort_values cannot hash these; reshape "
                  f"to scalar rows (posexplode) or canonical strings")
            n_fail += 1; continue
        try:
            got = driver_sort(got)
            exp = driver_sort(exp)
        except Exception as ex:
            print(f"FAIL {name}: driver-style pandas re-sort crashed: {ex}")
            n_fail += 1; continue
        if got.dtypes.tolist() != exp.dtypes.tolist():
            print(f"WARN {name}: dtypes differ: "
                  f"{[(c, str(a), str(b)) for c, a, b in zip(got.columns, got.dtypes, exp.dtypes) if a != b]}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                an, bn = a.isna(), b.isna()
                if not (an == bn).all():
                    bad = (c, "null mismatch"); break
                av, bv = a[~an].to_numpy(dtype=float), b[~bn].to_numpy(dtype=float)
                if not (av == bv).all():
                    i = int((av != bv).argmax())
                    bad = (c, f"float mismatch at data-row {i}: {av[i]!r} != {bv[i]!r} "
                              f"(diff {abs(av[i]-bv[i]):.3e})")
                    break
            else:
                aa, bb = a.astype(str), b.astype(str)
                if not (aa == bb).all():
                    i = int((aa != bb).to_numpy().argmax())
                    bad = (c, f"mismatch at row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}")
                    break
        if bad:
            print(f"FAIL {name}: col {bad[0]}: {bad[1]}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        print(f"FAIL {m}: oracle declared but no spark result"); n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
