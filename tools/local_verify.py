#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/local_verify.py <outDir> <sfDir> [query ...]

Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
parquet tables in <sfDir>, and compares: row count, column names, and
values (rows sorted, columns sorted by name). Dev tool only — not part
of the shipped library.
"""
import sys, os, json, glob, time, functools
import duckdb
import pandas as pd

print = functools.partial(print, flush=True)  # progress visible when piped

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def dtype_drift(got: pd.DataFrame, exp: pd.DataFrame):
    """Columns whose physical types differ between Spark output and the
    DuckDB oracle (e.g. BIGINT vs HUGEINT→object). The driver's gate
    hashes type-sensitively, so this is a FAIL even when values match —
    exactly how q12 slipped through round 5's dtype-blind compare.
    """
    drift = []
    for c in sorted(set(got.columns) & set(exp.columns)):
        g, e = got[c].dtype, exp[c].dtype
        if g != e:
            drift.append(f"{c}: spark={g} oracle={e}")
    return drift

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows "
                  f"({'ok' if len(got) > 0 else 'EMPTY!'})")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        t0 = time.time()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        oracle_sec = time.time() - t0
        drift = dtype_drift(got, exp)
        if drift:
            print(f"FAIL {name}: dtype drift: " + "; ".join(drift))
            n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name}: {len(g)} rows (oracle {oracle_sec:.1f}s)")
            n_pass += 1
        except AssertionError as ex:
            msg = str(ex).splitlines()
            print(f"FAIL {name}: values differ: " + " | ".join(msg[:6]))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
