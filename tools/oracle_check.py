#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the engine's parquet dump, sort
columns by name, and compare values. Usage:
  python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize: round floats, stringify everything for stable compare
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == 'f':
            out[c] = s.astype('float64').round(9)
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    os.makedirs('/tmp/graft_duckdb_tmp', exist_ok=True)
    con.execute("SET temp_directory='/tmp/graft_duckdb_tmp'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        if not got.equals(want):
            diff = (got != want).any(axis=1)
            print(f"FAIL {name}: value mismatch, first diffs:")
            print(pd.concat([got[diff].head(3).add_prefix('got_'),
                             want[diff].head(3).add_prefix('want_')], axis=1))
            n_fail += 1; continue
        print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    # queries without oracle: rows-only check
    for d in sorted(glob.glob(f"{outdir}/q_*")):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {n}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
