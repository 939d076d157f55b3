#!/usr/bin/env python3
"""sf1 oracle gate for the heavy tail (VERDICT r10 item 8): ladders measure
TIME at sf1, but hash-correctness was only ever checked at sf0.01/sf0.1 —
this runs the DuckDB oracle over the sf1 replica tables and compares the
engine's sf1 dumps, exactly the driver's gate semantics (sorted columns,
rounded floats, full value equality).

Usage:
  # 1) generate the replicas (idempotent) and dump the engine results:
  SPARK_GRAFT_ONLY=none sbt -batch "runMain graft.ScaleLadder"   # replicas
  SPARK_GRAFT_ONLY=q_a,q_b sbt -batch \
      "runMain graft.Verify /root/repo/benchdata/sf1 /tmp/graft_verify_sf1"
  # 2) compare:
  python3 tools/sf1_oracle_gate.py /root/repo/benchdata/sf1 \
      /tmp/graft_verify_sf1 CORRECTNESS_SF1.json [timeout_s]

Replica caveats the query list must respect:
  - sf1 has lineitem/orders/part/events/documents/embeddings only (no
    customer/supplier/nation/region, no derivable partsupp);
  - quality-gated queries belong on the sf1q documents replica (the
    token-suffixed sf1 one breaks stopword statistics) — run them as a
    separate Verify+gate invocation pointing at sf1q.
Each oracle runs in its own subprocess with a timeout: a DuckDB plan that
cannot finish at 10x data is reported as 'oracle_timeout', never silently
skipped.
"""
import glob
import json
import multiprocessing as mp
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    import pandas as pd
    df = df[sorted(df.columns)]
    out = pd.DataFrame()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == 'f':
            out[c] = s.astype('float64').round(9)
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def run_oracle(sfdir, sql, q):
    """Child process: run one oracle SQL, put the canonical frame on q."""
    import duckdb
    con = duckdb.connect()
    os.makedirs('/tmp/graft_duckdb_tmp', exist_ok=True)
    con.execute("SET temp_directory='/tmp/graft_duckdb_tmp'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written replica: a directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    try:
        q.put(("ok", canon(con.execute(sql).fetchdf())))
    except Exception as e:  # noqa: BLE001 - report, don't crash the gate
        q.put(("error", str(e)[:500]))


def main(sfdir, outdir, artifact, timeout_s):
    import pandas as pd
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = {"status": "no_engine_output"}
            print(f"FAIL {name}: no engine output", flush=True)
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        q = mp.Queue()
        proc = mp.Process(target=run_oracle, args=(sfdir, sql, q))
        proc.start()
        # get() BEFORE join(): a child whose result frame exceeds the pipe
        # buffer blocks in put() until the parent reads — join-first
        # deadlocks every large-result query into a fake timeout
        try:
            status, want = q.get(timeout=timeout_s)
        except Exception:  # queue.Empty
            proc.terminate()
            proc.join()
            results[name] = {"status": "oracle_timeout", "timeout_s": timeout_s}
            print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s", flush=True)
            continue
        proc.join()
        if status == "error":
            results[name] = {"status": "oracle_error", "error": want}
            print(f"FAIL {name}: oracle error {want}", flush=True)
            continue
        if list(got.columns) != list(want.columns):
            results[name] = {"status": "schema_mismatch",
                             "got": list(got.columns), "want": list(want.columns)}
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}",
                  flush=True)
        elif len(got) != len(want):
            results[name] = {"status": "rows_mismatch",
                             "got": len(got), "want": len(want)}
            print(f"FAIL {name}: rows {len(got)} != {len(want)}", flush=True)
        elif not got.equals(want):
            results[name] = {"status": "value_mismatch", "rows": len(got)}
            print(f"FAIL {name}: value mismatch over {len(got)} rows", flush=True)
        else:
            results[name] = {"status": "pass", "rows": len(got)}
            print(f"PASS {name} ({len(got)} rows)", flush=True)
    n_pass = sum(1 for r in results.values() if r["status"] == "pass")
    summary = {"sf_dir": sfdir, "n_queries": len(results), "n_pass": n_pass,
               "timeout_s": timeout_s, "results": results}
    mode = "a" if os.path.exists(artifact) else "w"
    with open(artifact, mode) as f:
        f.write(json.dumps(summary) + "\n")
    print(f"\n{n_pass}/{len(results)} passed at {sfdir} -> {artifact}")
    return 0 if n_pass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else "CORRECTNESS_SF1.json",
                  int(sys.argv[4]) if len(sys.argv) > 4 else 600))
