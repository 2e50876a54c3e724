#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage:
  python3 tools/check.py [sf_dir] [out_dir] [--run] [--timeout=SECONDS]
  # --run = invoke sbt Verify first
  # --timeout — per-ORACLE wall-clock cap; an oracle that exceeds it records
  #   SKIP, not FAIL. Used for large scaled datasets (tools/scale.py) where
  #   a handful of DuckDB oracles are intrinsically quadratic (exact
  #   all-pairs similarity) even though the engine-side plan is sub-
  #   quadratic; those queries stay fully verified at the smaller SFs.

Reads each <out_dir>/<name> parquet (Spark result), runs the matching SQL from
<out_dir>/oracle_sql.json in DuckDB over views of the sf_dir parquet tables,
and compares: column names (sorted), row count, and exact values (rows sorted).
Dev tooling only — the shipped Scala library does not depend on this.
"""
import json, math, subprocess, sys, threading
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr() of float is the shortest round-trip form in py3
        return repr(v)
    return str(v)


def frame_key(con, rel):
    """Return (colnames_sorted, rowcount, sorted list of row tuples as strings)."""
    df = rel.fetchdf()
    cols = sorted(df.columns.tolist())
    df = df[cols]
    rows = sorted(tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, len(rows), rows


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/graft_verify"
    if "--run" in sys.argv:
        r = subprocess.run(["sbt", f'runMain graft.Verify {sf_dir} {out_dir}'],
                           cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-3000:]); print(r.stderr[-3000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    timeout = None
    for a in sys.argv[1:]:
        if a.startswith("--timeout="):
            timeout = float(a.split("=", 1)[1])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        pq = Path(out_dir) / name
        if not pq.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = frame_key(con, con.sql(f"SELECT * FROM '{pq}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        timer = threading.Timer(timeout, con.interrupt) if timeout else None
        try:
            if timer:
                timer.start()
            exp = frame_key(con, con.sql(sql))
        except KeyboardInterrupt:
            print(f"SKIP {name}: oracle exceeded {timeout}s"); n_skip += 1; continue
        except duckdb.InterruptException:
            print(f"SKIP {name}: oracle exceeded {timeout}s"); n_skip += 1; continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        finally:
            if timer:
                timer.cancel()
        if got[0] != exp[0]:
            print(f"FAIL {name}: columns {got[0]} != {exp[0]}"); n_fail += 1; continue
        if got[1] != exp[1]:
            print(f"FAIL {name}: rows {got[1]} != {exp[1]}"); n_fail += 1; continue
        if got[2] != exp[2]:
            bad = next(i for i, (a, b) in enumerate(zip(got[2], exp[2])) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  spark : {got[2][bad]}")
            print(f"  duckdb: {exp[2][bad]}")
            n_fail += 1; continue
        print(f"PASS {name} ({got[1]} rows)"); n_pass += 1
    skip = f", {n_skip} skipped (oracle timeout)" if n_skip else ""
    print(f"\n{n_pass} passed, {n_fail} failed{skip}")
    if n_skip:
        print("skipped oracles can be closed with tools/staged_oracle.py "
              "(temp-table staging sidesteps DuckDB's one-statement planner)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
