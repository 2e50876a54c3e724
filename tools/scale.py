#!/usr/bin/env python3
"""Deterministic scale-factor multiplier for the graft test tables.

Replicates the FACT tables (orders, lineitem, documents, embeddings, events)
K times with disjoint key offsets and copies the dimension tables unchanged,
so every DuckDB oracle in SparkEntry.oracleSql stays computable over the
scaled directory: foreign keys stay valid (replica r of lineitem references
replica r of orders via the same offset; dim keys are untouched) and all
content is a pure deterministic function of the source data.

Document text is salted per replica (" r<k>" suffix, n_chars adjusted) so
the scaled corpus exercises NEAR-duplicate detection across replicas rather
than degenerating into exact copies; embeddings replicate verbatim, which
stresses the LSH/dup paths with genuine duplicate clusters.

Usage:
  python3 tools/scale.py [src_dir] [dst_dir] [factor]
  # defaults: /root/testdata/sf0.1 /tmp/graft_sf1 10

Dev tooling only (driver-side python); the Scala library does not depend
on it.
"""
import shutil
import sys
from pathlib import Path

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

DIMS = ["region", "nation", "customer", "supplier", "part"]

# fact table -> (key offset per replica, replicated-key columns)
OFFSETS = {
    "orders": (1_000_000, ["o_orderkey"]),
    "lineitem": (1_000_000, ["l_orderkey"]),  # same offset: FK to orders
    "documents": (100_000, ["doc_id"]),
    "embeddings": (100_000, ["vec_id"]),
    "events": (1_000_000, ["event_id"]),
}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional 5th arg: comma list of FACT tables to scale (dims always
    # copied) — for single-query scale probes (e.g. sf10) where scaling the
    # full document/embedding corpus would be pure waste
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    for t, (off, keycols) in OFFSETS.items():
        if only is not None and t not in only:
            continue
        cols = [r[0] for r in
                con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keycols:
                sel.append(f"{c} + r * {off} AS {c}")
            elif t == "documents" and c == "text":
                # replica texts must be DISTINCT documents, not near-dups of
                # the original: suffixing every word breaks shingle overlap
                # across replicas, so the dup/near-dup pair structure scales
                # LINEARLY (each replica reproduces the original's clusters
                # at its own ids). A whole-text suffix would instead make
                # every doc a 10-clone near-dup cluster — quadratic pair
                # blowup in both engines.
                sel.append(r"CASE WHEN r = 0 THEN text "
                           r"ELSE regexp_replace(text, '(\S+)', '\1' || r, 'g') "
                           r"END AS text")
            elif t == "documents" and c == "n_chars":
                # recomputed below once text is final (n_chars == length(text))
                sel.append("n_chars")
            else:
                sel.append(c)
        q = (f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet', "
             f"range({factor}) s(r) ORDER BY r, {keycols[0]}")
        if t == "documents":  # keep the n_chars == length(text) invariant
            q = f"SELECT * REPLACE (length(text) AS n_chars) FROM ({q})"
        con.execute(f"COPY ({q}) TO '{dst}/{t}.parquet'")
        # cast back to the SOURCE physical schema: DuckDB normalizes
        # timestamps to micros, but readers key on the original types
        # (e.g. events.ts is TIMESTAMP(NANOS) and Spark sessions read it
        # via nanosAsLong) — the scaled table must be type-identical
        src_schema = pq.read_schema(f"{src}/{t}.parquet")
        tbl = pq.read_table(f"{dst}/{t}.parquet")
        want = pa.schema([src_schema.field(f.name) for f in tbl.schema])
        if tbl.schema != want:
            tbl = tbl.cast(want)
            pq.write_table(tbl, f"{dst}/{t}.parquet")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows (x{factor})")


if __name__ == "__main__":
    main()
