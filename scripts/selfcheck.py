#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for every query result parquet in <outDir>, executes the matching oracle SQL
from oracle_sql.json in DuckDB over the same sfDir tables and compares
row count, column names, and a row-order-insensitive value hash.

Usage: python3 scripts/selfcheck.py <sfDir> <outDir> [--skip a,b,...]

--skip excludes named queries from the replay. Exists for the generated
sf1 decade, where a few deliberately brute-force derived oracles (the
all-pairs shingle-Jaccard behind d2_minhash_recall) are O(n^2) in a
corpus that is now honestly 10x -- DuckDB needs hours for what the
engine's banded/blocked plans do in seconds, which is the point of
those plans. The driver's gate at sf0.01 always runs everything.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark writes directory-style parquet (e.g. the generated sf1
            # decade); DuckDB needs the part-file glob.
            src = f"'{p}/*.parquet'"
        elif os.path.exists(p):
            src = f"'{p}'"
        else:
            continue
        sel = "*"
        if t == "events":
            # The driver testdata stores ts as TIMESTAMP(NANOS); a generated
            # decade stores raw ns-longs (Spark cannot write nanos
            # timestamps). The engine truncates to micros on read
            # (Tables.events: ts div 1000) — mirror that when DuckDB sees
            # the BIGINT form so both engines agree on the same clock.
            typ = con.execute(
                f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0]
            if typ == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM {src}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            continue
        if name in skip:
            print(f"  SKIP {name} (--skip)")
            continue
        got = con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"  ROWS-ONLY {name}: rows={len(got)}")
            continue
        try:
            want = con.execute(oracle[name]).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"  FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        ok_cols = sorted(got_cols) == sorted(want_cols)
        ok_rows = len(got) == len(want)
        ok_hash = ok_cols and table_hash(got, got_cols) == table_hash(want, want_cols)
        if ok_cols and ok_rows and ok_hash:
            print(f"  PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            print(f"  FAIL {name}: cols={ok_cols} ({got_cols} vs {want_cols}) "
                  f"rows={ok_rows} ({len(got)} vs {len(want)}) hash={ok_hash}")
            if ok_cols and len(got) < 20 and len(want) < 20:
                print(f"    got:  {sorted(map(str, got))}")
                print(f"    want: {sorted(map(str, want))}")
            n_fail += 1
    print(f"selfcheck: {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    skip = ()
    if "--skip" in args:
        i = args.index("--skip")
        skip = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], skip))
