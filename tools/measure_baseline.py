#!/usr/bin/env python3
"""Measure the DuckDB baseline for every oracle query.

Usage: python3 tools/measure_baseline.py <sfDir> <oracle_sql.json> [out.json]

Runs each oracle SQL in DuckDB (the reference's own engine) over the sf
parquet tables with all threads, warm cache, best of 3, and writes
{name: seconds} JSON. BASELINE.md's duckdb column is rendered from this.
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, oracle_path, out_path):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(4):  # first run warms the cache; best of remaining 3
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            if best is None:
                best = float("inf")  # discard warmup
            else:
                best = min(best, dt)
        times[name] = round(best, 4)
        print(f"{name}: {best:.4f}s")
    json.dump(times, open(out_path, "w"), indent=1)

if __name__ == "__main__":
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/baseline_duckdb.json"
    main(sys.argv[1], sys.argv[2], out)
