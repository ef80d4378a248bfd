#!/usr/bin/env python3
"""Interleave the DRIVER-PROTOCOL bench (full-suite rounds) across
engines — the same-window twin of graft.Bench.

Usage: python3 tools/measure_driver_protocol.py <sfDir> <oracle_sql.json> \
           [duck_out.json] [graft_out.json]

measure_baseline.py interleaves per QUERY (solo A/B/A/B) — the honest
per-query comparison, but a different protocol from the driver's
BENCH_r{N}.json, which runs the whole suite back-to-back in one JVM
(steady-state cache/GC adjacency). Comparing the two absorbed a
cross-protocol caveat into every verdict. This harness runs whole-SUITE
rounds, alternating engines — duck round / graft round / duck round /
... — so both engines' full-suite steady-state totals sample the same
machine window AND the same protocol as BENCH_r{N}.json.

graft runs in one persistent warm JVM (graft.tools.BenchPipe) timed
inside the JVM; DuckDB runs in-process with all threads, one connection
kept warm across rounds. Per-query MEDIANS across rounds are published,
same as graft.Bench.
"""
import sys, os, json, time, statistics

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from measure_baseline import TABLES, start_pipe, wait_for, pipe_cmd
import duckdb

ROUNDS = 3


def main(sf_dir, oracle_path, duck_out, graft_out):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # spark-written table dir (e.g. MakeSf output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))

    # Correctness-only oracles (r17): the pack family's DuckDB oracle is
    # an exact recursive first-fit REPLAY — 4s at sf0.01 but 40-280s at
    # the bench tiers, all recursion machinery rather than a native
    # engine baseline. Timing it would gift graft hundreds of fake
    # seconds per window, so the pair excludes it; correctness still
    # gates on it via check_oracle at every tier.
    # q_dedup_embedding_resolve: r18, same recursion-machinery argument
    # (see measure_baseline.py)
    # Checker oracles (r19) self-identify with a leading marker line —
    # excluded for the same reason (they read graft's output back and
    # re-run a brute recomputation; see measure_baseline.py).
    CORRECTNESS_ONLY = {"q_pack_sequences", "q_pack_bucketed",
                        "q_dedup_embedding_resolve"}
    oracle = {k: (None if k in CORRECTNESS_ONLY
                  or (v or "").startswith("-- graft:checker") else v)
              for k, v in oracle.items()}

    proc = start_pipe(sf_dir)
    errors = {}
    d_samples = {}   # name -> [sec]
    g_samples = {}
    try:
        proc.stdin.write("list\n")
        proc.stdin.flush()
        names = sorted(wait_for(proc, "[pipe] LIST").split()[2:])
        oracled = [n for n in names if oracle.get(n) is not None]
        # one warm suite pass per engine (pays generation builds + JIT
        # outside every measured round)
        for name in names:
            try:
                pipe_cmd(proc, "warm", name)
            except RuntimeError as e:
                errors[name] = f"warm: {e}"
        for name in oracled:
            con.execute(oracle[name]).fetchall()
        for rnd in range(ROUNDS):
            t0 = time.perf_counter()
            for name in oracled:
                q0 = time.perf_counter()
                con.execute(oracle[name]).fetchall()
                d_samples.setdefault(name, []).append(time.perf_counter() - q0)
            d_total = time.perf_counter() - t0
            t0 = time.perf_counter()
            for name in names:
                try:
                    g_samples.setdefault(name, []).append(
                        pipe_cmd(proc, "time", name))
                except RuntimeError as e:
                    errors[name] = f"time: {e}"
            g_total = time.perf_counter() - t0
            print(f"round {rnd + 1}/{ROUNDS}: duckdb suite {d_total:.2f}s "
                  f"({len(oracled)} oracled)  graft suite {g_total:.2f}s "
                  f"({len(names)} queries)")
    finally:
        try:
            proc.stdin.write("quit\n")
            proc.stdin.flush()
            proc.wait(timeout=120)
        except Exception:
            proc.kill()

    duck_times = {n: round(statistics.median(v), 4) for n, v in d_samples.items()}
    graft_times = {n: round(statistics.median(v), 4) for n, v in g_samples.items()}
    graft_spread = {n: [round(min(v), 4), round(max(v), 4)]
                    for n, v in g_samples.items()}
    json.dump(duck_times, open(duck_out, "w"), indent=1)
    json.dump({"queries": graft_times, "spread": graft_spread, "errors": errors,
               "sf": sf_dir,
               "method": "driver-protocol interleaved: whole-suite rounds "
               f"alternating engines, median of {ROUNDS}, one window"},
              open(graft_out, "w"), indent=1)
    if errors:
        print(f"\nFAILED queries ({len(errors)}): " + ", ".join(sorted(errors)))
    both = [k for k in duck_times if k in graft_times]
    od = sum(duck_times[k] for k in both)
    og = sum(graft_times[k] for k in both)
    cut = [k for k in both if duck_times[k] >= 0.05]
    cd = sum(duck_times[k] for k in cut)
    cg = sum(graft_times[k] for k in cut)
    gt = sum(graft_times.values())
    print(f"\nfull graft suite total ({len(graft_times)} queries): {gt:.2f}s")
    if od > 0:
        print(f"oracled totals ({len(both)}): duckdb {od:.2f}s graft {og:.2f}s "
              f"ratio {og/od:.2f}x")
    if cd > 0:
        print(f">=50ms cut ({len(cut)}): duckdb {cd:.2f}s graft {cg:.2f}s "
              f"ratio {cg/cd:.2f}x")


if __name__ == "__main__":
    duck_out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/driver_duckdb.json"
    graft_out = sys.argv[4] if len(sys.argv) > 4 else "/tmp/driver_graft.json"
    main(sys.argv[1], sys.argv[2], duck_out, graft_out)
