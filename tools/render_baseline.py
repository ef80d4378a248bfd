#!/usr/bin/env python3
"""Render BASELINE.md's measurement table VERBATIM from run artifacts.

Usage: python3 tools/render_baseline.py <bench_out.json> <baseline_duckdb.json>

Prints the markdown table rows + totals from the bench run's medians and
the DuckDB measurement file — no hand-transcription, so the published
table IS the run (the r6 verdict found a hand-maintained graft column
~25% optimistic vs both the driver's and the judge's runs; this renderer
plus the run-stamp note is the fix). Paste the output between the table
markers in BASELINE.md, or eyeball-diff first.
"""
import sys, json

def main(bench_path, duck_path):
    bench = json.load(open(bench_path))
    duck = json.load(open(duck_path))
    qs = bench["queries"]
    spread = bench.get("spread", {})
    rows = []
    o_duck = o_graft = 0.0
    # table keys drop the uniform q_ prefix, matching the bench compact
    # line and BASELINE.md (r9 rename)
    for name in sorted(qs, key=lambda k: k[2:] if k.startswith("q_") else k):
        short = name[2:] if name.startswith("q_") else name
        g = qs[name]
        d = duck.get(name)
        if d is None:
            rows.append(f"| {short} | — | {g:.2f} | — |")
        else:
            o_duck += d
            o_graft += g
            ratio = g / d if d > 0 else float("inf")
            rows.append(f"| {short} | {d:.3f} | {g:.2f} | {ratio:.1f}x |")
    print("| query | duckdb s | graft s | graft/duckdb |")
    print("|---|---|---|---|")
    print("\n".join(rows))
    print(f"| **total (oracled queries)** | **{o_duck:.2f}** | **{o_graft:.2f}** "
          f"| **{o_graft / o_duck:.2f}x** |")
    total = sum(qs.values())
    print(f"\nFull-suite graft total (all {len(qs)} queries incl. non-oracled): "
          f"{total:.2f}s")
    # >=50ms-oracle restriction, the method note's honest-comparison cut
    hd = {k: v for k, v in duck.items() if v >= 0.05 and k in qs}
    if hd:
        hg = sum(qs[k] for k in hd)
        print(f"Restricted to the {len(hd)} oracles where DuckDB >= 50 ms: "
              f"{hg / sum(hd.values()):.2f}x")
    if spread:
        worst = sorted(((spread[k][1] - spread[k][0], k) for k in spread),
                       reverse=True)[:5]
        print("Widest per-query spreads (max-min over iterations): " +
              ", ".join(f"{k} {lo:.2f}–{hi:.2f}s" for d, k in worst
                        for lo, hi in [tuple(spread[k])]))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
