#!/usr/bin/env python3
"""Combine a round's refresh runs into the published engine comparison
(REFRESH_r*_final.json shape): per-query Spark time = min across the
two full Bench invocations (each already min-of-SPARK_GRAFT_RUNS
internally); per-query DuckDB time = min across the two time_oracle
passes (each a median-of-3); totals and the ratio computed over the
INTERSECTION of the Spark headline set and the queries DuckDB
completed — anything DuckDB skipped/failed/timed out lands in
missing_duckdb with Spark's own time attached, so exclusions are
visible, never silently flattering.

Usage: combine_refresh.py <out.json> <sf-label=spark1,spark2,duck1[,duck2]> ...
e.g. combine_refresh.py REFRESH_r12_final.json \
  sf0.1=BENCH_a.json,BENCH_b.json,DUCK_a.json,DUCK_b.json

A scale may carry a SINGLE DuckDB pass (3 files) when the second pass
is wall-clock-prohibitive (the sf10 case); the fold then stamps
"duckdb_passes": 1 so the artifact can never silently pass off one
pass as a min-of-two.
"""
import sys, json

out_path = sys.argv[1]
final = {}
for spec in sys.argv[2:]:
    label, files = spec.split("=")
    parts = files.split(",")
    if len(parts) == 4:
        s1, s2, d1, d2 = parts
        duck_files = (d1, d2)
    else:
        s1, s2, d1 = parts
        duck_files = (d1,)
    sparks = [json.load(open(f))["queries"] for f in (s1, s2)]
    ducks = [json.load(open(f)) for f in duck_files]
    # the stamped protocol must describe BOTH passes — two passes run
    # with different `runs` values would misreport as the first's
    duck_runs = {d.get("runs", 3) for d in ducks}
    assert len(duck_runs) == 1, \
        f"{label}: DuckDB passes disagree on runs-per-pass: {sorted(duck_runs)}"
    if len(ducks) == 1:
        ducks = ducks * 2  # min() over identical passes = the single pass
    spark = {q: min(r[q] for r in sparks if q in r)
             for q in set(sparks[0]) | set(sparks[1])}
    dq = [r["queries"] for r in ducks]
    duck = {q: min(r[q] for r in dq if q in r) for q in set(dq[0]) | set(dq[1])}
    common = sorted(set(spark) & set(duck))
    missing = {q: spark[q] for q in sorted(set(spark) - set(duck))}
    st = sum(spark[q] for q in common)
    dt = sum(duck[q] for q in common)
    final[label] = {
        "spark_total": st, "duckdb_total": dt, "ratio": st / dt,
        "n": len(common),
        "duckdb_passes": len(duck_files),
        "duckdb_runs_per_pass": ducks[0].get("runs", 3),
        "spark": {q: spark[q] for q in common},
        "duckdb": {q: duck[q] for q in common},
        "missing_duckdb": missing,
        "duckdb_excluded_detail": {
            "skipped": sorted(set(ducks[0].get("skipped", [])) |
                              set(ducks[1].get("skipped", []))),
            "timed_out": sorted(set(ducks[0].get("timed_out", [])) |
                                set(ducks[1].get("timed_out", []))),
            "failed": sorted(set(ducks[0].get("failed", [])) |
                             set(ducks[1].get("failed", []))),
        },
    }
json.dump(final, open(out_path, "w"), indent=1)
for label, v in final.items():
    print(label, f"spark={v['spark_total']:.1f}s duckdb={v['duckdb_total']:.1f}s "
          f"ratio={v['ratio']:.3f} n={v['n']} missing={list(v['missing_duckdb'])}")
