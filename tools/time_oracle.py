#!/usr/bin/env python3
"""Time the DuckDB oracle suite (the same SQL the correctness gate runs)
against a testdata dir: per-query median of 3 after one untimed warmup
pass, 32 threads — mirroring graft.Bench's protocol so Spark-vs-DuckDB
totals are comparable. Usage: time_oracle.py <sfdir> <oracle_sql.json>."""
import sys, json, time, glob, os
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # sf0.1 tables are single files; ScaleGen output is a directory
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))
for name, sql in sorted(oracle.items()):  # warmup, untimed
    try:
        con.execute(sql).fetchall()
    except Exception as e:
        print(f"WARMUP-FAIL {name}: {str(e)[:120]}", file=sys.stderr)

results, failed = {}, []
for name, sql in sorted(oracle.items()):
    times, ok = [], True
    for _ in range(3):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
        except Exception:
            ok = False
        times.append(time.time() - t0)
    # a failed query must NOT contribute its ~0s to the total — that would
    # silently deflate the engine comparison; record it separately instead
    if ok:
        results[name] = sorted(times)[1]
    else:
        failed.append(name)
total = sum(results.values())
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "queries": results, "failed": failed, "sf": sfdir}))
