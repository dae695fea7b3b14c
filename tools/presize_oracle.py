#!/usr/bin/env python3
"""Single-execution DuckDB presize probe for borderline refresh queries:
runs each named query ONCE (no warmup) with a watchdog timeout and
prints per-query seconds — evidence for a campaign skip list, never a
comparison number (the refresh passes re-measure anything kept).

Usage: presize_oracle.py <sfdir> <oracle_sql.json> <timeout_sec> <q1,q2,...>
"""
import sys, json, time, os, threading
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
timeout = float(sys.argv[3])
names = sys.argv[4].split(",")
con = duckdb.connect()
con.execute("SET threads TO 32")
# raise instead of dying on allocator exhaustion, and spill to disk —
# the r14 sf10 campaign lost a whole pass to a process-killing OOM.
# Limit derived from physical RAM (80%, capped at 100GB) — see
# time_oracle.py for why a hardcoded value above physical memory would
# defeat the protection.
mem_kb = 0
with open("/proc/meminfo") as f:
    for line in f:
        if line.startswith("MemTotal:"):
            mem_kb = int(line.split()[1])
            break
mem_gb = min(100, max(1, mem_kb * 8 // 10 // (1024 * 1024)))
con.execute(f"SET memory_limit='{mem_gb}GB'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET max_temp_directory_size='60GB'")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(oracle_path))
out = {"metric": "duckdb_presize_single_pass", "unit": "sec",
       "timeout_sec": timeout, "queries": {}, "timed_out": [],
       "failed": {}, "sf": sfdir}
for name in names:
    sql = oracle[name]
    state = {"running": True}
    lock = threading.Lock()

    def _interrupt():
        with lock:
            if state["running"]:
                con.interrupt()

    timer = threading.Timer(timeout, _interrupt)
    timer.start()
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        out["queries"][name] = round(time.time() - t0, 1)
    except duckdb.InterruptException:
        out["timed_out"].append(name)
    except Exception as e:
        out["failed"][name] = f"{type(e).__name__}: {str(e)[:200]}"
    finally:
        with lock:
            state["running"] = False
        timer.cancel()
        # drain a pending interrupt that fired after completion so it
        # cannot abort the next query (same race as time_oracle.py)
        try:
            con.execute("SELECT 1").fetchall()
        except duckdb.InterruptException:
            pass
    print(f"{name}: {out['queries'].get(name, 'timeout/fail')}",
          file=sys.stderr, flush=True)
print(json.dumps(out))
