#!/usr/bin/env python3
"""Time the DuckDB oracle suite (the same SQL the correctness gate runs)
against a testdata dir: per-query median of 3 after one untimed warmup
pass, 32 threads — mirroring graft.Bench's protocol so Spark-vs-DuckDB
totals are comparable.

Usage: time_oracle.py <sfdir> <oracle_sql.json> [timeout_sec] [skip,list] [runs]

timeout_sec (default: none) interrupts any single execution via a
watchdog thread + con.interrupt(); the query lands in "timed_out" and
contributes NOTHING to the total (same no-silent-deflation rule as
"failed"). skip,list names queries excluded up front — for queries with
already-documented multi-hour aborts (e.g. x_semdedup at sf1,
DUCKDB_semdedup_r12.json) where even one timed-out attempt per pass
would dominate the wall clock; they land in "skipped".

runs (default 3) is the timed executions per query; the reported time is
their MEDIAN (runs=1 → the single execution, still after the untimed
warmup). runs=1 exists for the sf10 scale, where a median-of-3 pass is
~2.5 h wall and the campaign needs TWO passes — the published protocol
there is min-over-two-single-execution passes, stamped in the output
("runs": N) so no artifact can silently pass off a single execution as
a median-of-3."""
import sys, json, time, glob, os, statistics, threading
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
timeout = float(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3] != "-" else None
skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] != "-" else set()
runs = int(sys.argv[5]) if len(sys.argv) > 5 else 3
con = duckdb.connect()
con.execute("SET threads TO 32")
# raise a catchable exception instead of dying on allocator exhaustion,
# and spill to disk first — the r14 sf10 campaign lost an entire pass
# (the 0-byte artifact) to a process-killing OOM mid-suite; with these
# set the query lands in "failed" and the pass completes. The limit is
# derived from physical RAM (80%, capped at 100GB): a hardcoded 100GB on
# a smaller host would sit ABOVE physical memory and re-enable the
# process-killing OS OOM this setting exists to prevent.
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
    # sf0.1 tables are single files; ScaleGen output is a directory
    src = f"{sfdir}/{t}.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")


def run_one(sql):
    """Execute once; returns 'ok' | 'fail' | 'timeout'."""
    timer = None
    # Guard against the cancel() race: Timer can fire AFTER the query
    # finishes but BEFORE timer.cancel(), leaving a pending interrupt on
    # the shared connection that would spuriously abort the NEXT
    # execution. The flag is flipped under a lock before cancel(), and
    # the callback re-checks it inside the same lock.
    state = {"running": True}
    lock = threading.Lock()

    def _interrupt():
        with lock:
            if state["running"]:
                state["fired"] = True
                con.interrupt()

    if timeout is not None:
        timer = threading.Timer(timeout, _interrupt)
        timer.start()
    caught_interrupt = False
    try:
        con.execute(sql).fetchall()
        return "ok"
    except duckdb.InterruptException:
        caught_interrupt = True
        return "timeout"
    except Exception:
        return "fail"
    finally:
        with lock:
            state["running"] = False
        if timer is not None:
            timer.cancel()
        # interrupt fired but the query finished first: drain the pending
        # interrupt on a throwaway statement so it cannot abort the next
        # timed execution
        if state.get("fired") and not caught_interrupt:
            try:
                con.execute("SELECT 1").fetchall()
            except duckdb.InterruptException:
                pass


oracle = {k: v for k, v in json.load(open(oracle_path)).items() if k not in skip}
for name, sql in sorted(oracle.items()):  # warmup, untimed
    st = run_one(sql)
    if st != "ok":
        print(f"WARMUP-{st.upper()} {name}", file=sys.stderr)

results, failed, timed_out = {}, [], []
for name, sql in sorted(oracle.items()):
    times, status = [], "ok"
    for _ in range(runs):
        t0 = time.time()
        st = run_one(sql)
        if st != "ok":
            status = st
            break
        times.append(time.time() - t0)
    # a failed/timed-out query must NOT contribute to the total — that
    # would silently deflate the engine comparison; record it separately
    if status == "ok":
        results[name] = statistics.median(times)
    elif status == "timeout":
        timed_out.append(name)
    else:
        failed.append(name)
total = sum(results.values())
print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                  "runs": runs, "queries": results, "failed": failed,
                  "timed_out": timed_out, "skipped": sorted(skip),
                  "sf": sfdir}))
