#!/usr/bin/env python3
"""Time the DuckDB oracle suite (the same SQL the correctness gate runs)
against a testdata dir: per-query median of 3 after one untimed warmup
pass, 32 threads — mirroring graft.Bench's protocol so Spark-vs-DuckDB
totals are comparable.

Usage: time_oracle.py <sfdir> <oracle_sql.json> [timeout_sec] [skip,list] [runs] [--isolate]

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
a median-of-3.

--isolate runs every query in its OWN child process (fresh connection:
untimed warmup + the timed runs, same per-query protocol), with a hard
wall-clock kill in the parent. This exists for sf10, where THREE
shared-connection passes wedged three different ways at the 100 GB
allocator ceiling (fetchall MemoryError; con.interrupt() MemoryError
holding the connection mutex; MemoryError at watchdog-thread bootstrap
— each time every thread parked in futex_wait, CPU frozen, pass dead).
Python cannot recover a process whose allocator is exhausted under a
C-held lock; a child that dies or wedges is simply killed and recorded
failed/timed_out, and the pass ALWAYS completes. Timing semantics per
query are unchanged (same warmup-then-measure on one connection);
cross-query DuckDB buffer-pool carryover is lost, but the OS page
cache still carries the parquet bytes, and the mode is stamped in the
output ("isolate": true) so artifacts are never silently mixed."""
import sys, json, time, glob, os, statistics, threading, fcntl, atexit
import subprocess
import duckdb

# ---- child mode: --one <name> <sfdir> <oracle> <timeout|-> <runs> ----
# No campaign lock (the parent holds it); prints one JSON line.
CHILD = len(sys.argv) > 1 and sys.argv[1] == "--one"

# Host-wide concurrency lock: timings are only meaningful on a quiet
# host, and in r17 two oracle passes (one a stale leftover from the
# previous round) ran concurrently for 9+ hours — neither finished, and
# the contention also poisoned the end-of-round snapshot bench. A
# second pass must REFUSE to start, loudly, instead of silently
# degrading both. flock is advisory but both holders are this script;
# the lock dies with the process, so a crashed pass never wedges the
# next one.
if CHILD:
    # child of an --isolate parent: the parent holds the campaign lock
    _, _, one_name, sfdir, oracle_path, _t, _r = sys.argv
    timeout = float(_t) if _t != "-" else None
    skip, runs, isolate = set(), int(_r), False
else:
    _lock_fh = open("/tmp/graft_oracle_campaign.lock", "w")
    try:
        fcntl.flock(_lock_fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        print("REFUSING to start: another time_oracle.py pass holds "
              "/tmp/graft_oracle_campaign.lock (timings must be serialized "
              "on a quiet host — kill the other pass or wait)", file=sys.stderr)
        sys.exit(2)
    _lock_fh.write(f"{os.getpid()} {' '.join(sys.argv[1:3])}\n")
    _lock_fh.flush()
    atexit.register(_lock_fh.close)

    isolate = "--isolate" in sys.argv
    argv = [a for a in sys.argv if a != "--isolate"]
    sfdir, oracle_path = argv[1], argv[2]
    timeout = float(argv[3]) if len(argv) > 3 and argv[3] != "-" else None
    skip = set(argv[4].split(",")) if len(argv) > 4 and argv[4] != "-" else set()
    runs = int(argv[5]) if len(argv) > 5 else 3

con = None if (isolate and not CHILD) else duckdb.connect()
if con is not None:
    con.execute("SET threads TO 32")
    # raise a catchable exception instead of dying on allocator
    # exhaustion, and spill to disk first — the r14 sf10 campaign lost an
    # entire pass (the 0-byte artifact) to a process-killing OOM
    # mid-suite; with these set the query lands in "failed" and the pass
    # completes. The limit is derived from physical RAM (80%, capped at
    # 100GB): a hardcoded 100GB on a smaller host would sit ABOVE
    # physical memory and re-enable the process-killing OS OOM this
    # setting exists to prevent.
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
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
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
                # interrupt() allocates inside duckdb; under allocator
                # exhaustion (the sf10 unigram rows at the 100 GB limit)
                # it can itself MemoryError mid-call while holding the
                # connection mutex — the watchdog thread then dies with
                # the lock held and the main thread futex-wedges forever
                # (both r18 sf10 wedges). Swallowing here keeps the
                # watchdog thread alive; the query either finishes or the
                # pass's own skip-list discipline handles it.
                try:
                    con.interrupt()
                except BaseException:
                    pass

    if timeout is not None:
        timer = threading.Timer(timeout, _interrupt)
        timer.start()
    caught_interrupt = False
    try:
        # Stream the result instead of fetchall(): DuckDB still computes
        # and surfaces every row (same work timed), but python holds one
        # batch at a time. fetchall() on the sf10 encode-family rows
        # (corpus-sized token frames) materialized hundreds of millions
        # of python tuples, MemoryError'd the interpreter mid-warmup and
        # futex-wedged the whole pass — the r18 first-attempt failure.
        res = con.execute(sql)
        while res.fetchmany(100_000):
            pass
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


def measure(sql):
    """Untimed warmup + `runs` timed executions on the current
    connection. Returns ("ok", [times]) | ("fail"|"timeout", [])."""
    st = run_one(sql)  # warmup, untimed
    if st != "ok":
        print(f"WARMUP-{st.upper()}", file=sys.stderr)
        # warmup failure usually means the timed run fails the same way;
        # still attempt it so a transient warmup hiccup can't lose a row
    times = []
    for _ in range(runs):
        t0 = time.time()
        st = run_one(sql)
        if st != "ok":
            return st, []
        times.append(time.time() - t0)
    return "ok", times


if CHILD:
    sql = json.load(open(oracle_path))[one_name]
    status, times = measure(sql)
    print(json.dumps({"status": status, "times": times}))
    sys.exit(0)

oracle = {k: v for k, v in json.load(open(oracle_path)).items() if k not in skip}
results, failed, timed_out = {}, [], []

if isolate:
    # hard wall limit per child: warmup + runs executions, each allowed
    # the per-execution timeout (the child's own watchdog normally fires
    # first and reports "timeout" cleanly), plus slack for spawn/views —
    # the parent kill only triggers when the child WEDGES
    wall = (timeout * (runs + 1) + 120) if timeout is not None else None
    for name in sorted(oracle):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name,
                 sfdir, oracle_path,
                 "-" if timeout is None else str(timeout), str(runs)],
                capture_output=True, text=True, timeout=wall)
            out = json.loads(p.stdout.strip().splitlines()[-1]) \
                if p.returncode == 0 and p.stdout.strip() else \
                {"status": "fail"}
        except subprocess.TimeoutExpired:
            out = {"status": "timeout"}
        status = out["status"]
        if status == "ok":
            results[name] = statistics.median_low(out["times"])
        elif status == "timeout":
            timed_out.append(name)
        else:
            failed.append(name)
        print(f"{name}: {status} {time.time() - t0:.0f}s wall",
              file=sys.stderr)
else:
    for name, sql in sorted(oracle.items()):  # warmup, untimed
        st = run_one(sql)
        if st != "ok":
            print(f"WARMUP-{st.upper()} {name}", file=sys.stderr)
    for name, sql in sorted(oracle.items()):
        times, status = [], "ok"
        for _ in range(runs):
            t0 = time.time()
            st = run_one(sql)
            if st != "ok":
                status = st
                break
            times.append(time.time() - t0)
        # a failed/timed-out query must NOT contribute to the total —
        # that would silently deflate the engine comparison; record it
        # separately. median_low so the reported time is always an
        # OBSERVED execution: plain median interpolates the two middle
        # values on even-length runs — a time no run actually measured.
        # Identical for odd runs.
        if status == "ok":
            results[name] = statistics.median_low(times)
        elif status == "timeout":
            timed_out.append(name)
        else:
            failed.append(name)

total = sum(results.values())
out = {"metric": "duckdb_total", "value": total, "unit": "sec",
       "runs": runs, "queries": results, "failed": failed,
       "timed_out": timed_out, "skipped": sorted(skip), "sf": sfdir}
if isolate:
    out["isolate"] = True
print(json.dumps(out))
