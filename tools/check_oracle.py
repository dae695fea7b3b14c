#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify parquet
dumps against DuckDB oracle results (sorted columns, sorted rows, hashed)."""
import sys, json, glob, hashlib
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
import os
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    # driver sfdirs hold single files; ScaleGen output holds directories
    p = f"{sfdir}/{t}.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pq = f"{outdir}/{name}"
    try:
        spark_df = con.execute(
            f"SELECT * FROM parquet_scan('{pq}/*.parquet')").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: exec error: {str(e)[:200]}"); fails += 1; continue
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        rows = sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))
        return hashlib.md5(repr(rows).encode()).hexdigest(), len(rows), sorted(df.columns)
    (h1, n1, c1), (h2, n2, c2) = canon(spark_df), canon(duck_df)
    if c1 != c2:
        print(f"FAIL {name}: columns {c1} vs {c2}"); fails += 1
    elif n1 != n2:
        print(f"FAIL {name}: rows {n1} vs {n2}"); fails += 1
    elif h1 != h2:
        print(f"FAIL {name}: hash mismatch ({n1} rows)"); fails += 1
        # show a diff sample
        s = set(map(tuple, ((str(v) for v in r) for r in spark_df.itertuples(index=False))))
        d = set(map(tuple, ((str(v) for v in r) for r in duck_df.itertuples(index=False))))
        for x in list(s - d)[:2]: print("  spark-only:", x)
        for x in list(d - s)[:2]: print("  duck-only :", x)
    else:
        print(f"PASS {name} ({n1} rows)")
missing = [d.split('/')[-1] for d in glob.glob(f"{outdir}/*") if '/' in d
           and not d.endswith('.json') and d.split('/')[-1] not in oracle]
if missing: print("no-oracle (rows-only):", missing)
sys.exit(1 if fails else 0)
