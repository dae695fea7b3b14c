#!/bin/bash
# Round-18 refresh campaign, fully serialized (one engine, one scale at
# a time — timings on this box are only comparable when nothing else
# runs; time_oracle.py additionally holds a host-wide lock so a stale
# or concurrent oracle pass aborts loudly instead of contending).
# Spark: two full min-of-2 Bench invocations per scale. DuckDB: two
# median-of-3 passes at sf0.1 and sf1, one runs=1 pass at sf10 with the
# documented skip list (each entry has a measured abort/OOM artifact;
# see SCALING.md).
#
# Every artifact is written to /tmp first and moved into the repo only
# on success — an interrupted or failed pass can never leave a partial
# or 0-byte json in the repo (the r14-r17 defect class).
set -uo pipefail
cd /root/repo

ORACLE=/tmp/oracle_r18/oracle_sql.json
if [ ! -f "$ORACLE" ]; then echo "missing $ORACLE (dump via Verify first)"; exit 1; fi

# refuse to start over a live oracle pass (the r17 failure mode: a
# stale pass from the previous round contended with the new campaign
# for 9+ hours and neither finished)
if ! flock -n /tmp/graft_oracle_campaign.lock true; then
  echo "another oracle pass holds /tmp/graft_oracle_campaign.lock — refusing to start"
  exit 2
fi

for pair in "sf0.1:/root/testdata/sf0.1" "sf1:/root/repo/scratch/sf1" "sf10:/root/repo/scratch/sf10"; do
  sf="${pair%%:*}"; dir="${pair#*:}"
  for run in 1 2; do
    echo "=== Spark $sf run$run $(date -u +%H:%M:%S)"
    out="BENCH_r18_refresh_${sf}_run${run}.json"
    SPARK_GRAFT_SF_DIR="$dir" \
    SPARK_GRAFT_BENCH_OUT="/tmp/$out" \
      tools/run_main.sh Bench \
      >"/tmp/bench_r18_${sf}_${run}.out" 2>&1 \
      && mv "/tmp/$out" "$out" \
      || { echo "SPARK $sf run$run FAILED"; rm -f "/tmp/$out"; }
  done
done

# sf1 skips: x_pipeline_near (recursive CC >900 s single-pass, r15),
# x_semdedup / x_semdedup_text (multi-hour aborts, r12/r13),
# x_quality_trained (spilled >70 GB and died out-of-disk, r12 — skipping
# saves the pass from burning the spill budget before failing anyway).
SKIP_SF1="x_pipeline_near,x_semdedup,x_semdedup_text,x_quality_trained"
# sf10 adds: the IVF family (7 rows, each a measured >300 s warmup abort,
# DUCKDB_sf10_warmup_timeouts_r16.txt), x_bpe_encode / x_pipeline_tok
# (>600 s presize timeouts, DUCKDB_sf10_presize_r16.json),
# x_dedup_cluster (>730 s presize abort, r15) and x_dedup_cluster_best
# (strict superset of the same recursive CC), x_remove_spans /
# x_contamination_frac / x_contaminated_spans (documented sf10
# allocator-exhaustion OOMs, r11s5 campaign).
SKIP_SF10="$SKIP_SF1,x_ann_ivf,x_ann_ivf_hier,x_ann_ivf_lloyd,x_ann_ivf_probe,x_ann_ivfpq,x_ann_ivfpq_rerank,x_ann_ivfpq_res,x_bpe_encode,x_pipeline_tok,x_dedup_cluster,x_dedup_cluster_best,x_remove_spans,x_contamination_frac,x_contaminated_spans"

duck() { # duck <sfdir> <timeout> <skip> <runs> <outfile>
  local sfdir="$1" timeout="$2" skip="$3" runs="$4" out="$5"
  python3 tools/time_oracle.py "$sfdir" "$ORACLE" "$timeout" "$skip" "$runs" \
    > "/tmp/$out" \
    && mv "/tmp/$out" "$out" \
    || { echo "DUCKDB $out FAILED"; rm -f "/tmp/$out"; }
}

for run in 1 2; do
  echo "=== DuckDB sf0.1 run$run $(date -u +%H:%M:%S)"
  duck /root/testdata/sf0.1 600 - 3 "DUCKDB_r18_refresh_sf0.1_run${run}.json"
done
for run in 1 2; do
  echo "=== DuckDB sf1 run$run $(date -u +%H:%M:%S)"
  duck /root/repo/scratch/sf1 600 "$SKIP_SF1" 3 "DUCKDB_r18_refresh_sf1_run${run}.json"
done
echo "=== DuckDB sf10 single pass $(date -u +%H:%M:%S)"
duck /root/repo/scratch/sf10 300 "$SKIP_SF10" 1 "DUCKDB_r18_refresh_sf10_run1.json"
echo "=== campaign done $(date -u +%H:%M:%S)"
