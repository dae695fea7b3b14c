#!/bin/bash
# Round-18 campaign RESUME: the box was reset after the Spark sf0.1/sf1
# raws were committed (8d75c59), wiping scratch/ and /tmp. ScaleGen is
# deterministic (ScaleGenSpec pins the guarantees), so the regenerated
# scratch corpora are bit-identical inputs and the committed raws stay
# valid; this script runs only the remaining legs, in campaign_r18.sh's
# order and with its exact parameters:
#   Spark sf10 x2  ->  DuckDB sf0.1 x2, sf1 x2, sf10 x1 (runs=1, skips)
# Same safety posture: /tmp-first artifact writes, rm -f on failure,
# lock-guarded oracle passes (time_oracle.py flock).
set -uo pipefail
cd /root/repo

ORACLE=/tmp/oracle_r18/oracle_sql.json
if [ ! -f "$ORACLE" ]; then echo "missing $ORACLE (dump via Verify first)"; exit 1; fi

if ! flock -n /tmp/graft_oracle_campaign.lock true; then
  echo "another oracle pass holds /tmp/graft_oracle_campaign.lock — refusing to start"
  exit 2
fi

for run in 1 2; do
  echo "=== Spark sf10 run$run $(date -u +%H:%M:%S)"
  out="BENCH_r18_refresh_sf10_run${run}.json"
  SPARK_GRAFT_SF_DIR=/root/repo/scratch/sf10 \
  SPARK_GRAFT_BENCH_OUT="/tmp/$out" \
    tools/run_main.sh Bench \
    >"/tmp/bench_r18_sf10_${run}.out" 2>&1 \
    && mv "/tmp/$out" "$out" \
    || { echo "SPARK sf10 run$run FAILED"; rm -f "/tmp/$out"; }
done

SKIP_SF1="x_pipeline_near,x_semdedup,x_semdedup_text,x_quality_trained"
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
echo "=== campaign resume done $(date -u +%H:%M:%S)"
