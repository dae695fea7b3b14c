#!/bin/bash
# r18 Spark sf0.1/sf1 re-runs (runs 3/4 per scale): the run1/run2 raws
# were taken BEFORE the box reset and rode unknown host contention
# (suite totals 9-45% above r17 and above every post-reset number);
# these two invocations per scale are taken in the same quiet
# serialized regime as all the r18 DuckDB passes. All four raws per
# scale stay committed — the fold names which two it uses.
# Same safety posture as campaign_r18.sh: /tmp-first writes, rm -f on
# failure; MUST only run when no oracle pass is live.
set -uo pipefail
cd /root/repo

if ! flock -n /tmp/graft_oracle_campaign.lock true; then
  echo "an oracle pass holds /tmp/graft_oracle_campaign.lock — refusing to start"
  exit 2
fi

for pair in "sf0.1:/root/testdata/sf0.1" "sf1:/root/repo/scratch/sf1"; do
  sf="${pair%%:*}"; dir="${pair#*:}"
  for run in 3 4; do
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
echo "=== spark re-runs done $(date -u +%H:%M:%S)"
