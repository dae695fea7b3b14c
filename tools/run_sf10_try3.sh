#!/bin/bash
# r18 sf10 DuckDB leg, attempt 3: streaming fetch + hardened watchdog,
# and the two unigram rows added to the skip list (twice-measured
# allocator-exhaustion wedges this session; see SCALING.md round 18).
set -uo pipefail
cd /root/repo
SKIP="x_pipeline_near,x_semdedup,x_semdedup_text,x_quality_trained,x_ann_ivf,x_ann_ivf_hier,x_ann_ivf_lloyd,x_ann_ivf_probe,x_ann_ivfpq,x_ann_ivfpq_rerank,x_ann_ivfpq_res,x_bpe_encode,x_pipeline_tok,x_dedup_cluster,x_dedup_cluster_best,x_remove_spans,x_contamination_frac,x_contaminated_spans,x_unigram_encode,x_unigram_logprob"
out=DUCKDB_r18_refresh_sf10_run1.json
echo "=== DuckDB sf10 single pass attempt3 $(date -u +%H:%M:%S)"
python3 tools/time_oracle.py /root/repo/scratch/sf10 /tmp/oracle_r18/oracle_sql.json 300 "$SKIP" 1 > "/tmp/$out" \
  && mv "/tmp/$out" "$out" \
  || { echo "DUCKDB $out FAILED"; rm -f "/tmp/$out"; }
echo "=== sf10 leg done $(date -u +%H:%M:%S)"
