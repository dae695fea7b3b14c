#!/bin/bash
# r18 sf10 DuckDB leg, attempt 4: per-query process isolation
# (time_oracle.py --isolate). Attempts 1-3 all futex-wedged at the
# 100 GB allocator ceiling, each through a different surface (fetchall
# MemoryError; con.interrupt() MemoryError under the connection mutex;
# MemoryError at watchdog-thread bootstrap) — a shared-connection pass
# cannot be made wedge-proof, so each query now runs in its own child
# with a parent-side wall kill and the pass always completes.
# The two unigram rows return to the pass: their only sf10 "evidence"
# was the tool's own wedge, and isolation bounds an honest attempt
# (failed/timed_out in-artifact) at ~12 min worst case each. The other
# 18 skips keep their multi-round measured abort/OOM artifacts.
set -uo pipefail
cd /root/repo
SKIP="x_pipeline_near,x_semdedup,x_semdedup_text,x_quality_trained,x_ann_ivf,x_ann_ivf_hier,x_ann_ivf_lloyd,x_ann_ivf_probe,x_ann_ivfpq,x_ann_ivfpq_rerank,x_ann_ivfpq_res,x_bpe_encode,x_pipeline_tok,x_dedup_cluster,x_dedup_cluster_best,x_remove_spans,x_contamination_frac,x_contaminated_spans"
out=DUCKDB_r18_refresh_sf10_run1.json
echo "=== DuckDB sf10 single pass attempt4 (isolate) $(date -u +%H:%M:%S)"
python3 tools/time_oracle.py /root/repo/scratch/sf10 /tmp/oracle_r18/oracle_sql.json 300 "$SKIP" 1 --isolate > "/tmp/$out" \
  && mv "/tmp/$out" "$out" \
  || { echo "DUCKDB $out FAILED"; rm -f "/tmp/$out"; }
echo "=== sf10 leg done $(date -u +%H:%M:%S)"
