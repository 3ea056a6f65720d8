#!/bin/bash
# 10x-scale DuckDB oracle sweep (VERDICT r14 #6): the correctness gate
# at the sf1 replica, committed as CORRECTNESS_SF1.json. The r14 phash
# defect (distinct payloads collapsing onto 254 fingerprints) was caught
# exactly this way; this makes the catch systematic.
#
#   tools/run_oracle_sf1.sh [replica_dir] [outdir]
#
# Surface: the dedup / graph / classifier / ANN shelves, the
# corpus-build compositions, and the per-vector embedding-audit rows.
# Every oracle runs under its own timeout so one heavy SQL cannot stall
# the sweep; a timeout records as "skipped_oracle_cost", never as a
# silent pass. The ANN shelf (whose oracles re-run Lloyd / pairwise
# O(queries x vectors) lambda folds in DuckDB — the cost is the
# ORACLE's, not the engine's) gets its own, tighter ANN_TIMEOUT_S so a
# genuinely pairwise oracle is adjudicated by measurement, not by fiat.
set -e
REPLICA=${1:-/tmp/sf1}
OUT=${2:-/tmp/gv_sf1}
TIMEOUT_S=${TIMEOUT_S:-900}
ANN_TIMEOUT_S=${ANN_TIMEOUT_S:-420}
cd /root/repo
if [ ! -d "$REPLICA" ]; then
  echo "[sf1] building 10x replica at $REPLICA"
  python3 tools/make_replica.py /root/testdata/sf0.1 "$REPLICA" 10
fi

DEDUP="q_dedup_exact,q_prefix_dedup,q_suffix_dedup,q_dedup_minhash,q_dedup_clusters,q_dedup_simhash,q_dedup_containment,q_ngram_jaccard,q_minhash_error,q_dup_summary,q_dup_flow,q_dup_source,q_dup_by_batch,q_dup_tokens,q_source_overlap,q_lang_leak,q_entity_match,q_entity_best_match,q_phash_dedup,q_dedup_segment,q_span_dedup,q_span_excise,q_span_leaderboard,q_lsh_bucket_stats"
GRAPH="q_pagerank,q_components,q_degree_stats,q_kcore,q_triangles,q_label_prop,q_graph_modularity,q_assortativity,q_clustering_coeff,q_link_predict,q_basket_pairs,q_user_overlap"
CLASSIFIER="q_classifier_eval,q_hashed_classifier,q_classifier_calibration,q_lm_perplexity,q_ppl_source_mix,q_dsir_weights"
CORPUS="q_corpus_build,q_corpus_manifest,q_filter_pipeline,q_source_quality,q_pack_sequences,q_pack_waste,q_shard_plan,q_session_window,q_gopher_rules"
EMBED="q_embed_stats,q_norm_hist,q_embed_centroid"
ANN="q_ann_bruteforce,q_ann_lsh,q_ann_ivf,q_ann_quantized,q_ann_recall,q_quant_recall,q_ann_probe_curve,q_lsh_probe_curve,q_semdedup,q_dedup_embedding,q_cluster_quality,q_cluster_keywords,q_centroid_assign,q_centroid_shift,q_embed_outlier,q_hybrid_search,q_rrf_fusion"
ALL="$DEDUP,$GRAPH,$CLASSIFIER,$CORPUS,$EMBED,$ANN"

echo "[sf1] verify dump for $(echo "$ALL" | tr ',' '\n' | wc -l) queries"
SPARK_GRAFT_ONLY="$ALL" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  tools/run_verify.sh "$REPLICA" "$OUT" 2>&1 | grep -iE "\[verify\].*failed" || true

mkdir -p "$OUT/percheck"
for q in $(echo "$ALL" | tr ',' ' '); do
  t="$TIMEOUT_S"
  case ",$ANN," in *",$q,"*) t="$ANN_TIMEOUT_S";; esac
  if CHECK_ONLY="$q" timeout "$t" \
      python3 tools/check_oracle.py "$REPLICA" "$OUT" "$OUT/percheck/$q.json" \
      > "$OUT/percheck/$q.log" 2>&1; then
    tail -2 "$OUT/percheck/$q.log" | head -1
  else
    rc=$?
    if [ "$rc" = 124 ]; then
      echo "SKIP $q: oracle exceeded ${t}s (skipped_oracle_cost)"
      echo "{\"sf\": \"$REPLICA\", \"n_pass\": 0, \"n_fail\": 0, \"queries\": {\"$q\": {\"status\": \"skipped_oracle_cost\", \"rows\": -1, \"detail\": \"oracle SQL exceeded ${t}s at 10x\"}}}" \
        > "$OUT/percheck/$q.json"
    else
      echo "FAIL $q: check exited $rc"
      head -5 "$OUT/percheck/$q.log"
    fi
  fi
done

python3 - "$OUT/percheck" CORRECTNESS_SF1.json "$REPLICA" <<'EOF'
import glob, json, sys
d, out, sf = sys.argv[1], sys.argv[2], sys.argv[3]
queries, npass, nfail, nskip = {}, 0, 0, 0
for p in sorted(glob.glob(f"{d}/*.json")):
    j = json.load(open(p))
    for k, v in j.get("queries", {}).items():
        queries[k] = v
        st = v["status"]
        if st.startswith("pass"): npass += 1
        elif st == "skipped_oracle_cost": nskip += 1
        else: nfail += 1
json.dump({"sf": sf, "n_pass": npass, "n_fail": nfail,
           "n_skipped_oracle_cost": nskip, "queries": queries},
          open(out, "w"), indent=1, sort_keys=True)
print(f"wrote {out}: {npass} pass, {nfail} fail, {nskip} skipped (oracle cost)")
EOF
