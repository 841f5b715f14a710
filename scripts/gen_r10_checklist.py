"""Generate the OPTIMIZATION_r10.md per-query checklist table from the
committed before/after bench records plus this round's status map."""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHANGED: dict[str, str] = {
    # graph / link prediction (§1, §2)
    "jaccard_linkpred": "CHANGED — canon+deg checkpoints share the edge-build subtree (§1)",
    "adamic_adar": "CHANGED — canon checkpoint shares the edge-build subtree (§1)",
    "degree_assortativity": "CHANGED — sym checkpoint (§1)",
    "k_core": "CHANGED — lazy per-round checkpoint folded into fixpoint count; ONE reused broadcast build (§2)",
    "label_communities": "CHANGED — lazy per-round label checkpoints; NULL-vote ordering fix (§2)",
    "event_pagerank": "CHANGED — lazy per-round rank checkpoints (§2)",
    # HOF scalar binding (§3) — normalize()/cosine()/kmeans_assign consumers
    "embedding_neardup": "CHANGED — salted blocked self-join + keyed repartition (§6); normalize bind-once (§3)",
    "image_phash_neardup": "CHANGED — salted banded Hamming join + keyed repartition (§6)",
    "kmeans_iters": "CHANGED — normalize bind-once + single-eval argmax in kmeans_assign (§3); round fusion REJECTED on scale grounds (§7)",
    "knn_graph": "CHANGED — normalize bind-once on corpus/query projections (§3)",
    "mutual_knn": "CHANGED — normalize bind-once (§3)",
    "mutual_knn_selective": "CHANGED — normalize bind-once (§3)",
    "mutual_knn_recall": "CHANGED — normalize bind-once (§3)",
    "ivf_topk": "CHANGED — normalize bind-once (§3)",
    "ivf_recall": "CHANGED — normalize bind-once (§3)",
    "ivfpq_topk": "CHANGED — normalize bind-once (§3)",
    "pq_topk": "CHANGED — normalize bind-once (§3)",
    "lsh_topk": "CHANGED — normalize bind-once (§3)",
    "multiprobe_recall": "CHANGED — normalize bind-once (§3)",
    "ann_recall": "CHANGED — normalize bind-once (§3)",
    "ann_index_append": "CHANGED — normalize bind-once (§3)",
    "ann_index_roundtrip": "CHANGED — normalize bind-once (§3)",
    "embedding_topk": "CHANGED — normalize/cosine bind-once (§3)",
    "embedding_centroids": "CHANGED — normalize bind-once (§3)",
    "embedding_outliers": "CHANGED — normalize bind-once (§3)",
    "hard_negatives": "CHANGED — normalize bind-once (§3)",
    "semantic_decontam": "CHANGED — normalize/cosine bind-once (§3)",
    "mmr_diverse": "CHANGED — normalize bind-once (§3)",
    "semantic_dedup": "CHANGED — normalize bind-once (§3)",
    # streaming (§4)
    "stream_holt": "CHANGED — column pruning before the stateful shuffle; concat skip (§4)",
    "stream_anomaly": "CHANGED — column pruning before the stateful shuffle; concat skip (§4)",
    "stateful_sessions_stream": "CHANGED — column pruning before the stateful shuffle; concat skip (§4)",
    # text (§8)
    "readability": "CHANGED — counts bound once per row (was ~7 tokenize passes) (§8)",
    # fuzzy (ADVICE)
    "fuzzy_pairs": "CHANGED — self-pair filter on duplicate-id input (ADVICE r9; plan +1 filter)",
}

EXAMINED: dict[str, str] = {
    "basket_rules": "examined — opt-in prefilter_oversized guard added (§5); default plan unchanged (pre-count measured +15%)",
    "item_neighbors": "examined — same §5 guard; default plan unchanged",
    "stream_cdc": "examined — foreachBatch bucket-pruned merge protocol is the certified contract; actions are the documented driver steps",
    "stream_dedup": "examined — dropDuplicatesWithinWatermark needs every output column; nothing to prune",
    "stream_dim_join": "examined — streaming machinery; left alone (r9 disposition re-verified)",
    "stream_interval_join": "examined — stream-stream join state bounded by watermark; left alone",
    "srm_audit": "examined — eager guardrail contract deliberate (r9); cost is one scan aggregate",
    "quality_classifier": "examined — md5 feature family pinned by oracle (r9); broadcast-join + one agg",
    "fs_linkage": "examined — r9 array-profile revert stands; sf1 probe shows fixed-overhead-bound (c8/c32 = 0.7)",
    "simhash_neardup": "examined — salt deliberately NOT passed: 2^16-value chunks already parallelize; re-measured 2.11 s (unchanged)",
    "minhash_neardup": "examined — r9 disposition stands (window-in-join shares one exchange)",
    "kmeans_iters_note": "",
    "dup_spans": "examined — exact span semantics; bounded shuffles (r9)",
    "dup_spans_recall": "examined — deliberately quadratic recall certification (SURVEY)",
    "ppl_buckets": "examined — KN bigram pipeline one explode+agg per table (r9); burst-inflated 5.3 s reading was host noise (0.9-2.5 s clean)",
    "negative_samples": "examined — draw arithmetic pinned by oracle (r9)",
    "ivm_rollup": "examined — write clustering re-rejected in r9; filesystem-protocol-bound (sf1 c8/c32 = 0.9)",
    "subject_erasure": "examined — r9 semi-join audit count stands",
}


def main() -> None:
    before = json.load(
        open(os.path.join(ROOT, "plans/r10/BENCH_before_r10.json"))
    )
    after_path = os.path.join(ROOT, "BENCH_local.json")
    after = json.load(open(after_path))
    bw, aw = before["queries_warm"], after["queries_warm"]
    rows = []
    for k in sorted(bw, key=lambda k: -bw[k]):
        status = CHANGED.get(k) or EXAMINED.get(k)
        if not status:
            if bw[k] >= 1.5:
                status = "examined — no structural defect found this round (r9 disposition reviewed)"
            else:
                status = "tail — per-action floor dominates (see tail profile note)"
        rows.append(
            f"| {k} | {bw[k]:.2f} | {aw.get(k, float('nan')):.2f} | {status} |"
        )
    print("| key | before warm (s) | after warm (s) | status |")
    print("|---|---|---|---|")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
