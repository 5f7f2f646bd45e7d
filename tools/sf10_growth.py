#!/usr/bin/env python3
"""Predicted-vs-observed growth table for the sf10 (second-decade) gate.

Reads the sf10 subset bench JSON plus the sf1 reference numbers and
prints the per-family growth with each operator's work-bound
prediction, for EXPLAINS.md. sf1 sources: quiet-box post-cipher
numbers for document-dependent queries (EXPLAINS round-10 table),
bench/latest_sf1.json for the rest (documents.parquet is the only
table the cipher regeneration changed).
"""
import json
import sys

SF10 = sys.argv[1] if len(sys.argv) > 1 else "bench/BENCH_r10_sf10_subset.json"

# bench/latest_sf1.json is fully current (post-cipher corpus, round-10
# fixes live) — no overrides needed; kept for future partial refreshes
SF1_NEW_CORPUS = {
    # label-blocked redefinition landed after the full sf1 run (old plan: 1295.1s)
    "embed_hubness": 13.9,
}

# work-bound predictions at 10x data (sf1 -> sf10)
PREDICTED = {
    "ann_graph_beam": ("x100", "exact kNN-graph build: n^2 dot products dominate"),
    "embed_knn_purity": ("x100", "exact n^2 cosine (the documented brute-force baseline)"),
    "embed_hubness": ("~x10", "label-blocked kNN graph: sum per-block n_b^2, block count scales"),
    "graph_triangles": (">x10 once", "wedges x10 but the plan CHANGES shape at sf10: "
                        "|E| outgrows the broadcast gate -> bloom+shuffled-hash closing join"),
    "graph_pagerank": ("x10", "3 iterations x O(|E|) contrib shuffle"),
    "graph_lpa": ("x10", "2 rounds x O(|E|) label join + argmax"),
    "graph_modularity": ("x10", "LPA + two broadcast label joins, integer counting"),
    "graph_kcore_peel": ("x10", "4 rounds x O(|E|) degree agg + semi-joins"),
    "dedup_winnow_pairs": ("~x10", "collision bound sums x10 post-cipher (PairGrowth)"),
    "dedup_threshold_sweep": ("~x10", "shingle sum-df^2 x10 post-cipher"),
    "dedup_lsh_eval": ("~x10", "band-bucket pair bound linear post-cipher"),
    "dedup_components_minlabel": ("~x10", "label-propagation rounds over near-constant components"),
    "mm_phash_dedup": ("~x10", "constant-size phash families (12/doc-family)"),
    "mm_image_histogram": ("x10", "linear in decoded pixels, map-side decode"),
    "etl_sessionize": ("x10", "one window over events, scan-bound"),
    "q1_pricing_summary": ("x10", "scan + partial agg, scan-bound"),
    "q_region_top_parts": ("x10", "scan + per-region rank"),
}


def main():
    sf10 = json.load(open(SF10))
    sf1 = json.load(open("bench/latest_sf1.json"))["queries"]
    sf1.update(SF1_NEW_CORPUS)
    q10 = sf10["queries"]
    print(f"| query | sf1 (s) | sf10 (s) | growth at 10x | predicted | bound |")
    print("|---|---|---|---|---|---|")
    for k in sorted(q10):
        g = q10[k] / sf1[k] if k in sf1 else float("nan")
        pred, why = PREDICTED.get(k, ("?", "?"))
        print(f"| {k} | {sf1.get(k, 0):.1f} | {q10[k]:.1f} | x{g:.1f} | {pred} | {why} |")
    if sf10.get("errors"):
        print("ERRORS:", sf10["errors"])


if __name__ == "__main__":
    main()
