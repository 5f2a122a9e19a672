"""Scaling-curve measurement: time representative queries at three
scale factors and report each one's growth exponent.

    python tools/bench_scaling.py            # writes SCALING.md

For a query with wall times t(sf) at sf in {0.001, 0.01, 0.1}, the
fitted exponent is the least-squares slope of log t vs log sf over
the measured points.  Data volume grows 10x per step, so an exponent
near 0 means fixed-overhead-dominated (scheduler floor), near 1 means
linear scaling, and much above 1 is the red flag (a join or window
whose cost grows faster than its input -- the thing that dies at
100 TB).  Local caveats recorded in the report header.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark  # noqa: E402
from mvp_mini_etl_pipeline_1762840347_spark import plans  # noqa: E402

SFS = [0.001, 0.01, 0.1]
SF_DIRS = {sf: f"/root/testdata/sf{sf}" for sf in SFS}
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))

# One representative per operator family; heavier names deliberately
# included because they are the ones whose growth matters.
QUERIES = [
    "groupby_pricing",          # scan + partial agg
    "sole_late_supplier",       # Q21 decorrelation, windows-in-shuffle
    "nation_revenue_share",     # star join + ratio-to-report
    "profit_by_nation_year",    # Q9 rollup, cost join-back
    "min_cost_supplier",        # cascaded struct-min
    "window_rank",              # per-key windows
    "events_session",           # sessionization
    "max_concurrent_sessions",  # sweep line over prefix scan
    "asof_join",                # union + per-key window sort
    "dedup_exact",              # hash groupBy
    "dedup_minhash_lsh",        # minhash + banded join
    "dedup_prefix_filter_join", # exact similarity join (PPJoin)
    "dedup_apply",              # LSH -> CC -> broadcast drop (iterative)
    "similarity_topk",          # brute-force cosine (baseline)
    "similarity_ivf",           # IVF ANN
    "embedding_int8_quant",     # two-pass quantization
    "text_tfidf_top_terms",     # token explode + idf join
    "text_token_entropy",       # one-pass agg
    "pack_sequences",           # 3-level prefix scan
    "sample_token_budget",      # per-group prefix scan
    "sketch_hll_distinct",      # register build
    "sketch_kmv_by_group",      # WindowGroupLimit bottom-k
    "graph_communities_lpa",    # iterative label propagation
    "graph_triangle_count",     # oriented triangle join
    "frequent_pairs",           # basket pair mining
    "crossval_regression",      # one-scan CV
    "classifier_auc",           # distinct-value rank metric
    "scd2_user_state",          # CDC compression windows
    "bitmap_index_intersect",   # bitmap build + popcount
    "k_anonymity_audit",        # cascaded integer aggs
    "exact_median_2pass",       # histogram-narrowing selection
    "events_exact_p95",         # grouped selection (per-type SLO)
    "pack_sizeclass",           # harmonic packing, per-group scan
    "mixture_waterfill",        # census agg + bounded-list solve
    "er_sorted_neighborhood",   # block ranks + rank+j equi-join
    "table_fingerprint",        # 8-table commutative reduction
    "correlation_profile",      # one-scan 15-stat sufficient census
    "eager_agg_pushdown",       # group-by below the join (Yan-Larson)
    "sketch_spacesaving_merge", # MG compression + additive merge
    "multimodal_audio_features",  # Arrow PCM codec path
    "embedding_pca2_deflation", # 2-component mat-vec + deflation
    "fd_profile",               # typed fused FD census (round-7 form)
    "training_data_release",    # full curation -> release manifest
    "embedding_prefix_recall",  # Matryoshka 4-prefix fan-out eval
    "join_order_advisor",       # stats passes + constant enumeration
    # Round-8 extension: every remaining query >= 1.5 s at sf0.1 in
    # the round-7 closing baseline (verdict task #5) -- the slow tail
    # is exactly where a super-linear shape would hide.
    "kmeans_converged",         # capped iterative k-means loop
    "corpus_disposition",       # 3-scan full-curation census
    "weighted_median_delay",    # two-pass weighted order statistic
    "dedup_lsh_recall",         # LSH candidates vs exact Jaccard eval
    "split_leakage_free",       # split + cross-split leakage join
    "dedup_keep_longest",       # per-cluster keep-policy window
    "dedup_simhash_hamming",    # pigeonhole-block Hamming join
    "join_bloom_pruned",        # bloom build + scan-side prune
    "dedup_verified_pairs",     # candidate verify (exact Jaccard)
    "exact_deciles",            # histogram-narrowed selection x9
    "winsorized_pricing",       # one-scan histogram winsorization
    "graph_reachability",       # capped BFS frontier expansion
    "trimmed_mean_exact",       # two-pass exact trimmed mean
    "conformal_interval",       # calibration-quantile interval
    "release_delta",            # round-8 flagship: 2-snapshot diff
    # Round-9 extension (same >= 1.5 s rule + the new flagship):
    "dedup_simhash",            # md5-nibble bit votes (5.3 s committed
                                # r8 under load vs 1.21 s quiet r7)
    "dedup_semantic",           # embedding-threshold near-dup
    "dedup_containment",        # asymmetric shingle containment
    "dedup_clusters",           # LSH -> connected components
    "graph_kcore_peel",         # iterative k-core peeling
    "release_delta_incremental",  # round-9 flagship: state + daily pass
    "runtime_filter_advisor",   # stats passes + constant verdicts
    # Round-9 completion sweep: every remaining query >= 1.5 s in the
    # round-9 QUIET baseline (BENCH_LOCAL_latest, reps=5, 4 full
    # passes) -- the tracker now covers the entire slow tail.
    "pagerank_candidates",      # capped power-iteration ranking
    "dup_span_fraction",        # span ledger + coverage fractions
    "sketch_quantile_hist",     # equi-width quantile sketch build
    "ann_recall_vs_probes",     # IVF nprobe sweep, one candidate pass
    "pq_adc_search",            # PQ asymmetric-distance search
    "ngram_novelty",            # first-occurrence trigram scan
    "mv_join_delta",            # incremental join-view maintenance
    "sketch_hll_cube",          # HLL registers x cube rollup
    "sketch_quantile_merge",    # mergeable quantile shards
    "snapshot_time_travel",     # 3 MERGE commits + VERSION AS OF reads
    "coreset_kcenter",          # greedy k-center passes
    "join_salted",              # salt-explode skew join
    "text_bigram_lm",           # bigram LM perplexity
    "dedup_source_matrix",      # cross-source duplicate matrix
    "orders_running_record",    # running-max record scan
    "encoding_advisor",         # per-column encoding sizing
    "dedup_incremental",        # band-store probe (batch-sized)
    "result_cache_serve",       # fingerprint + cache round trip
    "kmeans_2iter",             # 2 fixed Lloyd iterations
    # Round-10 completion (verdict task #5): the two >= 1.5 s quiet-
    # baseline names the round-9 sweep missed, plus the new capstone.
    "graph_degree_distribution",  # degree census over LSH pair graph
    "skyline_parts",            # iterative Pareto-front peeling
    "release_delta_day2",       # state evolution + day-2 pass
    "similarity_recall",        # ANN recall eval vs exact top-k truth
    # Round-11 addition: the r11 registration crossed 1.5 s in the
    # quiet baseline (per-process state memo makes min-over-reps the
    # health-probe cost itself -- count scans of the committed
    # stores, metadata-only at deploy).
    "store_health_report",      # store-set health over evolved state
    "local_supplier_revenue",   # 5-way star join (crossed 1.5 s r11)
    # Round-12 completion: the remaining names that hover at the
    # 1.5 s boundary under ambient load (each crossed it in at least
    # one quiet-methodology r12 artifact) -- tracked so the coverage
    # gate is robust to the boundary, not re-argued per round.
    "centroid_similarity_int8",  # int8 dot-product similarity scan
    "er_golden_record",         # survivorship merge over match graph
    "influence_diagnostics",    # leave-one-out OLS sufficient stats
    "pq_encode",                # PQ codebook assignment scan
    "token_weighted_median_len",  # weighted median via selector
    "winsorized_pricing_approx",  # approx-percentile winsorization
    "zorder_layout",            # z-order interleave + block stats
]


# Fourth decade (VERDICT r10 #4): the steepest top-decade exponents
# from the committed 3-point run (>= ~0.45 band) are exactly the
# curves whose curvature matters another decade up.  These re-measure
# at sf1 -- a local distribution-preserving bootstrap blow-up of
# sf0.1 (tools/gen_sf1.py; timing-grade, no oracle runs at sf1) --
# and get a 4-point fit plus the new top-decade (0.1 -> 1) exponent.
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.testdata_sf1")
SF1_QUERIES = [
    "winsorized_pricing",       # +0.74 top-decade in the 3-point run
    "k_anonymity_audit",        # +0.69
    "join_salted",              # +0.57
    "crossval_regression",      # +0.56
    "dup_span_fraction",        # +0.56
    "dedup_simhash_hamming",    # +0.49
    "dedup_simhash",            # +0.49
    "mv_join_delta",            # +0.48
    "text_bigram_lm",           # +0.46
    "exact_median_2pass",       # steepest 3-point fit (+0.30) besides
                                # the audits; selection must stay flat
    # Round-12 extension (VERDICT r11 #7): the dedup/graph families
    # whose bench paths were rerouted onto batch-window fragments in
    # r11 -- their sf1 exponents must track the STANDALONE cache-off
    # plans the driver grades (this harness never sets
    # SPARK_GRAFT_FRAGMENT_CACHE, so every point below is cache-off),
    # not the fragment probes the bench's warm passes serve.
    "dedup_containment",        # 3-subtree shingle containment join
    "dedup_verified_pairs",     # candidate verify (exact Jaccard)
    "dedup_lsh_recall",         # LSH candidates vs exact eval
    "dedup_prefix_filter_join",  # PPJoin prefix-filter join
    "graph_triangle_count",     # oriented triangle join over cop edges
    "graph_degree_distribution",  # degree census over cop edges
    "graph_kcore_peel",         # iterative k-core peeling
    "graph_communities_lpa",    # iterative label propagation
]

_SF1_MARK = "\n## Fourth decade (sf1)\n"


def run_sf1_section() -> str:
    """Measure the steep set at all four scales and return the
    markdown section (also printed per query)."""
    from mvp_mini_etl_pipeline_1762840347_spark.session import get_spark

    spark = get_spark()
    sfs = SFS + [1.0]
    dirs = dict(SF_DIRS)
    dirs[1.0] = SF1_DIR
    lines = [
        _SF1_MARK.strip() + "\n\n"
        "The steepest top-decade exponents from the 3-point table, "
        "re-measured with a FOURTH point at sf1 (6 M lineitem / 50 k "
        "documents): a deterministic blow-up of sf0.1 (`python "
        "tools/gen_sf1.py`, numpy seed 4242 -- relational tables "
        "row-sampled with replacement, keys renumbered, FKs rescaled "
        "so fan-out and skew shape survive; DOCUMENTS tiled as 10 "
        "replicas under a per-replica token bijection, so duplicate-"
        "GROUP sizes stay scale-free and dedup candidate load scales "
        "linearly, as in real corpora -- see gen_sf1.py; timing-grade "
        "only, the DuckDB oracle gate does not run at sf1).  All "
        "points are measured "
        "with the fragment cache OFF (this harness never sets "
        "SPARK_GRAFT_FRAGMENT_CACHE), so the exponents track the "
        "standalone plans the driver grades, not warm fragment "
        "probes.  `exp(4pt)` fits all four "
        "points; `exp@0.1->1` is the new top decade -- the one that "
        "says whether the 3-point steepness was curvature or "
        "fixed-cost amortization ending.\n\n"
        "| query | sf0.001 | sf0.01 | sf0.1 | sf1 | exp(4pt) "
        "| exp@0.1->1 |\n|---|---|---|---|---|---|---|\n"
    ]
    worst = 0.0
    for name in SF1_QUERIES:
        fn = plans.QUERIES[name]
        times = {}
        for sf in sfs:
            best = float("inf")
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, dirs[sf]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            times[sf] = best
        exp4 = fit_exponent(sfs, [times[sf] for sf in sfs])
        exp_top = math.log10(times[1.0] / times[0.1])
        worst = max(worst, exp_top)
        lines.append(
            f"| {name} | {times[0.001]:.2f} | {times[0.01]:.2f} | "
            f"{times[0.1]:.2f} | {times[1.0]:.2f} | {exp4:+.2f} | "
            f"{exp_top:+.2f} |\n"
        )
        print(
            f"{name:28s} "
            + " ".join(f"{times[sf]:6.2f}" for sf in sfs)
            + f"  exp4={exp4:+.2f} top={exp_top:+.2f}"
        )
    lines.append(
        f"\nWorst sf0.1 -> sf1 exponent this run: {worst:+.2f}.\n"
    )
    return "".join(lines)


def update_sf1_section() -> None:
    """Re-measure only the fourth-decade set and splice the section
    into SCALING.md, leaving the 3-point table untouched."""
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    section = run_sf1_section()
    with open(out) as f:
        body = f.read()
    if _SF1_MARK in body:
        body = body[: body.index(_SF1_MARK)]
    with open(out, "w") as f:
        f.write(body.rstrip("\n") + "\n" + section)
    print(f"updated sf1 section of {out}")


def check_tail_coverage(bench_path: str) -> list[str]:
    """Names >= 1.5 s at sf0.1 in a QUIET committed bench artifact
    (full_passes >= 2) that the tracker above misses.  Enforced by
    tests/test_docs.py so the 'tracker covers the whole slow tail'
    claim stays true by construction; single-pass (load-degraded)
    artifacts are not a baseline and impose no requirement."""
    import json

    try:
        with open(bench_path) as f:
            bench = json.load(f)
    except OSError:
        return []
    if bench.get("full_passes", 1) < 2 or bench.get("sf") != 0.1:
        return []
    tracked = set(QUERIES)
    return sorted(
        name
        for name, sec in bench.get("queries", {}).items()
        if sec >= 1.5 and name not in tracked
    )


def fit_exponent(xs: list[float], ys: list[float]) -> float:
    """Least-squares slope of log y on log x."""
    lx = [math.log10(x) for x in xs]
    ly = [math.log10(y) for y in ys]
    n = len(lx)
    mx = sum(lx) / n
    my = sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den


def main() -> None:
    spark = get_spark()
    rows = []
    for name in QUERIES:
        fn = plans.QUERIES[name]
        times = {}
        for sf in SFS:
            best = float("inf")
            for _ in range(REPS):
                t0 = time.time()
                fn(spark, SF_DIRS[sf]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            times[sf] = best
        exp = fit_exponent(SFS, [times[sf] for sf in SFS])
        # exponent over the top decade only: the 0.001 point is pure
        # scheduler floor for most queries, which biases the 3-point
        # fit low; the 0.01 -> 0.1 step is the telling one.
        exp_top = math.log10(times[0.1] / times[0.01])
        rows.append((name, times, exp, exp_top))
        print(
            f"{name:28s} "
            + " ".join(f"{times[sf]:6.2f}" for sf in SFS)
            + f"  exp={exp:+.2f} top={exp_top:+.2f}"
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    with open(out, "w") as f:
        f.write(
            "# SCALING — measured growth curves (local[32])\n\n"
            "Generated by `python tools/bench_scaling.py` "
            f"(min of {REPS} reps per point).\n\n"
            "Wall seconds at sf=0.001 / 0.01 / 0.1 (10x data per "
            "step), with the fitted log-log growth exponent over all "
            "three points (`exp`) and over the top decade only "
            "(`exp@0.01->0.1` -- the telling one: the smallest scale "
            "is scheduler floor for most queries). Interpretation: "
            "exp near 0 = fixed-overhead dominated; near 1 = linear "
            "in data; **> ~1.2 sustained = the red flag** (cost "
            "growing faster than input). Local caveats: single-file "
            "parquet inputs serialize scans until the first "
            "repartition, and times under ~0.5 s sit on the job-"
            "scheduling floor, so small exponents at the low end "
            "are expected.\n\n"
            "| query | sf0.001 | sf0.01 | sf0.1 | exp | exp@0.01->0.1 |\n"
            "|---|---|---|---|---|---|\n"
        )
        for name, times, exp, exp_top in rows:
            f.write(
                f"| {name} | {times[0.001]:.2f} | {times[0.01]:.2f} | "
                f"{times[0.1]:.2f} | {exp:+.2f} | {exp_top:+.2f} |\n"
            )
        hot = [(n, t) for n, _, _, t in rows if t > 1.0]
        if hot:
            f.write(
                "\nTop-decade exponents above 1 worth watching: "
                + ", ".join(f"`{n}` ({t:+.2f})" for n, t in sorted(hot, key=lambda x: -x[1]))
                + ".\n"
            )
        else:
            f.write(
                "\nNo query exceeds a top-decade exponent of 1.0: every "
                "measured operator currently grows sublinearly in data "
                "size on this harness (fixed overheads still dominate "
                "at these scales, which is itself the evidence that no "
                "quadratic shape is hiding in the plans).\n"
            )
    print(f"wrote {out}")


if __name__ == "__main__":
    if "--sf1-only" in sys.argv:
        update_sf1_section()
    else:
        main()
