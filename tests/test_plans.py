"""Physical-plan audit over the registered query surface.

Correctness is the oracle gate's job; these tests pin the *plan
shapes* that make the engine scale -- the properties that would
silently regress if an edit pushed work into Python, broke pushdown,
or un-broadcast a dimension join."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# Queries allowed to run Python (the sanctioned Arrow escape hatch
# for the multimodal decode plumbing).
# Queries sanctioned to run Arrow-batched Python: per-row binary
# construction/parsing that DataFrame builtins cannot express.
ARROW_ALLOWED = {
    "multimodal_features",
    "multimodal_decode",
    "multimodal_resize",
    "multimodal_pixels",
    "multimodal_audio_features",
}


def _plan(spark, name: str) -> str:
    df = entrymod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    import contextlib
    import io

    df = entrymod.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_row_at_a_time_python_anywhere(spark):
    """Engine-wide invariant: no BatchEvalPython (per-row Python UDF)
    in ANY registered query; Arrow-batched Python only where
    explicitly sanctioned."""
    for name in entrymod.queries():
        plan = _plan(spark, name)
        assert "BatchEvalPython" not in plan, f"{name} runs per-row Python"
        if name not in ARROW_ALLOWED:
            for marker in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
                assert marker not in plan, f"{name} unexpectedly runs Python ({marker})"


def test_systematic_sample_has_no_global_window(spark):
    """sample_systematic must stay a narrow modulo filter: no Window
    node and no single-partition Exchange (the former global
    row_number serialized the table through one reducer)."""
    plan = _plan(spark, "sample_systematic")
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_multimodal_checksums_stays_jvm_side(spark):
    """sha256 checksums must run as codegen'd F.sha2, never through
    the Python/Arrow path (that path lives in multimodal_features)."""
    plan = _plan(spark, "multimodal_checksums")
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan, plan


def test_predicate_pushdown_reaches_scan(spark):
    plan = _plan(spark, "top_unshipped_revenue")
    # the shipdate filter must appear in the lineitem scan's
    # PushedFilters, not as a post-scan Filter only
    assert "PushedFilters:" in plan
    scan = [ln for ln in plan.splitlines() if "lineitem" in ln]
    assert any("l_shipdate" in ln and "PushedFilters" in ln for ln in scan), scan


def test_column_pruning(spark):
    plan = _plan(spark, "order_fulfillment")
    li_scans = [ln for ln in plan.splitlines() if "lineitem" in ln and "ReadSchema" in ln]
    assert li_scans
    # lineitem has 11 columns; this query needs 3
    schema = li_scans[0].split("ReadSchema:", 1)[1]
    assert "l_returnflag" not in schema and "l_shipdate" not in schema, schema
    for needed in ("l_orderkey", "l_quantity", "l_extendedprice"):
        assert needed in schema, schema


def test_dimension_joins_broadcast(spark):
    for name in ("top_return_customers", "local_supplier_revenue"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"
        assert "CartesianProduct" not in plan, name


def test_whole_stage_codegen_on_hot_path(spark):
    # AQE finalizes (and codegen-annotates) the plan only on
    # execution, so run the query first and inspect the final plan
    df = entrymod.queries()["groupby_pricing"](spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # codegen'd operators print with a *(n) stage marker
    assert "*(" in plan, plan


def test_point_lookup_pushes_key(spark):
    """The loose string equality alone would hide the key from
    parquet pushdown; the typed conjunct must reach PushedFilters as
    an EqualTo on the key."""
    plan = _formatted(spark, "point_lookup")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("EqualTo(o_orderkey,42)" in ln for ln in pushed), pushed


def test_no_cartesian_products_anywhere(spark):
    """Range joins use BroadcastNestedLoop (band side broadcast);
    nothing in the surface should ever plan an un-broadcast cartesian
    product."""
    for name in entrymod.queries():
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_plan_features_match_committed_audit(spark):
    """Plan-shape regression guard: the live exchange / join-strategy /
    python counts per query must match the committed PLAN_AUDIT.md.
    An edit that adds a shuffle, drops a broadcast, or pushes work
    into Python fails here instead of surfacing as a silent slowdown.
    (Regenerate with `python tools/plan_audit.py` when a change is
    intentional.)"""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
    )
    from plan_audit import audit

    committed = {}
    with open("PLAN_AUDIT.md") as f:
        for line in f:
            if line.startswith("| ") and not line.startswith("| query"):
                cells = [c.strip() for c in line.strip().strip("|").split("|")]
                if len(cells) == 8:
                    committed[cells[0]] = cells[1:]
    live = audit(spark, SF)
    assert committed, "PLAN_AUDIT.md has no rows"
    mismatches = []
    for row in live:
        if len(row) == 2:
            mismatches.append((row[0], "ERROR", row[1]))
            continue
        name, c, pushed = row
        got = [
            str(c["exchanges"]),
            str(c["broadcast_joins"]),
            str(c["sortmerge_joins"]),
            str(c["bnl_joins"]),
            str(c["windows"]),
            str(c["python"]) if c["python"] else "-",
            pushed,
        ]
        want = committed.get(name)
        if want is None:
            mismatches.append((name, "missing from PLAN_AUDIT.md", got))
        elif got != want:
            mismatches.append((name, want, got))
    assert not mismatches, mismatches


def test_kmv_by_group_keeps_bottom_k_map_side(spark):
    """sketch_kmv_by_group's rank filter must plan as WindowGroupLimit
    (per-task bottom-K before the shuffle) -- the property that keeps
    the exchange at <= K rows per (group, partition) however large
    the corpus."""
    assert "WindowGroupLimit" in _plan(spark, "sketch_kmv_by_group")


def test_bloom_pruned_join_filters_at_the_scan(spark):
    """join_bloom_pruned's point is sideways information passing: the
    might-contain conjunction must sit BEFORE the dim equi-join in
    the physical plan (fact rows die at the scan stage), and the
    verifying join must be a broadcast."""
    plan = _plan(spark, "join_bloom_pruned")
    filter_pos = plan.find("bitand")
    if filter_pos < 0:
        filter_pos = plan.find("&")
    join_pos = plan.find("BroadcastHashJoin")
    assert filter_pos >= 0, "bloom might-contain filter missing"
    assert join_pos >= 0, "verifying broadcast join missing"
    # Spark prints operators top-down (output first), so the
    # downstream join appears BEFORE the scan-side filter text.
    assert join_pos < filter_pos, "bloom filter not below the join"


def test_pq_adc_search_scan_budget(spark):
    """The trained codebook is checkpointed once, so ADC serving must
    not re-derive the training chain per consumer: at most 2 full +
    3 key-pruned corpus scans (was 8 before the checkpoint)."""
    plan = _plan(spark, "pq_adc_search")
    assert plan.count("embeddings.parquet") <= 5


def test_ngram_novelty_tokenizes_corpus_once(spark):
    """First-occurrence marking is a min-over-window on the trigram,
    not a groupBy + join-back -- the corpus must be scanned and
    trigram-exploded exactly once."""
    assert _plan(spark, "ngram_novelty").count("documents.parquet") == 1


def test_vocab_coverage_joins_vocab_broadcast(spark):
    """The top-K vocabulary is tiny by construction; membership must
    be a broadcast join, and the corpus must collapse to (source,
    token) partials tokenized exactly once: the shared partial-count
    frame is checkpointed, so the serving plan re-reads the
    materialized partials (ExistingRDD), never documents.parquet."""
    plan = _plan(spark, "vocab_coverage")
    assert "BroadcastHashJoin" in plan
    assert plan.count("documents.parquet") == 0
    assert plan.count("Scan ExistingRDD") == 2


def test_sample_neyman_rank_is_group_limited(spark):
    """The per-stratum hash rank filters on the literal budget, which
    must compile to WindowGroupLimit (map-side bounded top-K, no
    stratum-sized sort)."""
    assert "WindowGroupLimit" in _plan(spark, "sample_neyman")


def test_spacesaving_compression_is_group_limited(spark):
    """mg_shard_compress's rank filter must compile to WindowGroupLimit
    (per-shard top-(k+1) selected map-side, no shard-sized sort) --
    the property that keeps the summary build bounded however large
    the token stream."""
    assert "WindowGroupLimit" in _plan(spark, "sketch_spacesaving_merge")
