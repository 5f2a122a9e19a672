"""Round-10 capstone: state EVOLUTION (release_delta_day2).

Day 1's store deltas are committed back into the SnapshotTable stores
and day 2 runs against the EVOLVED state.  Contracts:
  1. evolution == rebuild: every evolved store table is row-equal to
     a from-scratch state build over snapshot v1.5 (buckets 0-12,14);
  2. the day-2 pass touches document text only through the handed-in
     bucket-15 batch (zero corpus text scans when pre-materialized);
  3. the evolution really committed: each store table gained a new
     snapshot and the pointer moved (day 2 reads snapshot-1+);
  4. day-2 result == the same pass run against a REBUILT v1.5 state
     (end-to-end evolve-vs-rebuild agreement).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark import plans
from mvp_mini_etl_pipeline_1762840347_spark.io import read_table
from mvp_mini_etl_pipeline_1762840347_spark.plans.quality import (
    _curation_state,
    _day1_evolved_state,
    _ib_of,
    _never,
    _new_day2,
    _release_delta_incremental_pass,
)

SF = "/root/testdata/sf0.001"

_STATE_TABLES = (
    "ledger",
    "bands",
    "pairs",
    "comps",
    "doc_sh",
    "inv_idx",
    "eval_sh",
)


def _rows(df):
    return sorted(
        tuple(x if not isinstance(x, list) else tuple(x) for x in r)
        for r in df.collect()
    )


def _v15_member(c):
    ib = _ib_of(c)
    return (ib != 13) & (ib != 15)


def _rebuilt_v15(spark):
    return _curation_state(spark, SF, "v15_rebuild_test", _v15_member)


def test_evolution_equals_rebuild_per_table(spark):
    """The headline pin: every evolved store table is row-identical to
    the same table built from scratch over snapshot v1.5."""
    evolved = _day1_evolved_state(spark, SF)
    rebuilt = _rebuilt_v15(spark)
    for name in _STATE_TABLES:
        assert _rows(evolved[name]) == _rows(rebuilt[name]), name


def test_day2_pass_reads_no_corpus_text(spark):
    """Cost pin: with the bucket-15 batch pre-materialized, the day-2
    plan reads ONLY persisted (evolved) state parquet -- zero scans of
    the documents table."""
    evolved = _day1_evolved_state(spark, SF)
    batch2 = (
        read_table(spark, SF, "documents")
        .filter(_new_day2(F.col("doc_id")))
        .localCheckpoint()
    )
    out = _release_delta_incremental_pass(
        spark, evolved, batch2, removed_of=_never, is_new_of=_new_day2
    )
    out.collect()
    final = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "documents.parquet" not in final, (
        "day-2 pass must read evolved state, never corpus text"
    )


def test_evolution_committed_new_snapshots(spark):
    """The evolved tables are NEW SnapshotTable commits of the SAME
    stores day 1 used: each table's live pointer names a snapshot
    beyond snapshot-0, and the evolved frames read from it."""
    import os

    evolved = _day1_evolved_state(spark, SF)
    root = evolved["_root"]
    for name in _STATE_TABLES:
        with open(os.path.join(root, name, "_CURRENT")) as f:
            live = f.read().strip()
        assert int(live.split("-", 1)[1]) >= 1, (name, live)
        (path,) = {
            os.path.dirname(f["file_path"])
            for f in evolved[name]
            .select(F.input_file_name().alias("file_path"))
            .collect()
        }
        assert live in path, (name, live, path)


def test_day2_evolved_equals_day2_rebuilt(spark):
    """End-to-end: the registered day-2 query (evolved state) returns
    the same rows as the identical pass against a rebuilt v1.5 state
    -- and both match the from-scratch v1.5 -> v2 diff semantics the
    DuckDB oracle pins at the driver gate."""
    via_evolved = _rows(plans.QUERIES["release_delta_day2"](spark, SF))
    batch2 = read_table(spark, SF, "documents").filter(
        _new_day2(F.col("doc_id"))
    )
    via_rebuilt = _rows(
        _release_delta_incremental_pass(
            spark,
            _rebuilt_v15(spark),
            batch2,
            removed_of=_never,
            is_new_of=_new_day2,
        )
    )
    assert via_evolved == via_rebuilt
