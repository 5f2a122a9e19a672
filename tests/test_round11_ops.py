"""Round-11 pins: store-set transaction maintenance.

  1. vacuum INSIDE the streaming twin's cadence -- history expired
     between micro-batches (keep_last=1 after batch 0), then batch 1
     still evolves correctly from the vacuumed state, and a replay of
     batch 1 after another vacuum is still a no-op (the manifest, not
     the expired history, is the replay guard);
  2. store_health_report's vacuum recommendation matches what
     SnapshotSet.vacuum(keep_last=1) ACTUALLY reclaims, table by
     table, and the post-vacuum report goes quiet ("ok");
  3. set-level restore: rollback to the pre-evolution manifest serves
     yesterday's consistent set, roll-forward serves today's.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mvp_mini_etl_pipeline_1762840347_spark.io import read_table
from mvp_mini_etl_pipeline_1762840347_spark.operators.table_format import (
    SnapshotSet,
)
from mvp_mini_etl_pipeline_1762840347_spark.plans.quality import (
    STORE_TABLES,
    _curation_state,
    _evolve_state,
    _ib_of,
    _incremental_day_frames,
    _new_day1,
    _new_day2,
    _rm_day1,
    _store_health_frame,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        tuple(x if not isinstance(x, list) else tuple(x) for x in r)
        for r in df.collect()
    )


def test_vacuum_between_micro_batches(spark):
    """The compaction cadence a continuous pipeline actually runs:
    expire history after EVERY batch, keep evolving.  Vacuum after
    batch 0 (keep_last=1), batch 1 evolves from the vacuumed state,
    and the final ledger still equals a from-scratch v2 build; a
    post-vacuum replay of batch 1 is still a no-op because the replay
    guard is the live manifest, which vacuum never touches."""
    from mvp_mini_etl_pipeline_1762840347_spark.streaming import jobs

    docs = read_table(spark, SF, "documents")
    state = _curation_state(
        spark, SF, "v1_vacuum_cadence_test", lambda c: _ib_of(c) < 14
    )
    root = state["_root"]
    box = {"state": state}

    assert jobs.release_delta_incremental_step(
        spark,
        docs.filter(_new_day1(F.col("doc_id"))).localCheckpoint(),
        0,
        box,
        removed_of=_rm_day1,
    )
    removed = SnapshotSet(spark, root).vacuum(keep_last=1)
    assert removed.get("_manifests") == ["manifest-0"]
    assert not os.path.exists(os.path.join(root, "ledger", "snapshot-0"))

    batch2 = docs.filter(_new_day2(F.col("doc_id"))).localCheckpoint()
    assert jobs.release_delta_incremental_step(spark, batch2, 1, box)
    v2 = _curation_state(
        spark, SF, "v2_vacuum_cadence_rebuild", lambda c: _ib_of(c) != 13
    )
    assert _rows(box["state"]["ledger"]) == _rows(v2["ledger"])

    # vacuum again, then replay batch 1: still a no-op, state intact
    SnapshotSet(spark, root).vacuum(keep_last=1)
    diff = _rows(jobs.release_diff_table(spark, root))
    assert not jobs.release_delta_incremental_step(spark, batch2, 1, box)
    assert _rows(box["state"]["ledger"]) == _rows(v2["ledger"])
    assert _rows(jobs.release_diff_table(spark, root)) == diff


def test_store_health_vacuum_recommendation_is_real(spark):
    """store_health_report's reclaim numbers are not narrative: per
    table, reclaimable_snapshots equals exactly how many snapshot
    directories SnapshotSet.vacuum(keep_last=1) then removes, and the
    post-vacuum report flips to zero reclaimable / 'ok'."""
    state = _curation_state(
        spark, SF, "v1_health_test", lambda c: _ib_of(c) < 14
    )
    batch1 = read_table(spark, SF, "documents").filter(
        _new_day1(F.col("doc_id"))
    )
    frames = _incremental_day_frames(
        spark, state, batch1, removed_of=_rm_day1, is_new_of=_new_day1
    )
    evolved = _evolve_state(spark, state, frames, _rm_day1)
    root = evolved["_root"]

    health = {r["table_name"]: r for r in _store_health_frame(
        spark, root
    ).collect()}
    assert set(health) == set(STORE_TABLES)
    for name, r in health.items():
        assert r["n_snapshots"] == 2, name
        assert r["reclaimable_snapshots"] == 1, name
        assert r["recommend"] == "vacuum:expire-superseded", name

    removed = SnapshotSet(spark, root).vacuum(keep_last=1)
    removed.pop("_manifests")
    assert {n: len(v) for n, v in removed.items()} == {
        n: health[n]["reclaimable_snapshots"] for n in STORE_TABLES
    }

    after = {r["table_name"]: r for r in _store_health_frame(
        spark, root
    ).collect()}
    for name, r in after.items():
        assert r["n_snapshots"] == 1, name
        assert r["reclaimable_snapshots"] == 0, name
        assert r["recommend"] == "ok", name
        # history expired: churn reads as zero against the only
        # retained version
        assert r["rows_delta"] == 0, name
        assert r["live_rows"] == health[name]["live_rows"], name


def test_set_level_restore_round_trip(spark):
    """Set-level rollback: restore(0) serves yesterday's CONSISTENT
    set across every member; restore back serves the evolved one."""
    state = _curation_state(
        spark, SF, "v1_restore_test", lambda c: _ib_of(c) < 14
    )
    batch1 = read_table(spark, SF, "documents").filter(
        _new_day1(F.col("doc_id"))
    )
    frames = _incremental_day_frames(
        spark, state, batch1, removed_of=_rm_day1, is_new_of=_new_day1
    )
    evolved = _evolve_state(spark, state, frames, _rm_day1)
    root = evolved["_root"]

    before = {n: _rows(state[n]) for n in ("ledger", "eval_sh")}
    after = {n: _rows(evolved[n]) for n in ("ledger", "eval_sh")}
    assert before["ledger"] != after["ledger"]

    sset = SnapshotSet(spark, root)
    sset.restore(0)
    for n, want in before.items():
        assert _rows(sset.read(n)) == want, n
    # member _CURRENT pointers follow the manifest (derived state)
    with open(os.path.join(root, "ledger", "_CURRENT")) as f:
        assert f.read().strip() == "snapshot-0"
    sset.restore(1)
    for n, want in after.items():
        assert _rows(sset.read(n)) == want, n
