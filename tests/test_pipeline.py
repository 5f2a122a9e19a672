"""Golden end-to-end pipeline test (SURVEY §5.3): extract(fixture) ->
transform -> load over the reference-derived fallback rows, asserting
the exact metrics record the reference's buildMetrics implies
(FIXTURES.md §A1: rows_in=3, rows_out=2, dedup_removed=1,
countries=3, last_record='Bob Johnson')."""

from __future__ import annotations

import csv
import glob

from mvp_mini_etl_pipeline_1762840347_spark.pipeline.runner import (
    build_metrics,
    run_pipeline,
)
from mvp_mini_etl_pipeline_1762840347_spark.pipeline.sinks import (
    preview_json,
    users_export_projection,
    write_csv,
)
from mvp_mini_etl_pipeline_1762840347_spark.pipeline.sources import (
    ExtractResult,
    fallback_users_df,
)


def _fixture_extract(spark):
    return ExtractResult(fallback_users_df(spark), True, "fixture://users", "t0")


def test_metrics_golden(spark):
    m = build_metrics(fallback_users_df(spark))
    assert m["rows_in"] == 3
    assert m["rows_out"] == 2  # Bob Johnson: valid=false AND email=''
    assert m["dedup_removed"] == 1
    assert m["countries"] == 3  # US, GB, FR
    assert m["last_record"] == "Bob Johnson"


def test_run_pipeline_stages_and_log(spark, tmp_path):
    run = run_pipeline(spark, out_dir=str(tmp_path), extract_fn=_fixture_extract)
    assert run.stages == {"extract": "done", "transform": "done", "load": "done"}
    assert run.fallback_used is True
    assert run.metrics["rows_out"] == 2
    assert run.metrics["duration_sec"] > 0
    stages_logged = [s for _, s, _ in run.log]
    assert stages_logged == ["Extract", "Transform", "Load"]
    assert "Fetched 3 records" in run.log[0][2]
    # restart (ST3) is idempotent
    rerun = run_pipeline(spark, out_dir=str(tmp_path), extract_fn=_fixture_extract)
    assert rerun.metrics["rows_out"] == run.metrics["rows_out"]


def test_csv_export_quoting(spark, tmp_path):
    """K1: quote-all, '' for null, location as "city, country"."""
    out = write_csv(
        users_export_projection(fallback_users_df(spark)),
        str(tmp_path),
        stamped=False,
    )
    files = glob.glob(f"{out}/*.csv")
    assert files
    text = "".join(open(f).read() for f in sorted(files))
    assert '"id","name","email","phone","location","age","gender","country"' in text
    assert '"New York, US"' in text  # formatted location column
    assert '""' in text  # empty email / gender cells stay quoted-empty
    rows = list(csv.DictReader(text.splitlines()))
    assert {r["name"] for r in rows} >= {"John Doe", "Jane Smith"}


def test_preview_json(spark):
    previews = preview_json(fallback_users_df(spark), n=2)
    assert len(previews) == 2
    assert '"name":"John Doe"' in previews[0]


# ---------------------------------------------------------------------------
# S4: launches failover chain (reference spacex.js:51-65,82-115)
# ---------------------------------------------------------------------------
def test_launches_fallback_golden(spark):
    from mvp_mini_etl_pipeline_1762840347_spark.pipeline.sources import (
        build_launch_metrics,
        fallback_launches_df,
        load_launches,
    )

    # Unreachable base URL -> both endpoints fail soft -> S4 fallback.
    ext = load_launches(spark, base_url="http://127.0.0.1:1/nope", timeout=0.2)
    assert ext.fallback_used is True
    rows = ext.df.orderBy("ingest_idx").collect()
    assert [r.name for r in rows] == [
        "Demo Mission Alpha", "Demo Mission Beta", "Demo Mission Gamma",
    ]
    assert [r.success for r in rows] == [True, False, False]
    assert [r.upcoming for r in rows] == [False, False, True]
    assert all(r.payloads == [] for r in rows)

    # buildMetrics golden values over the demo rows (spacex.js:67-80).
    m = build_launch_metrics(fallback_launches_df(spark))
    assert m["rows_in"] == 3
    assert m["rows_out"] == 1          # only Alpha succeeded
    assert m["dedup_removed"] == 2
    assert m["upcoming"] == 1
    assert m["last_mission"] == "Demo Mission Gamma"


def test_launch_metrics_empty_input(spark):
    from mvp_mini_etl_pipeline_1762840347_spark.pipeline.sources import (
        build_launch_metrics,
        fallback_launches_df,
    )

    empty = fallback_launches_df(spark).filter("ingest_idx < 0")
    m = build_launch_metrics(empty)
    assert m["rows_in"] == 0
    assert m["last_mission"] == "N/A"
