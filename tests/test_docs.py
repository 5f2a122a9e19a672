"""Documentation-integrity gates (no Spark needed)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)


def test_reference_citations_resolve_by_content():
    """Every `file.js:N[-M]` reference cite resolves to a real file,
    stays inside its line range, and matches by content (identifier
    overlap with the citing context, or a hand-checked _PROSE_OK
    entry) -- the round-9 stale-span finding, kept fixed by tooling
    (tools/cite_check.py)."""
    from cite_check import sweep

    assert sweep() == []


def test_scaling_tracker_covers_slow_tail():
    """Every query >= 1.5 s at sf0.1 in the committed quiet bench
    baseline must have a SCALING.md growth-curve row (verdict r9 task:
    asserted by tooling, not prose).  Load-degraded single-pass
    artifacts impose no requirement (they are not a baseline)."""
    from bench_scaling import check_tail_coverage

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    missing = check_tail_coverage(
        os.path.join(repo, "BENCH_LOCAL_latest.json")
    )
    assert missing == [], f"slow-tail queries missing from tracker: {missing}"
