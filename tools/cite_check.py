"""Reference-citation sweep: every `file.js:N[-M]` cite in the repo
must (a) resolve to a real file under /root/reference, (b) stay inside
the file's line range, and (c) match by CONTENT -- the cited span must
share at least one identifier with the citing context, so a cite that
drifted to the wrong lines (round-9 finding: a users.js:31-46 cite for
code living at :69) fails even though the path exists.

Content rule: from the 2 lines around the cite in OUR source, collect
identifier tokens (>= 4 chars, not English glue words); the cited span
(plus 2 lines of slack each side) must contain one of them, case-
insensitively.  Cites whose surrounding prose is purely descriptive
(no identifier the reference also uses) are listed in _PROSE_OK with
the reason -- additions require the span to have been hand-checked.

Run: python tools/cite_check.py   (exit 1 + report on any failure)
Also invoked by tests/test_docs.py so the sweep stays true.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# Any path-ish .js/.json token is treated as a reference cite: this
# repo has no JavaScript of its own, so every such mention points (or
# claims to point) at /root/reference.  Unprefixed forms like
# "users.js:31" or "lib/transform.js" are resolved against the
# reference layout below -- the round-10 review found dead cites the
# earlier prefix-anchored regex silently skipped.
_CITE = re.compile(
    r"(?P<file>[\w\[\].-]+(?:/[\w\[\].-]+)*\.(?:json|js)(?!\w))"
    r"(?::(?P<a>\d+)(?:-(?P<b>\d+))?)?"
)

# Search roots for unprefixed cites, most specific first.
_RESOLVE_PREFIXES = ("", "src/", "src/lib/", "src/mock-data/", "pages/")

# Documentation placeholders that merely DESCRIBE the cite syntax.
_NOT_CITES = {"file.js"}


def _is_cite_candidate(token: str) -> bool:
    """False for matches that are not reference cites: relative/dotted
    Python module refs (`..functions.js`, `pkg.functions.js`), API
    chains (`spark.read.json`), our own committed artifacts
    (`CORRECTNESS_r07.json`), and syntax placeholders."""
    if token in _NOT_CITES:
        return False
    if token.startswith(".") or ".." in token:
        return False
    base = token.rsplit("/", 1)[-1]
    if "." in base.rsplit(".", 1)[0]:  # dotted module/API ref
        return False
    if os.path.exists(os.path.join(REPO, token)):  # self artifact
        return False
    return True
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]{3,}")

# English glue / our own jargon that must not count as content overlap.
_STOP = {
    "reference", "lines", "line", "from", "with", "that", "this",
    "the", "shape", "semantics", "behavior", "behaviour", "pattern",
    "same", "exactly", "equivalent", "spark", "duckdb", "oracle",
    "scale", "deploy", "pipeline", "table", "query", "plan", "which",
    "every", "over", "into", "only", "each", "when", "then", "else",
    "survey", "generalizes", "grown", "idea", "demo", "page", "level",
    "field", "fields", "record", "records", "rows", "columns", "their",
    "where", "those", "these", "they", "them", "there", "here",
}

# (file, a, b) spans hand-checked as correct although the surrounding
# prose shares no identifier with the span (purely descriptive cites).
# Each entry notes WHAT the span contains (re-checked round 10).
_PROSE_OK: set[tuple[str, int, int]] = {
    # non-empty guard: `if (!allLaunches.length) throw`
    ("src/lib/spacex.js", 18, 20),
    # union-as-concat: spread of past + upcoming launch arrays
    ("src/lib/spacex.js", 16, 16),
    # lookup joins: rockets/launchpads `.find(r => r.id === ...)`
    ("src/lib/spacex.js", 24, 25),
    # tail limit: `enriched.slice(-150)`
    ("src/lib/spacex.js", 40, 40),
    # multi-endpoint Promise.all, per-endpoint `.catch(() => [])`
    ("src/lib/spacex.js", 7, 13),
    # `rocket.name ... || 'Unknown'` JS-falsy default
    ("src/lib/spacex.js", 32, 32),
    # head limit: `users.slice(0, 20)`
    ("pages/index.js", 229, 229),
    # CSV quoting: formatCsvValue null->'' and `"`-doubling
    ("pages/index.js", 426, 430),
    # `user.nat || user.location?.country` falsy default
    ("pages/index.js", 117, 117),
    # setTimeout-driven stage state machine pending->active->done
    ("pages/index.js", 38, 78),
    ("pages/index.js", 45, 78),
    # timestamp render: `new Date(launch.date_utc).toLocaleString()`
    ("pages/analytics.js", 32, 32),
    # per-request full recompute: `loadUsers(true)` + `buildMetrics`
    ("pages/api/etl/restart.js", 11, 12),
    # static fallback datasets: fallbackUsers() / fallbackLaunches()
    ("src/lib/users.js", 81, 111),
    ("src/lib/spacex.js", 82, 115),
}


def _ref_lines(relpath: str) -> tuple[str, list[str]] | None:
    """(canonical relpath, lines) for a cite, trying each resolve
    prefix; None if the cite matches no reference file."""
    for prefix in _RESOLVE_PREFIXES:
        path = os.path.join(REF, prefix + relpath)
        try:
            with open(path, encoding="utf-8", errors="replace") as f:
                return prefix + relpath, f.read().splitlines()
        except OSError:
            continue
    return None


def sweep() -> list[str]:
    failures: list[str] = []
    ref_cache: dict[str, list[str] | None] = {}
    for dirpath, dirnames, filenames in os.walk(REPO):
        dirnames[:] = [
            d for d in dirnames
            if d not in {".git", "__pycache__", "spark-warehouse", ".claude"}
        ]
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, REPO)
            if rel.startswith("tools/cite_check"):
                continue
            with open(path, encoding="utf-8") as f:
                lines = f.read().splitlines()
            for i, line in enumerate(lines):
                for m in _CITE.finditer(line):
                    relref = m.group("file")
                    if not _is_cite_candidate(relref):
                        continue
                    if relref not in ref_cache:
                        ref_cache[relref] = _ref_lines(relref)
                    resolved = ref_cache[relref]
                    where = f"{rel}:{i + 1}"
                    if resolved is None:
                        failures.append(
                            f"{where}: cites missing file {relref}"
                        )
                        continue
                    canon, ref = resolved
                    if m.group("a") is None:
                        continue  # whole-file cite: existence is enough
                    a = int(m.group("a"))
                    b = int(m.group("b") or a)
                    if not (1 <= a <= b <= len(ref)):
                        failures.append(
                            f"{where}: {relref}:{a}-{b} outside 1-{len(ref)}"
                        )
                        continue
                    if (canon, a, b) in _PROSE_OK:
                        continue
                    ctx = " ".join(lines[max(0, i - 2): i + 3]).lower()
                    toks = {
                        t.lower()
                        for t in _IDENT.findall(ctx)
                    } - _STOP
                    span = " ".join(
                        ref[max(0, a - 3): min(len(ref), b + 2)]
                    ).lower()
                    span_toks = {
                        t.lower() for t in _IDENT.findall(span)
                    }
                    if not (toks & span_toks):
                        failures.append(
                            f"{where}: {relref}:{a}-{b} shares no "
                            f"identifier with the cited span"
                        )
    return failures


if __name__ == "__main__":
    fails = sweep()
    for f in fails:
        print(f)
    print(f"cite_check: {'FAIL' if fails else 'OK'} ({len(fails)} bad cites)")
    sys.exit(1 if fails else 0)
