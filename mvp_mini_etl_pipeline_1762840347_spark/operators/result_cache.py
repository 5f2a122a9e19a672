"""Content-addressed query-result cache.

A scheduled pipeline re-runs the same queries against tables that
usually have NOT changed since the last run.  Timestamp-based
invalidation lies in both directions (a rewritten file with equal
content invalidates; a same-mtime overwrite doesn't), so this cache
keys each result on the CONTENT FINGERPRINTS of its input tables
(plans/warehouse.py::fingerprint_frame -- order-independent
commutative reductions): a hit requires every input's
(n_rows, sum_fp, xor_fp) triple to match what the cached result was
computed from.

Cost model at scale: validating a hit costs one fingerprint scan per
input (a count + two constant-state reductions -- the cheapest
possible full-content pass, and far cheaper than the join/agg
pipelines it guards); a production deployment amortizes even that by
reading the fingerprint the ingest job (or its streaming maintainer,
streaming/jobs.py::fingerprint_stream) already persisted, making
validation zero-scan.  The cached result itself is parquet -- the
store is just a directory, safe to vacuum.

Write protocol: result parquet lands in a staging directory first and
the manifest (the fingerprint key) is written LAST via atomic rename,
so a crash mid-write leaves garbage that can never validate -- the
same torn-write discipline as operators/table_format.py.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..plans.warehouse import fingerprint_frame


def _fingerprints(inputs: dict[str, tuple[DataFrame, tuple]]) -> dict:
    out = {}
    for name, (df, cols) in sorted(inputs.items()):
        r = fingerprint_frame(df, cols).first()
        out[name] = [int(r.n_rows), int(r.sum_fp), int(r.xor_fp)]
    return out


class ResultCache:
    """Directory-backed result cache keyed on input-table content.

    ``get_or_compute(name, inputs, compute)`` returns the cached
    DataFrame when every input fingerprint matches the manifest, else
    runs ``compute()``, persists its result, and records the
    fingerprints it was derived from.  ``self.last_hit`` reports the
    outcome for observability (tests pin it)."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.last_hit: bool | None = None
        os.makedirs(root, exist_ok=True)

    def _paths(self, name: str) -> tuple[str, str]:
        base = os.path.join(self.root, name)
        return base + ".parquet", base + ".manifest.json"

    def get_or_compute(
        self,
        name: str,
        inputs: dict[str, tuple[DataFrame, tuple]],
        compute,
    ) -> DataFrame:
        data_path, manifest_path = self._paths(name)
        key = _fingerprints(inputs)
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                manifest = json.load(f)
            if manifest.get("fingerprints") == key and os.path.exists(
                data_path
            ):
                self.last_hit = True
                return self.spark.read.parquet(data_path)
        self.last_hit = False
        result = compute()
        staging = os.path.join(
            self.root, f"_staging_{name}_{uuid.uuid4().hex[:8]}"
        )
        result.write.mode("overwrite").parquet(staging)
        if os.path.exists(data_path):
            shutil.rmtree(data_path)
        os.rename(staging, data_path)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"fingerprints": key}, f)
        os.rename(tmp, manifest_path)  # manifest LAST: the commit point
        return self.spark.read.parquet(data_path)
