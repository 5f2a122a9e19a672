"""Generate a local sf1 dataset (10x sf0.1) for the fourth scaling
decade (VERDICT r10 #4).

/root/testdata is driver-owned and read-only, and the driver's
generator is not available -- so sf1 is a DISTRIBUTION-PRESERVING
BOOTSTRAP BLOW-UP of the committed sf0.1 tables: each scaled table
samples sf0.1 rows with replacement (preserving every joint marginal
the queries aggregate over: prices x quantities x dates x flags,
token-count x lang x source, ...), then rewrites primary keys to be
unique/sequential and re-maps foreign keys onto the enlarged key
ranges by ``fk * 10 + uniform(0..9)`` (so per-key fan-out/skew shape
survives the scale-up).  Deterministic (numpy seed 4242).  This is
timing-grade data for scaling exponents, NOT oracle-grade: no
correctness gate runs at sf1 (SCALING.md documents this).

Usage:  python tools/gen_sf1.py [out_dir]      (default
        /root/repo/.testdata_sf1; ~500 MB, ~1 min)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
SCALE = 10
SEED = 4242


def _read(table: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{table}.parquet"))


def _bootstrap(t: pa.Table, n_out: int, rng: np.random.Generator) -> dict:
    """Sample n_out rows with replacement; return dict of numpy/object
    column arrays."""
    idx = rng.integers(0, t.num_rows, size=n_out)
    out = {}
    for name in t.column_names:
        col = t.column(name).to_numpy(zero_copy_only=False)
        out[name] = col[idx]
    return out


def _write(out_dir: str, table: str, cols: dict, schema: pa.Schema) -> None:
    arrays = [
        pa.array(cols[f.name]).cast(f.type) for f in schema
    ]
    pq.write_table(
        pa.Table.from_arrays(arrays, schema=schema),
        os.path.join(out_dir, f"{table}.parquet"),
    )


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # fixed-size dims: copied through unchanged (same keys, same rows)
    for t in ("region", "nation"):
        pq.write_table(_read(t), os.path.join(out_dir, f"{t}.parquet"))

    def fk(col: np.ndarray) -> np.ndarray:
        return col.astype(np.int64) * SCALE + rng.integers(
            0, SCALE, size=len(col)
        )

    # dimensions first (PK = sequential over the enlarged range)
    cust = _read("customer")
    n = cust.num_rows * SCALE
    c = _bootstrap(cust, n, rng)
    c["c_custkey"] = np.arange(n, dtype=np.int64)
    c["c_name"] = np.array([f"Customer#{i:09d}" for i in range(n)])
    _write(out_dir, "customer", c, cust.schema)

    supp = _read("supplier")
    n = supp.num_rows * SCALE
    s = _bootstrap(supp, n, rng)
    s["s_suppkey"] = np.arange(n, dtype=np.int64)
    s["s_name"] = np.array([f"Supplier#{i:09d}" for i in range(n)])
    _write(out_dir, "supplier", s, supp.schema)

    part = _read("part")
    n = part.num_rows * SCALE
    p = _bootstrap(part, n, rng)
    p["p_partkey"] = np.arange(n, dtype=np.int64)
    _write(out_dir, "part", p, part.schema)

    orders = _read("orders")
    n = orders.num_rows * SCALE
    o = _bootstrap(orders, n, rng)
    o["o_orderkey"] = np.arange(n, dtype=np.int64)
    o["o_custkey"] = fk(o["o_custkey"])
    _write(out_dir, "orders", o, orders.schema)

    li = _read("lineitem")
    n = li.num_rows * SCALE
    L = _bootstrap(li, n, rng)
    L["l_orderkey"] = fk(L["l_orderkey"])
    L["l_partkey"] = fk(L["l_partkey"])
    L["l_suppkey"] = fk(L["l_suppkey"])
    _write(out_dir, "lineitem", L, li.schema)

    ev = _read("events")
    n = ev.num_rows * SCALE
    e = _bootstrap(ev, n, rng)
    e["event_id"] = np.arange(n, dtype=np.int64)
    e["user_id"] = fk(e["user_id"])
    _write(out_dir, "events", e, ev.schema)

    emb = _read("embeddings")
    n = emb.num_rows * SCALE
    idx = rng.integers(0, emb.num_rows, size=n)
    vecs = emb.column("embedding").to_pylist()
    labels = emb.column("label").to_numpy(zero_copy_only=False)
    _write(
        out_dir,
        "embeddings",
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [vecs[i] for i in idx],
            "label": labels[idx],
        },
        emb.schema,
    )

    docs = _read("documents")
    # Documents scale by TILED REPLICATION with a per-replica token
    # bijection, NOT by bootstrap sampling.  Sampling with replacement
    # multiplies every exact/near-duplicate GROUP's size ~SCALE-fold,
    # which takes candidate-pair counts ~SCALE^2-fold -- the measured
    # sf1 artifact that made every pair-generation operator (simhash
    # hamming, containment, LSH verify) look super-linear when the
    # plans are linear in candidate load.  Real corpora do not behave
    # that way: duplicate-group SIZE comes from crawl redundancy and
    # is scale-free; group COUNT grows with the corpus.  So each
    # replica k holds every sf0.1 document once, with non-stopword
    # tokens suffixed by the replica id: within a replica every
    # token-equality relation (hence every shingle, fingerprint and
    # dup group) is preserved bijectively; across replicas documents
    # share only pure-stopword shingles (~stop_ratio^3 of shingles,
    # far below every similarity threshold), so dedup candidate load
    # scales linearly -- exactly SCALE independent copies of sf0.1's
    # dedup problem.  Replica 0 keeps the original text verbatim.
    # Stopwords keep their identity so stop-ratio quality gates see
    # the sf0.1 distribution.
    from mvp_mini_etl_pipeline_1762840347_spark.plans.text import STOPWORDS

    stop = set(STOPWORDS)
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_numpy(zero_copy_only=False)
    base = docs.num_rows
    n = base * SCALE
    out_text: list[str] = []
    for k in range(SCALE):
        if k == 0:
            out_text.extend(texts)
            continue
        tag = str(k)
        for t in texts:
            out_text.append(
                " ".join(
                    w if w in stop else w + tag for w in t.split(" ")
                )
            )
    d = {
        "doc_id": np.arange(n, dtype=np.int64),
        "text": out_text,
        "lang": np.tile(langs, SCALE),
        # re-spread sources over the enlarged corpus (uniform over the
        # same 20 sources, like the original)
        "source": np.array(
            [f"src{i}" for i in rng.integers(0, 20, size=n)]
        ),
        "n_chars": np.array([len(t) for t in out_text], dtype=np.int64),
    }
    _write(out_dir, "documents", d, docs.schema)

    print(f"sf1 written to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.testdata_sf1")
