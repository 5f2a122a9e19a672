"""Semantic invariants for the round-5 second-wave operators --
properties the DuckDB value hash cannot state: sequential set-logic
recomputes for the Q16/Q20 subquery decorrelations, the DBSP
add-deltas-equals-recompute property including group disappearance,
histogram reconciliation for the join-size estimator, a numpy
cross-check for the Markov power iteration, and era reconciliation
for the schema-evolution union."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    return entrymod.queries()[name](spark, SF)


def _pdf(spark, table, cols=None):
    df = spark.read.parquet(f"{SF}/{table}.parquet")
    if cols:
        df = df.select(*cols)
    return df.toPandas()


# ---------------------------------------------------------------------------
# supplier_part_kinds (Q16): anti-join == sequential NOT IN
# ---------------------------------------------------------------------------
def test_supplier_part_kinds_matches_set_logic(spark):
    li = _pdf(spark, "lineitem", ["l_partkey", "l_suppkey"])
    p = _pdf(spark, "part")
    s = _pdf(spark, "supplier")
    bad = set(s.loc[s.s_acctbal < 0, "s_suppkey"])
    p = p[
        (p.p_brand != "Brand#12")
        & (p.p_type != "PROMO")
        & p.p_size.isin([1, 9, 14, 19, 23, 36, 45, 49])
    ]
    li = li[~li.l_suppkey.isin(bad)]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    want = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .to_dict()
    )
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in _run(spark, "supplier_part_kinds").collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# promotable_suppliers (Q20): decorrelated HAVING == per-pair recompute
# ---------------------------------------------------------------------------
def test_promotable_suppliers_matches_pair_recompute(spark):
    li = _pdf(spark, "lineitem")
    p = _pdf(spark, "part")
    s = _pdf(spark, "supplier")
    n = _pdf(spark, "nation")
    red = set(p.loc[p.p_name.str.startswith("red "), "p_partkey"])
    li = li[li.l_partkey.isin(red)].copy()
    li["qty"] = li.l_quantity.astype("int64")
    li["y"] = pd.to_datetime(li.l_shipdate).dt.year
    good = set()
    for (_, sk), g in li.groupby(["l_partkey", "l_suppkey"]):
        tot = g.qty.sum()
        if tot >= 40 and 2 * g.loc[g.y == 1995, "qty"].sum() > tot:
            good.add(sk)
    nations = set(
        n.loc[
            n.n_name.isin(
                ["NATION_3", "NATION_7", "NATION_11", "NATION_19",
                 "NATION_23"]
            ),
            "n_nationkey",
        ]
    )
    want = set(
        s.loc[
            s.s_suppkey.isin(good) & s.s_nationkey.isin(nations), "s_suppkey"
        ]
    )
    got = {r.s_suppkey for r in _run(spark, "promotable_suppliers").collect()}
    assert got == want


# ---------------------------------------------------------------------------
# mv_retraction_agg: DBSP property incl. group disappearance
# ---------------------------------------------------------------------------
def test_mv_retraction_matches_recompute(spark):
    o = _pdf(spark, "orders")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    cut = pd.Timestamp("1998-01-01")
    d = pd.to_datetime(o.o_orderdate)
    retracted = (d < cut) & (o.o_orderkey % 10 == 3)
    live = o[~retracted]
    want_n = live.groupby("o_orderpriority").size().to_dict()
    want_s = live.groupby("o_orderpriority")["cents"].sum().to_dict()
    rows = _run(spark, "mv_retraction_agg").collect()
    got_n = {r.priority: r.n_live for r in rows}
    got_s = {r.priority: r.revenue_cents for r in rows}
    assert got_n == want_n
    assert got_s == want_s
    # groups the recompute drops must be absent from the maintained view
    assert set(got_n) == set(want_n)
    for r in rows:
        assert r.n_live > 0


def test_retraction_drops_emptied_group(spark):
    """A group whose every base row is retracted and that receives no
    inserts must vanish from the maintained view -- the Z-set zero-
    multiplicity contract, exercised on a synthetic frame through the
    same Abelian-state merge the query uses."""
    base = spark.createDataFrame(
        [("A", 100), ("A", 50), ("B", 10)], ["g", "cents"]
    )
    base_mv = base.groupBy("g").agg(
        F.count("*").alias("n0"), F.sum("cents").alias("s0")
    )
    delta = spark.createDataFrame(
        [("A", -1, 100), ("A", -1, 50), ("B", 1, 5)], ["g", "w", "cents"]
    )
    delta_mv = delta.groupBy("g").agg(
        F.sum("w").alias("dn"),
        F.sum(F.col("w") * F.col("cents")).alias("ds"),
    )
    z = F.lit(0).cast("bigint")
    merged = (
        base_mv.join(delta_mv, "g", "full_outer")
        .select(
            "g",
            (F.coalesce("n0", z) + F.coalesce("dn", z)).alias("n_live"),
            (F.coalesce("s0", z) + F.coalesce("ds", z)).alias("cents"),
        )
        .filter(F.col("n_live") > 0)
    )
    rows = {r.g: (r.n_live, r.cents) for r in merged.collect()}
    assert rows == {"B": (2, 15)}


# ---------------------------------------------------------------------------
# join_size_estimate: histogram reconciliation + exactness of the witness
# ---------------------------------------------------------------------------
def test_join_size_estimate_reconciles(spark):
    li = _pdf(spark, "lineitem", ["l_partkey"])
    counts = (
        li.groupby("l_partkey")
        .size()
        .reset_index(name="n")
        .sort_values(["n", "l_partkey"], ascending=[False, True])
    )
    row = _run(spark, "join_size_estimate").collect()[0]
    assert row.exact_size == int((counts.n**2).sum())
    assert row.n_heavy == min(64, len(counts))
    assert row.rest_rows == int(counts.n.sum()) - int(
        counts.head(64).n.sum()
    )
    assert row.rest_distinct == len(counts) - row.n_heavy
    hsum = int((counts.head(64).n ** 2).sum())
    rtot, rd = row.rest_rows, row.rest_distinct
    assert row.est_size == hsum + (rtot * rtot // rd if rd else 0)


# ---------------------------------------------------------------------------
# events_markov_stationary: fixed-point iterate ~= float power iteration
# ---------------------------------------------------------------------------
def test_markov_stationary_close_to_float_iteration(spark):
    e = _pdf(spark, "events", ["user_id", "ts", "event_id", "event_type"])
    e = e.sort_values(["user_id", "ts", "event_id"])
    e["next"] = e.groupby("user_id")["event_type"].shift(-1)
    t = e.dropna(subset=["next"]).groupby(["event_type", "next"]).size()
    states = sorted({i for i, _ in t.index})
    idx = {s: k for k, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    for (i, j), cnt in t.items():
        P[idx[i], idx[j]] = cnt
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(len(states), 1.0 / len(states))
    for _ in range(3):
        pi = pi @ P
    got = {
        r.state: r.pi_scaled / 1e9
        for r in _run(spark, "events_markov_stationary").collect()
    }
    assert set(got) == set(states)
    for s in states:
        # fixed-point floors lose < 1e-6 of mass per step
        assert abs(got[s] - pi[idx[s]]) < 1e-5
    assert 0.999 < sum(got.values()) <= 1.0


# ---------------------------------------------------------------------------
# schema_evolution_union: era reconciliation
# ---------------------------------------------------------------------------
def test_schema_evolution_reconciles_eras(spark):
    o = _pdf(spark, "orders")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    d = pd.to_datetime(o.o_orderdate)
    legacy = d < pd.Timestamp("1997-01-01")
    rows = _run(spark, "schema_evolution_union").collect()
    total = sum(r.n_orders for r in rows)
    assert total == len(o)
    assert sum(r.legacy_rows for r in rows) == int(legacy.sum())
    assert sum(r.revenue_cents for r in rows) == int(o.cents.sum())
    unspec = {r.priority: r for r in rows}["UNSPECIFIED"]
    assert unspec.n_orders == unspec.legacy_rows == int(legacy.sum())


# ---------------------------------------------------------------------------
# topk_certified: TA-bound soundness vs direct global top-k
# ---------------------------------------------------------------------------
def test_topk_certified_sound_when_certified(spark):
    import collections

    docs = _pdf(spark, "documents", ["doc_id", "text"])
    cnt = collections.Counter()
    per_slice = collections.defaultdict(collections.Counter)
    for _, r in docs.iterrows():
        ws = [w for w in r.text.lower().split() if w]
        cnt.update(ws)
        per_slice[r.doc_id % 4].update(ws)
    rows = sorted(
        _run(spark, "topk_certified").collect(), key=lambda r: r.rk
    )
    # the bound is the sum of each slice's 30th-largest count
    want_bound = sum(
        sorted(c.values(), reverse=True)[29]
        for c in per_slice.values()
        if len(c) >= 30
    )
    assert rows[0].bound == want_bound
    true_top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    if rows[0].certified:
        assert [(r.word, r.total) for r in rows] == true_top
    # counts of emitted candidates are always the exact global counts
    for r in rows:
        assert r.total == cnt[r.word]


# ---------------------------------------------------------------------------
# theil_sen_trend: numpy recompute of the lower-median slope
# ---------------------------------------------------------------------------
def test_theil_sen_matches_recompute(spark):
    o = _pdf(spark, "orders", ["o_orderdate", "o_totalprice"])
    o["mo"] = pd.to_datetime(o.o_orderdate).dt.to_period("M")
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    series = (
        o.groupby("mo")["cents"].sum().sort_index().reset_index(drop=True)
    )
    pairs = []
    n = len(series)
    for i in range(n):
        for j in range(i + 1, n):
            pairs.append((series[j] - series[i], j - i, i, j))
    pairs.sort(key=lambda p: (p[0] / p[1], p[2], p[3]))
    med_dy, med_dx, _, _ = pairs[(len(pairs) + 1) // 2 - 1]
    row = _run(spark, "theil_sen_trend").collect()[0]
    assert (row.n_months, row.n_pairs) == (n, len(pairs))
    assert (row.med_dy, row.med_dx) == (med_dy, med_dx)
    def trunc_div(a, b):  # SQL div truncates toward zero; Python // floors
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    resid = sorted(
        (int(series[t]) - trunc_div(med_dy * t, med_dx), t)
        for t in range(n)
    )
    assert row.intercept_cents == resid[(n + 1) // 2 - 1][0]


# ---------------------------------------------------------------------------
# text_collocations_pmi: pandas recompute of the integer-lift top list
# ---------------------------------------------------------------------------
def test_collocations_match_recompute(spark):
    import collections

    docs = _pdf(spark, "documents", ["text"])
    big = collections.Counter()
    for text in docs.text:
        toks = text.lower().split()  # split() drops empties like the regex
        big.update(zip(toks, toks[1:]))
    lm = collections.Counter()
    rm = collections.Counter()
    for (w1, w2), c in big.items():
        lm[w1] += c
        rm[w2] += c
    n_total = sum(big.values())
    scored = [
        (
            (c * n_total * 1_000_000) // (lm[w1] * rm[w2]),
            w1,
            w2,
            c,
        )
        for (w1, w2), c in big.items()
        if c >= 10
    ]
    scored.sort(key=lambda s: (-s[0], s[1], s[2]))
    want = [(w1, w2, c, lift) for lift, w1, w2, c in scored[:20]]
    got = [
        (r.w1, r.w2, r.n12, r.lift_ppm)
        for r in _run(spark, "text_collocations_pmi").collect()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# sketch_kmv_intersect: exact witnesses + small-set degradation to exact
# ---------------------------------------------------------------------------
def test_kmv_intersect_witnesses_and_small_set_exactness(spark):
    o = _pdf(spark, "orders", ["o_custkey", "o_orderdate"])
    y = pd.to_datetime(o.o_orderdate).dt.year
    a = set(o.loc[y == 1996, "o_custkey"])
    b = set(o.loc[y == 1997, "o_custkey"])
    row = _run(spark, "sketch_kmv_intersect").collect()[0]
    assert row.exact_inter == len(a & b)
    assert row.exact_union == len(a | b)
    assert 0 <= row.jaccard_est <= 1
    if row.k < 256:  # complete hash set retained -> estimator is exact
        assert row.n_shared == len(a & b)
        assert row.inter_est == float(len(a & b))
        assert row.union_est == float(len(a | b))


# ---------------------------------------------------------------------------
# graph_kcore_peel: sequential peeling recompute
# ---------------------------------------------------------------------------
def test_kcore_peel_matches_sequential(spark):
    import collections

    li = _pdf(spark, "lineitem", ["l_orderkey", "l_partkey"])
    per_order = li.drop_duplicates().groupby("l_orderkey")["l_partkey"]
    pairs = collections.Counter()
    for _, parts in per_order:
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] += 1
    edges = {e for e, c in pairs.items() if c >= 2}
    trace = {}
    for rnd in range(4):
        nodes = {v for e in edges for v in e}
        trace[rnd] = (len(nodes), len(edges))
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= 3}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    got = {
        r.round: (r.n_nodes, r.n_edges)
        for r in _run(spark, "graph_kcore_peel").collect()
    }
    assert got == trace
    # peeling is monotone: nodes and edges never grow
    for rnd in range(1, 4):
        assert got[rnd][0] <= got[rnd - 1][0]
        assert got[rnd][1] <= got[rnd - 1][1]


# ---------------------------------------------------------------------------
# er_golden_record: survivorship rules recompute
# ---------------------------------------------------------------------------
def test_er_golden_record_survivorship(spark):
    import hashlib

    c = _pdf(spark, "customer", ["c_custkey", "c_acctbal"])
    recs = []
    for r in c.itertuples():  # iterrows would upcast custkey to float
        ck = int(r.c_custkey)
        nm = hashlib.md5(str(ck).encode()).hexdigest()
        cents = round(r.c_acctbal * 100)
        recs.append((nm, cents, 1))
        if ck % 3 == 0:
            recs.append(("z" + nm[1:], cents, 2))
        if ck % 5 == 0:
            recs.append((nm[0].upper() + nm[1:], cents - 5000, 3))
    by_blk = {}
    for name, cents, src in recs:
        by_blk.setdefault(name[2:14], []).append((src, name, cents))
    rows = _run(spark, "er_golden_record").collect()
    assert len(rows) == len(by_blk) == len(c)
    for r in rows:
        grp = sorted(by_blk[r.cluster_key])
        assert r.golden_name == grp[0][1]       # most-trusted source wins
        assert r.golden_bal_cents == grp[0][2]
        assert r.n_records == len(grp)
        assert r.n_sources == len({s for s, _, _ in grp})
        assert r.bal_conflict == (len({b for _, _, b in grp}) > 1)
        assert r.max_intra_dist <= 1            # corruption radius by design


# ---------------------------------------------------------------------------
# groupby_sampled_ci: estimator reconciliation + CI formula recompute
# ---------------------------------------------------------------------------
def test_sampled_ci_reconciles(spark):
    import hashlib
    import math

    o = _pdf(spark, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    c = _pdf(spark, "customer", ["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype("int64")
    j["in_sample"] = [
        hashlib.md5(str(int(k)).encode()).hexdigest()[0] == "0"
        for k in j.o_orderkey
    ]
    rows = {r.segment: r for r in _run(spark, "groupby_sampled_ci").collect()}
    for seg, g in j.groupby("c_mktsegment"):
        s = g[g.in_sample]
        r = rows[seg]
        assert r.n_all == len(g)
        assert r.n_sample == len(s)
        assert r.exact_avg_cents == int(g.cents.sum()) // len(g)
        assert r.est_avg_cents == int(s.cents.sum()) // len(s)
        n, su, sq = len(s), int(s.cents.sum()), int((s.cents**2).sum())
        ci = 1.96 * math.sqrt((n * float(sq) - float(su) * su)
                              / (float(n) * n * (n - 1)))
        assert abs(r.ci95_cents - round(ci, 2)) < 0.02
        # the exact average this fixture produces falls inside the CI
        assert abs(r.est_avg_cents - r.exact_avg_cents) <= 3 * ci


# ---------------------------------------------------------------------------
# late_arriving_dim: two-pass resolution loses and duplicates nothing
# ---------------------------------------------------------------------------
def test_late_arriving_dim_conserves_facts(spark):
    li = _pdf(spark, "lineitem",
              ["l_suppkey", "l_extendedprice", "l_discount"])
    s = _pdf(spark, "supplier", ["s_suppkey", "s_nationkey"])
    n = _pdf(spark, "nation", ["n_nationkey", "n_name"])
    li["cents"] = (
        np.floor(li.l_extendedprice * (1 - li.l_discount) * 100 + 0.5)
        .astype("int64")  # HALF_UP like Spark/DuckDB round, not banker's
    )
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey").merge(
        n, left_on="s_nationkey", right_on="n_nationkey"
    )
    j["late"] = j.s_suppkey % 4 == 0
    rows = {r.nation: r for r in _run(spark, "late_arriving_dim").collect()}
    assert sum(r.resolved_initial + r.resolved_late
               for r in rows.values()) == len(j)
    for nat, g in j.groupby("n_name"):
        r = rows[nat]
        assert r.resolved_initial == int((~g.late).sum())
        assert r.resolved_late == int(g.late.sum())
        assert r.revenue_cents == int(g.cents.sum())


# ---------------------------------------------------------------------------
# events_watermark_audit: sequential replay recompute
# ---------------------------------------------------------------------------
def test_watermark_audit_matches_sequential_replay(spark):
    e = _pdf(spark, "events", ["event_id", "ts"])
    e["arrival"] = e.event_id * 2 + np.where(e.event_id % 7 == 0, 2001, 0)
    e["tu"] = pd.to_datetime(e.ts).astype("int64") // 1000  # micros
    e = e.sort_values("arrival")
    hw = None
    lates = []
    for tu in e.tu:
        lates.append(0 if hw is None or tu >= hw else (hw - tu) // 1_000_000)
        hw = tu if hw is None else max(hw, tu)
    import collections

    def band(ls):
        return (0 if ls == 0 else 1 if ls <= 3600 else 2 if ls <= 86400
                else 3 if ls <= 259200 else 4)

    want = collections.Counter(band(ls) for ls in lates)
    want_max = collections.defaultdict(int)
    for ls in lates:
        want_max[band(ls)] = max(want_max[band(ls)], ls)
    rows = sorted(_run(spark, "events_watermark_audit").collect(),
                  key=lambda r: r.band)
    assert {r.band: r.n_events for r in rows} == dict(want)
    assert {r.band: r.max_late_s for r in rows} == dict(want_max)
    assert rows[-1].cum_pct == 100.0
    cum = 0
    for r in rows:  # cumulative coverage is a proper CDF over bands
        cum += r.n_events
        assert r.cum_pct == round(100.0 * cum / len(e), 2)


def test_sorted_neighborhood_pair_census(spark):
    """Sorted-neighborhood blocking emits exactly W*n - W(W+1)/2
    candidate pairs (each rank distance j contributes n-j pairs) and
    every pair sits within W ranks."""
    rows = entrymod.queries()["er_sorted_neighborhood"](
        spark, SF
    ).collect()
    n = spark.read.parquet(f"{SF}/customer.parquet").count()
    W = 3
    assert len(rows) == W * n - W * (W + 1) // 2
    assert all(1 <= r.rank_dist <= W for r in rows)
    assert all(r.custkey_a != r.custkey_b for r in rows)
