"""Reusable join operators generalizing the reference's lookup
patterns (SURVEY §2.4) beyond the inline query implementations.

J1/J2: `rockets.find(r => r.id === launch.rocket)` with a default on
miss (reference src/lib/spacex.js:24-25,32-33) -- an O(n*m) nested
loop there; here a broadcast left-outer join + coalesce defaults.

J3: `payloads.filter(p => launch.payloads.includes(p.id))`
(spacex.js:26-28) -- per-row array membership; here
explode -> equi-join -> group-collect, the shape that scales (the
naive `array_contains` join condition is a cross-join at heart and
dies at 100 TB; the explode form is a plain shuffle join keyed by
member id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_join_with_default(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    defaults: dict[str, Column],
    broadcast: bool = True,
) -> DataFrame:
    """Left-outer dimension lookup; missing dimension columns filled
    from `defaults` (a {col_name: default_expr} map).  One nullable
    output schema -- never union of mixed shapes (SURVEY §7 gotcha on
    the reference's differently-shaped miss-default)."""
    d = F.broadcast(dim) if broadcast else dim
    joined = fact.join(d, fact[fact_key] == dim[dim_key], "left")
    out = joined
    for name, default in defaults.items():
        out = out.withColumn(name, F.coalesce(F.col(name), default))
    return out


def collect_members_join(
    owners: DataFrame,
    owner_key: str,
    member_array: str,
    members: DataFrame,
    member_key: str,
    collect_cols: list[str],
) -> DataFrame:
    """J3 at scale: owners carry an array of member ids; return owners
    with a collected array of full member structs + member count.

    explode(owner.member_ids) -> shuffle-join on member id ->
    groupBy(owner) collect_list -> join back to owners (left, so
    owners with no members keep an empty array).
    """
    exploded = owners.select(
        F.col(owner_key), F.explode_outer(F.col(member_array)).alias("_member_id")
    )
    matched = exploded.join(
        members, exploded["_member_id"] == members[member_key], "inner"
    )
    collected = matched.groupBy(owner_key).agg(
        F.collect_list(F.struct(*collect_cols)).alias("members"),
        F.count("*").alias("members_count"),
    )
    return (
        owners.join(collected, owner_key, "left")
        .withColumn("members", F.coalesce(F.col("members"), F.array()))
        .withColumn("members_count", F.coalesce(F.col("members_count"), F.lit(0)))
    )
