"""Scalar-function layer reproducing the reference's JS expression
semantics (SURVEY §2.7), as pure Column expressions (JVM-side,
whole-stage-codegen'd -- no Python UDFs).

The load-bearing subtlety is JS-falsy defaulting: the reference uses
``a || b`` everywhere (reference src/lib/users.js:17-33,
src/lib/spacex.js:32, pages/index.js:117), which treats '' / 0 / false
/ null / undefined as missing.  SQL COALESCE only catches NULL, so
every ported default goes through :func:`js_or` instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def js_truthy(c: Column, kind: str = "coerced") -> Column:
    """JS truthiness (``Boolean(x)``): NULL/''/0/NaN/false -> false.

    A bare Column carries no schema, so the caller names the type
    family (matches e.g. the ``user.valid && user.email`` filter,
    reference src/lib/users.js:67):

    - ``"string"``:  only NULL and '' are falsy (JS treats the
      strings '0' and 'false' as TRUE).
    - ``"numeric"``: 0, -0, NaN and NULL are falsy.
    - ``"boolean"``: the value itself, NULL -> false.
    - ``"coerced"`` (default): cross-type form comparing the string
      rendering against ''/'0'/'false'.  Exact for string, boolean
      and integer columns; NOT for fractional numerics (0.0 renders
      as '0.0', NaN as 'NaN') -- pass kind="numeric" for those.
    """
    if kind == "string":
        return c.isNotNull() & (c != "")
    if kind == "numeric":
        d = c.cast("double")
        return c.isNotNull() & ~F.isnan(d) & (d != 0)
    if kind == "boolean":
        return F.coalesce(c, F.lit(False))
    if kind == "coerced":
        s = c.cast("string")
        return c.isNotNull() & (s != "") & (s != "0") & (s != "false")
    raise ValueError(f"js_truthy: unknown kind {kind!r}")


def js_str_or(c: Column, fallback: Column) -> Column:
    """``a || b`` for string columns: '' and NULL both fall through.

    This is the exact semantics of ``u.nat || u.location?.country``
    (reference src/lib/users.js:69) -- plain coalesce would keep ''.
    """
    return F.when(c.isNotNull() & (c != ""), c).otherwise(fallback)


def js_or(c: Column, fallback: Column, kind: str = "coerced") -> Column:
    """General ``a || b``: any JS-falsy value of ``c`` yields ``fallback``."""
    return F.when(js_truthy(c, kind), c).otherwise(fallback)


def full_name(first: Column, last: Column) -> Column:
    """`${first} ${last}`.trim() -- reference src/lib/users.js:18 (F1)."""
    return F.trim(F.concat_ws(" ", first, last))


def fmt_city_country(city: Column, country: Column) -> Column:
    """`${city}, ${country}` -- reference pages/index.js:114 (F3)."""
    return F.concat_ws(", ", city, country)


def iso_now() -> Column:
    """new Date().toISOString() -- reference src/lib/users.js:45 (F5)."""
    return F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")


def epoch_millis_now() -> Column:
    """Date.now() -- reference pages/index.js:125 (F6)."""
    return F.unix_millis(F.current_timestamp())


def url_hostname(url: Column) -> Column:
    """new URL(u).hostname with fail->input -- reference pages/index.js:417-424 (F7).

    try_parse_url: under ANSI mode (Spark 4 default) plain parse_url
    raises on malformed input; the reference's try/catch returns the
    input instead.
    """
    return F.coalesce(F.try_parse_url(url, F.lit("HOST")), url)


def csv_quote(c: Column) -> Column:
    """Reference CSV cell rule (pages/index.js:426-430, F8):
    null -> '', embedded '"' doubled, wrap in quotes."""
    s = F.coalesce(c.cast("string"), F.lit(""))
    return F.concat(F.lit('"'), F.regexp_replace(s, '"', '""'), F.lit('"'))


def clamped_pct(value: Column, maximum: Column) -> Column:
    """Math.min(value/max*100, 100), 0 when max<=0 -- pages/index.js:291 (F12)."""
    return F.when(maximum > 0, F.least(value / maximum * F.lit(100.0), F.lit(100.0))).otherwise(
        F.lit(0.0)
    )


def case_status(success: Column, upcoming: Column) -> Column:
    """success ? 'Success' : upcoming ? 'Upcoming' : 'Failed'
    -- reference pages/launch/[id].js:16 (P8)."""
    return (
        F.when(success, F.lit("Success"))
        .when(upcoming, F.lit("Upcoming"))
        .otherwise(F.lit("Failed"))
    )
