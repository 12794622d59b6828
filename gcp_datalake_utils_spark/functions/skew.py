"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (on by default in the session factory) handles
most runtime skew; these helpers cover the cases AQE cannot: broadcast-
ineligible dimension joins against power-law keys, and two-phase
aggregation when a single group would overflow one task.

- ``salted_join``: fact side gets a deterministic salt in [0, n); the
  dimension side is exploded n× (dimensions are small relative to
  facts by assumption), so the shuffle key becomes (key, salt) and a
  hot key spreads over n tasks.
- ``two_phase_agg``: pre-aggregate on (key, salt), then final-aggregate
  on key — sum/count/min/max style merges only.

Both are pure DataFrame rewrites (no RDDs, no UDFs), deterministic
(salt = pmod(hash(fact row key cols...), n)), and compose with AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, key: str, n: int,
              salt_source: Column | None = None) -> DataFrame:
    """Deterministic salt in [0, n) derived from the full row when a
    ``salt_source`` column is given (spreads identical keys), else from
    a monotonic id surrogate."""
    src = salt_source if salt_source is not None \
        else F.monotonically_increasing_id()
    return df.withColumn(SALT_COL, F.pmod(F.hash(src), F.lit(n)))


def explode_salts(dim: DataFrame, n: int) -> DataFrame:
    """Replicate the (small) dimension once per salt value."""
    return dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1))))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n: int = 8, how: str = "inner",
                salt_source: Column | None = None) -> DataFrame:
    """Equi-join on ``key`` with an ``n``-way salted shuffle key."""
    f = with_salt(fact, key, n, salt_source)
    d = explode_salts(dim, n)
    out = f.join(d, [key, SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_agg(df: DataFrame, key: str, n: int,
                  aggs: dict[str, str],
                  salt_source: Column | None = None) -> DataFrame:
    """Aggregate a skewed key in two phases. ``aggs`` maps column ->
    one of sum/count/min/max; partials merge exactly (count merges by
    sum)."""
    merge = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in merge:
            raise ValueError(f"unmergeable aggregate {fn!r}")
    salted = with_salt(df, key, n, salt_source)
    partial = salted.groupBy(key, SALT_COL).agg(*[
        getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()])
    final = partial.groupBy(key).agg(*[
        getattr(F, merge[fn])(f"__p_{c}").alias(f"{fn}_{c}")
        for c, fn in aggs.items()])
    return final
