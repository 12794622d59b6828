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


# join types whose semantics survive salting: the fact side is never
# replicated, so fact-preserving joins are exact; right/full would emit
# the exploded dimension's unmatched copies n times
_SALTED_JOIN_TYPES = {"inner", "left", "left_outer", "leftouter",
                      "left_semi", "leftsemi", "left_anti", "leftanti"}


def with_salt(df: DataFrame, n: int,
              salt_source: Column | None = None) -> DataFrame:
    """Deterministic salt in [0, n): hash of ``salt_source`` when given,
    else of the full row content — stable across recomputation and
    partition layout (identical duplicate rows share a salt, an
    acceptable residue)."""
    if n < 1:
        raise ValueError(f"salt count must be >= 1, got {n}")
    src_cols = [salt_source] if salt_source is not None \
        else [F.col(c) for c in df.columns]
    return df.withColumn(SALT_COL, F.pmod(F.hash(*src_cols), F.lit(n)))


def explode_salts(dim: DataFrame, n: int) -> DataFrame:
    """Replicate the (small) dimension once per salt value."""
    if n < 1:
        raise ValueError(f"salt count must be >= 1, got {n}")
    return dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1))))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n: int = 8, how: str = "inner",
                salt_source: Column | None = None) -> DataFrame:
    """Equi-join on ``key`` with an ``n``-way salted shuffle key.
    Only fact-preserving join types are allowed (see
    ``_SALTED_JOIN_TYPES``)."""
    if how not in _SALTED_JOIN_TYPES:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"({sorted(_SALTED_JOIN_TYPES)}); got {how!r}")
    f = with_salt(fact, n, salt_source)
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
    salted = with_salt(df, n, salt_source)
    partial = salted.groupBy(key, SALT_COL).agg(*[
        getattr(F, fn)(c).alias(f"__p_{c}") for c, fn in aggs.items()])
    final = partial.groupBy(key).agg(*[
        getattr(F, merge[fn])(f"__p_{c}").alias(f"{fn}_{c}")
        for c, fn in aggs.items()])
    return final
