"""Property-based parity tests (hypothesis): the compiled SQL predicates
must agree with the reference's Python semantics on arbitrary inputs.

These run entirely in DuckDB (cheap per-example); the Spark dialect
shares the same generator, and the query gate separately hash-matches
Spark against DuckDB — so transitively all three agree.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gcp_datalake_utils_spark.operators.datatest import (
    cochran_sample_size,
)
from gcp_datalake_utils_spark.rules.compiler import pattern_pred

# names/patterns drawn from the identifier-ish alphabet the reference
# deals in
_name = st.text(alphabet="abcdefgh_", min_size=1, max_size=12)
_pattern = st.one_of(
    _name,
    _name.map(lambda s: "*" + s),
    _name.map(lambda s: s + "*"),
    st.tuples(_name, _name).map(lambda t: t[0] + "*" + t[1]),
)


def _reference_matches(text: str, pattern: str) -> bool:
    """``_matches_pattern`` (pattern_config.py:321-336) verbatim
    semantics: wildcard -> regex match-at-start, else equality."""
    if "*" in pattern:
        regex_pattern = pattern.replace("*", ".*")
        return bool(re.match(f"^{regex_pattern}$", text, re.IGNORECASE))
    return text == pattern


@settings(max_examples=300, deadline=None)
@given(name=_name, pattern=_pattern)
def test_pattern_pred_matches_reference_semantics(name, pattern):
    sql = pattern_pred("lower(name)", (pattern,), "duck")
    got = duckdb.sql(
        f"SELECT {sql} FROM (SELECT {name!r} AS name)").fetchone()[0]
    want = _reference_matches(name, pattern)
    assert bool(got) == want, (name, pattern, sql)


@settings(max_examples=200, deadline=None)
@given(pop=st.integers(min_value=0, max_value=10**9),
       level=st.sampled_from([0.90, 0.95, 0.99]))
def test_cochran_sample_size_properties(pop, level):
    n = cochran_sample_size(pop, level)
    assert 0 <= n <= pop
    z = {0.90: 1.645, 0.95: 1.96, 0.99: 2.576}[level]
    n0 = (z * z * 0.25) / (0.05 * 0.05)
    if pop >= 10_000:
        # finite-population-corrected Cochran stays below the
        # uncorrected bound and grows with confidence
        assert n <= int(n0) + 1
    # monotone in population ABOVE the small-population cliff: the
    # reference returns the full population when population < n0
    # (data_relationship_tester.py:380-381), so e.g. 384 -> 384 but
    # 385 -> 192 at 0.95 — a reference-faithful discontinuity
    if n0 < pop < 10**9:
        assert cochran_sample_size(pop + 1, level) >= n


def test_cochran_reference_cliff_is_preserved():
    # document the faithful discontinuity explicitly
    assert cochran_sample_size(384, 0.95) == 384
    assert cochran_sample_size(385, 0.95) < 384


@pytest.mark.parametrize("a,b", [("x", "x"), ("", "a")])
def test_reference_matcher_sanity(a, b):
    assert _reference_matches(a, a)
    assert not _reference_matches(b, "zzz")

# --- prefix-filter completeness (round 4) ------------------------------

from gcp_datalake_utils_spark.llm import dedup as _dd

_pf_word = st.sampled_from(["a", "b", "c", "aa", "bb"])
_pf_doc = st.lists(_pf_word, min_size=0, max_size=10).map(" ".join)


@settings(max_examples=120, deadline=None)
@given(texts=st.lists(_pf_doc, min_size=2, max_size=10))
def test_prefix_filter_oracle_equals_brute_force(texts):
    """The PPJoin prefix+length+positional prunes must NEVER drop a
    true pair: on arbitrary tiny-vocab corpora (maximal shingle
    collision stress) the oracle's pair set equals brute-force
    all-pairs Jaccard >= t. The Spark side hash-matches this oracle in
    the query gate, so completeness transfers transitively."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(texts)))
    got = set(map(tuple, con.execute(
        f"SELECT doc_a, doc_b FROM ({_dd.PREFIX_FILTER_PAIRS_ORACLE})"
    ).fetchall()))
    brute = f"""
    WITH sh AS (SELECT doc_id, unnest({_dd._SHINGLES_SQL}) AS s
                FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT da, db FROM inter
    JOIN sizes na ON na.doc_id = da
    JOIN sizes nb ON nb.doc_id = db
    WHERE i / CAST(na.n + nb.n - i AS DOUBLE)
          >= {_dd.JACCARD_THRESHOLD}
    """
    want = set(map(tuple, con.execute(brute).fetchall()))
    con.close()
    assert got == want, (texts, got, want)
