"""Round-2 curation operators: stratified sampling, PII redaction,
boilerplate flagging, inverted index, SCD2 history."""

from __future__ import annotations

import math
from collections import defaultdict

from gcp_datalake_utils_spark.llm import boilerplate, index, redact, sampling
from gcp_datalake_utils_spark.operators import scd2
from gcp_datalake_utils_spark.sources import load_table


def test_stratified_sample_quota_and_determinism(spark, sf_dir):
    rows = sampling.stratified_sample(spark, sf_dir).collect()
    per_stratum = defaultdict(list)
    for r in rows:
        per_stratum[(r.lang, r.source)].append(r)
    for (lang, source), grp in per_stratum.items():
        quota = math.ceil(sampling.SAMPLE_FRAC * grp[0].stratum_n)
        assert len(grp) == quota, (lang, source)
        assert sorted(r.sample_rank for r in grp) == list(
            range(1, quota + 1))
    again = sampling.stratified_sample(spark, sf_dir).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in rows}


def test_pii_redaction_masks_everything(spark, sf_dir):
    rows = redact.pii_redaction(spark, sf_dir).collect()
    for r in rows:
        assert "@" not in r.clean and "[EMAIL]" in r.clean
        assert "[IP]" in r.clean and "[ID]" in r.clean
        assert r.n_emails == 1 and r.n_ips == 1 and r.n_ids >= 1
        # masking removed every 6+ digit run and dotted quad
        import re
        assert not re.search(r"\d{6,}", r.clean)
        assert not re.search(r"\b\d+\.\d+\.\d+\.\d+\b", r.clean)


def test_boilerplate_fraction_bounds(spark, sf_dir):
    rows = boilerplate.boilerplate_flags(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_shingles
        assert 0.0 <= r.boiler_frac <= 1.0
        assert r.flagged == (r.n_shingles > 0
                             and r.boiler_frac >= boilerplate.BOILER_FRAC)


def test_inverted_index_postings_capped_sorted(spark, sf_dir):
    rows = index.inverted_index(spark, sf_dir).collect()
    for r in rows:
        postings = [int(x) for x in r.postings.split(",")]
        assert 1 <= len(postings) <= index.POSTINGS_CAP
        assert postings == sorted(set(postings))
        assert r.df >= len(postings)
        assert r.total_tf >= r.df


def test_scd2_history_intervals_chain(spark, sf_dir):
    rows = scd2.scd2_history(spark, sf_dir).collect()
    per_key = defaultdict(list)
    for r in rows:
        per_key[r.custkey].append(r)
    for grp in per_key.values():
        grp.sort(key=lambda r: r.version)
        assert sum(r.is_current for r in grp) == 1
        assert grp[-1].is_current and grp[-1].valid_to is None
        for a, b in zip(grp, grp[1:]):
            assert a.valid_to == b.valid_from
            assert a.valid_from <= a.valid_to


def test_temperature_mixture_flattens(spark, sf_dir):
    """T < 1 must pull the mixture toward uniform: the largest source's
    share shrinks and the smallest's grows vs the raw weights; per-
    source draws still respect quota = ceil(corpus * frac * w_T)."""
    from gcp_datalake_utils_spark.llm import sampling
    tw = sampling._temp_weights()
    raw = sampling.MIX_WEIGHTS
    top = max(raw, key=raw.get)
    bot = min(raw, key=raw.get)
    raw_z = sum(raw.values())
    assert tw[top] < raw[top] / raw_z
    assert tw[bot] > raw[bot] / raw_z
    assert abs(sum(tw.values()) - 1.0) < 1e-12
    rows = sampling.corpus_mixture_temp(spark, sf_dir).collect()
    assert rows
    import collections, math
    per_src = collections.Counter(r.source for r in rows)
    corpus_n = (sampling.load_table(spark, sf_dir, "documents").count())
    for s, n in per_src.items():
        quota = math.ceil(corpus_n * sampling.MIX_TOTAL_FRAC * tw[s])
        assert n <= quota
