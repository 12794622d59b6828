"""Round-7 late additions: duplicated-n-gram fraction (substring-level
dedup statistic) and pairwise source-vocabulary overlap."""

from __future__ import annotations

import re
from collections import Counter

from gcp_datalake_utils_spark.llm import ngramdup, overlap


def _final_plan(df):
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-adaptive plan after the final one
    return plan.split("== Initial Plan ==")[0]


def test_dup_ngram_fraction_matches_brute_force(spark, sf_dir):
    rows = {r["doc_id"]: r
            for r in ngramdup.dup_ngram_fraction(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    gcount: Counter = Counter()
    per_doc: dict[int, list[str]] = {}
    for d in docs:
        ws = re.split(r"\s+", d["text"].strip(" "))
        grams = [" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)]
        per_doc[d["doc_id"]] = grams
        gcount.update(grams)
    checked = 0
    for doc_id, grams in per_doc.items():
        if not grams:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        dup = sum(1 for g in grams if gcount[g] > 1)
        assert r["n_grams"] == len(grams)
        assert r["dup_grams"] == dup
        assert r["dup_fraction"] == round(dup / len(grams), 6)
        assert r["dup_heavy"] == (dup / len(grams) > ngramdup.DUP_HEAVY)
        checked += 1
    assert checked == len(rows) > 0


def test_dup_ngram_fraction_two_exchanges_only(spark, sf_dir):
    plan = _final_plan(ngramdup.dup_ngram_fraction(spark, sf_dir))
    # one local fan-out of the raw docs, one gram-hash exchange for
    # the corpus-wide window count, one doc-keyed exchange for the
    # rollup — nothing else crosses the wire
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 3
    assert "xxhash64" in plan  # hashes, not gram text, are shuffled


def test_dup_ngram_stats_consistent_with_fraction(spark, sf_dir):
    stats = ngramdup.dup_ngram_stats(spark, sf_dir).collect()[0]
    per_doc = ngramdup.dup_ngram_fraction(spark, sf_dir).collect()
    assert stats["total_grams"] == sum(r["n_grams"] for r in per_doc)
    # occurrence-weighted duplicated total also agrees across shapes
    dup_total = sum(r["dup_grams"] for r in per_doc)
    assert stats["dup_occurrence_rate"] == round(
        dup_total / stats["total_grams"], 6)
    assert 0 < stats["dup_distinct_grams"] <= stats["distinct_grams"]


def test_source_overlap_matches_brute_force(spark, sf_dir):
    got = {(r["src_a"], r["src_b"]): r
           for r in overlap.source_vocab_overlap(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("source", "text").collect()
    vocab: dict[str, set[str]] = {}
    for d in docs:
        vocab.setdefault(d["source"], set()).update(
            re.split(r"\s+", d["text"].strip(" ")))
    srcs = sorted(vocab)
    expect = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            union = len(vocab[a] | vocab[b])
            expect[(a, b)] = (inter, union, round(inter / union, 6))
    assert set(got) == set(expect)
    for k, (inter, union, jac) in expect.items():
        r = got[k]
        assert (r["inter"], r["union_sz"], r["jaccard"]) == \
            (inter, union, jac)


def test_source_overlap_single_document_scan(spark, sf_dir):
    plan = _final_plan(overlap.source_vocab_overlap(spark, sf_dir))
    # the diagonal self-pair trick: documents are scanned and
    # term-shuffled once; everything downstream reuses that exchange
    assert plan.count("FileScan parquet") == 1
    assert "ReusedExchange" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_cross_source_matrix_consistent_with_pairs(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import dedup
    mat = {(r["src_a"], r["src_b"]): r
           for r in dedup.cross_source_dup_matrix(spark, sf_dir).collect()}
    pairs = dedup.near_dup_pairs(spark, sf_dir).collect()
    src = {r["doc_id"]: r["source"]
           for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("doc_id", "source").collect()}
    expect: dict[tuple[str, str], list[float]] = {}
    for p in pairs:
        a, b = sorted((src[p["doc_a"]], src[p["doc_b"]]))
        expect.setdefault((a, b), []).append(p["jaccard"])
    assert set(mat) == set(expect) != set()
    from decimal import ROUND_HALF_UP, Decimal
    for k, js in expect.items():
        assert mat[k]["n_pairs"] == len(js)
        ppm = sum(round(j * 1e6) for j in js)
        # HALF_UP like Spark/DuckDB round(), not Python's banker's
        want = float(Decimal(repr(ppm / (len(js) * 1e6)))
                     .quantize(Decimal("0.000001"), ROUND_HALF_UP))
        assert mat[k]["avg_jaccard"] == want


def test_dedup_incremental_invariants(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import dedup
    rows = dedup.dedup_incremental(spark, sf_dir).collect()
    n_batch = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(f"doc_id % {dedup.BATCH_MOD} = 0").count()
    assert len(rows) == n_batch > 0
    dups = [r for r in rows if r["is_dup"]]
    assert dups, "fixture corpus should contain batch-vs-corpus dups"
    for r in rows:
        assert r["doc_id"] % dedup.BATCH_MOD == 0
        if r["is_dup"]:
            # the match is a CORPUS doc above the verify threshold
            assert r["match_doc"] % dedup.BATCH_MOD != 0
            assert r["jaccard"] >= dedup.JACCARD_THRESHOLD
        else:
            assert r["match_doc"] is None and r["jaccard"] is None


def test_forget_propagation_cascade(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import forget
    rows = forget.forget_propagation(spark, sf_dir).collect()
    ids = {r["doc_id"]
           for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("doc_id").collect()
           if r["doc_id"] % forget.FORGET_MOD == forget.FORGET_REMAINDER}
    assert ids, "deletion slice must be non-empty"
    by_table: dict[str, set] = {}
    for r in rows:
        by_table.setdefault(r["table_name"], set()).add(r["row_id"])
    assert by_table["documents"] == ids
    assert by_table["embeddings"] <= ids  # vec_id shares the id space


def test_forget_propagation_plan_narrow_broadcast(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import forget
    plan = _final_plan(forget.forget_propagation(spark, sf_dir))
    # each table purges via ONE broadcast semi join; the manifest
    # never reads text or embedding vectors (column pruning)
    assert plan.count("BroadcastHashJoin") == 2
    assert "LeftSemi" in plan
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_budget_selection_is_exact_greedy_prefix(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import curation, text
    got = {r["doc_id"]: r for r in
           curation.corpus_budget_selection(spark, sf_dir).collect()}
    stats = text.token_stats(spark, sf_dir) \
        .select("doc_id", "quality_score", "n_tokens").collect()
    budget = curation.BUDGET_SHARE * sum(r["n_tokens"] for r in stats)
    cum = 0
    expect = {}
    for r in sorted(stats, key=lambda r: (-r["quality_score"],
                                          r["doc_id"])):
        cum += r["n_tokens"]
        if cum > budget:
            break
        expect[r["doc_id"]] = cum
    assert set(got) == set(expect) != set()
    # some docs must be EXCLUDED or the budget never bit
    assert len(expect) < len(stats)
    for doc_id, cum_tokens in expect.items():
        assert got[doc_id]["cum_tokens"] == cum_tokens


def test_admission_pipeline_subset_of_budget_semantics(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import curation, text
    got = {r["doc_id"]: r for r in
           curation.admission_pipeline(spark, sf_dir).collect()}
    kept = {r["doc_id"] for r in
            curation.curate(spark, sf_dir).collect() if r["keep"]}
    stats = {r["doc_id"]: r for r in
             text.token_stats(spark, sf_dir)
             .select("doc_id", "quality_score", "n_tokens").collect()}
    # re-derive the greedy prefix over the KEPT subset only
    budget = curation.BUDGET_SHARE * sum(
        stats[d]["n_tokens"] for d in kept)
    cum = 0
    expect = {}
    for d in sorted(kept, key=lambda d: (-stats[d]["quality_score"], d)):
        cum += stats[d]["n_tokens"]
        if cum > budget:
            break
        expect[d] = cum
    assert set(got) == set(expect) != set()
    assert set(got) < kept  # the budget must actually bite
    for d, c in expect.items():
        assert got[d]["cum_tokens"] == c


def test_ingest_screen_has_no_false_negatives(spark, sf_dir):
    """Every batch doc the exact verifier confirms as a dup MUST have
    been screened by the streaming stage (a verified pair requires a
    band collision by construction)."""
    from gcp_datalake_utils_spark.llm import dedup
    from gcp_datalake_utils_spark.streaming import ingest
    screened = {r["doc_id"]: r for r in
                ingest.ingest_screen_stream_q(spark, sf_dir).collect()}
    verified = dedup.dedup_incremental(spark, sf_dir).collect()
    assert set(screened) == {r["doc_id"] for r in verified}
    dup_ids = {r["doc_id"] for r in verified if r["is_dup"]}
    assert dup_ids  # the fixture corpus must exercise the screen
    for d in dup_ids:
        assert screened[d]["screened"], f"verified dup {d} not screened"
    # and the screen is not vacuously flagging everything
    assert any(not r["screened"] for r in screened.values())


def test_retention_cohort_triangle_invariants(spark, sf_dir):
    from gcp_datalake_utils_spark.operators import cohort
    rows = cohort.retention_cohorts(spark, sf_dir).collect()
    assert rows
    by_cohort: dict[str, dict[int, int]] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = \
            r["n_users"]
    for day, offsets in by_cohort.items():
        # every user is active on their first day, so offset 0 exists
        # and bounds every later offset's distinct-user count
        assert 0 in offsets, f"cohort {day} missing offset 0"
        assert all(n <= offsets[0] for n in offsets.values())
        assert all(o >= 0 for o in offsets)


def test_path_transitions_conserve_event_counts(spark, sf_dir):
    from gcp_datalake_utils_spark.operators import cohort
    from gcp_datalake_utils_spark.sources import load_events
    rows = cohort.path_transitions(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_transitions"] for r in rows)
    per_user = load_events(spark, sf_dir).groupBy("user_id").count() \
        .collect()
    # each user with n events contributes exactly n-1 transitions
    assert total == sum(r["count"] - 1 for r in per_user)


def test_rolling7_wau_bounds_and_brute_force(spark, sf_dir):
    from gcp_datalake_utils_spark.operators import cohort
    from gcp_datalake_utils_spark.sources import load_events
    got = {r["day"]: r for r in
           cohort.active_users_rolling7(spark, sf_dir).collect()}
    acts = load_events(spark, sf_dir) \
        .selectExpr("user_id", "to_date(ts) AS day").distinct().collect()
    import datetime as dt
    by_day: dict[dt.date, set] = {}
    for r in acts:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    max_day = max(by_day)
    for day, users in by_day.items():
        wau_users = set()
        for back in range(7):
            wau_users |= by_day.get(day - dt.timedelta(days=back), set())
        r = got[day.strftime("%Y-%m-%d")]
        assert r["dau"] == len(users)
        assert r["wau"] == len(wau_users)
        assert r["dau"] <= r["wau"]
    assert set(got) == {d.strftime("%Y-%m-%d") for d in by_day}


def test_jsonl_roundtrip_matches_parquet_side(spark, sf_dir):
    from gcp_datalake_utils_spark.sources import interop, load_table
    got = {r["source"]: r for r in
           interop.jsonl_roundtrip(spark, sf_dir).collect()}
    # same aggregates straight from parquet (no roundtrip)
    from pyspark.sql import functions as F
    want = {r["source"]: r for r in
            load_table(spark, sf_dir, "documents").groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum(interop._row_hash_col())
                 .alias("content_checksum")).collect()}
    assert set(got) == set(want) != set()
    for s in want:
        assert tuple(got[s]) == tuple(want[s])


def test_dedup_incremental_plan_no_cartesian(spark, sf_dir):
    from gcp_datalake_utils_spark.llm import dedup
    plan = _final_plan(dedup.dedup_incremental(spark, sf_dir))
    # candidates come from the banded equi-join only
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the best-match election window partitions on the batch doc
    assert "windowspecdefinition(doc_a" in plan


def test_rules_file_roundtrip_identity():
    from gcp_datalake_utils_spark.rules import config as rc
    assert rc.PatternConfig.from_dict(
        rc.to_reference_dict(rc.DEFAULT)) == rc.DEFAULT
