"""Central registry mapping SURVEY.md §2 operators to (query, oracle) pairs.

Each entry: name -> callable(spark, sf_dir) -> DataFrame, plus a DuckDB
oracle SQL string in ORACLES. Column names are aliased identically on both
sides (the driver's compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from gcp_datalake_utils_spark.operators import (
    asof,
    classify,
    datatest,
    detection,
    graph,
    payload,
    scd2,
    state,
)
from gcp_datalake_utils_spark.operators import detection_oracle as do
from gcp_datalake_utils_spark.formatters import diagrams
from gcp_datalake_utils_spark.formatters import oracles as fmt_oracles
from gcp_datalake_utils_spark.llm import (
    audio,
    boilerplate,
    bpe,
    chunks,
    collocations,
    curation,
    imagededup,
    jpeg,
    flac,
    mp4,
    decontam,
    distmatch,
    domains,
    forget,
    fuzzydedup,
    index,
    lm,
    paradedup,
    packing,
    pq,
    video,
    redact,
    retrieval,
    rollup,
    dedup,
    multimodal,
    ngramdup,
    overlap,
    sampling,
    semdedup,
    similarity,
    similarity_arrow,
    sketches,
    spandedup,
    text,
    tfidf,
)
from gcp_datalake_utils_spark.streaming import ingest as stream_ingest
from gcp_datalake_utils_spark.streaming import stateful as stream_stateful
from gcp_datalake_utils_spark.streaming import windows as stream_windows

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame],
             oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# ---------------------------------------------------------------------------
# REGISTRATION ORDER IS A CORRECTNESS SIGNAL: the driver's per-round
# CORRECTNESS window covers the FIRST 50 entries of QUERIES only.
# Since round 8 the window is set PROGRAMMATICALLY by _rotate_window()
# at the bottom of this file (see the _R8_WINDOW block comment for the
# current rotation rationale) — register() blocks below keep their
# grouping by module/family and no longer encode the window.
# Rotated-out entries keep their prior driver greens (r4/r6/r7);
# tools/check.py always runs ALL entries.
# ---------------------------------------------------------------------------

from gcp_datalake_utils_spark.functions import bloom  # noqa: E402
from gcp_datalake_utils_spark.functions import scale_demos  # noqa: E402
from gcp_datalake_utils_spark.operators import cohort  # noqa: E402
from gcp_datalake_utils_spark.operators import drift  # noqa: E402
from gcp_datalake_utils_spark.operators import funnel  # noqa: E402
from gcp_datalake_utils_spark.operators import nested  # noqa: E402
from gcp_datalake_utils_spark.operators import pivot  # noqa: E402
from gcp_datalake_utils_spark.operators import profile  # noqa: E402
from gcp_datalake_utils_spark.operators import rangejoin  # noqa: E402
from gcp_datalake_utils_spark.sources import evolution  # noqa: E402
from gcp_datalake_utils_spark.sources import partitioned  # noqa: E402
from gcp_datalake_utils_spark.sources import interop  # noqa: E402
from gcp_datalake_utils_spark.sources import zorder  # noqa: E402
from gcp_datalake_utils_spark.sources import snapshots as snap  # noqa: E402

from gcp_datalake_utils_spark.formatters import layout as fmt_layout  # noqa: E402
from gcp_datalake_utils_spark.rules import compiler as rules_compiler  # noqa: E402
from gcp_datalake_utils_spark.rules import config as rules_config  # noqa: E402

# --- block A: NEW / plan-changed in round 7 -------------------------------
register("kmeans_iterate_arrow", similarity_arrow.kmeans_iterate_arrow,
         similarity.KMEANS_ITERATE_ORACLE)
register("lm_doc_scores_arrow", lm.lm_doc_scores_arrow,
         lm.LM_DOC_SCORES_ORACLE)
register("lm_quality_bins_arrow", lm.lm_quality_bins_arrow,
         lm.LM_QUALITY_BINS_ORACLE)
register("value_percentiles_approx", payload.value_percentiles_approx,
         None)
register("embedding_quantize_arrow",
         similarity_arrow.embedding_quantize_arrow,
         similarity.EMBEDDING_QUANTIZE_ORACLE)
register("label_centroids_arrow", similarity_arrow.label_centroids_arrow,
         similarity.LABEL_CENTROIDS_ORACLE)
register("repetition_flags_arrow", text.repetition_flags_arrow,
         text.REPETITION_FLAGS_ORACLE)
register("force_layout_coords",
         lambda s, d: fmt_layout.force_layout_coords(s),
         fmt_layout.FORCE_LAYOUT_COORDS_ORACLE)
register("grid_layout_coords",
         lambda s, d: fmt_layout.grid_layout_coords(s),
         fmt_layout.GRID_LAYOUT_COORDS_ORACLE)
register("rule_compiler_truth",
         lambda s, d: rules_compiler.rule_compiler_truth(s),
         rules_compiler.RULE_COMPILER_TRUTH_ORACLE)
register("profile_orders_approx", profile.profile_orders_approx,
         None)
register("dup_ngram_fraction", ngramdup.dup_ngram_fraction,
         ngramdup.DUP_NGRAM_FRACTION_ORACLE)
register("dup_ngram_stats", ngramdup.dup_ngram_stats,
         ngramdup.DUP_NGRAM_STATS_ORACLE)
register("source_vocab_overlap", overlap.source_vocab_overlap,
         overlap.SOURCE_VOCAB_OVERLAP_ORACLE)
register("cross_source_dup_matrix", dedup.cross_source_dup_matrix,
         dedup.CROSS_SOURCE_DUP_ORACLE)
register("dedup_incremental", dedup.dedup_incremental,
         dedup.DEDUP_INCREMENTAL_ORACLE)
register("forget_propagation", forget.forget_propagation,
         forget.FORGET_PROPAGATION_ORACLE)
register("corpus_budget_selection", curation.corpus_budget_selection,
         curation.CORPUS_BUDGET_ORACLE)
register("admission_pipeline", curation.admission_pipeline,
         curation.ADMISSION_PIPELINE_ORACLE)
register("ingest_screen_stream", stream_ingest.ingest_screen_stream_q,
         stream_ingest.INGEST_SCREEN_ORACLE)
register("retention_cohorts", cohort.retention_cohorts,
         cohort.RETENTION_COHORTS_ORACLE)
register("path_transitions", cohort.path_transitions,
         cohort.PATH_TRANSITIONS_ORACLE)
register("rfm_segments", cohort.rfm_segments,
         cohort.RFM_SEGMENTS_ORACLE)
register("active_users_rolling7", cohort.active_users_rolling7,
         cohort.ACTIVE_USERS_ROLLING7_ORACLE)
# round 9: the cohort family over the maintained daily-activity
# pre-agg (r8 verdict ask #4) — same oracles as the raw-events anchors
register("retention_cohorts_preagg", cohort.retention_cohorts_preagg,
         cohort.RETENTION_COHORTS_ORACLE)
register("path_transitions_preagg", cohort.path_transitions_preagg,
         cohort.PATH_TRANSITIONS_ORACLE)
register("active_users_rolling7_preagg",
         cohort.active_users_rolling7_preagg,
         cohort.ACTIVE_USERS_ROLLING7_ORACLE)
register("active_users_rolling7_sweep",
         cohort.active_users_rolling7_sweep,
         cohort.ACTIVE_USERS_ROLLING7_ORACLE)
register("daily_activity_cdc", cohort.daily_activity_cdc,
         cohort.DAILY_ACTIVITY_CDC_ORACLE)
# round 9: domain/URL curation family (r8 verdict ask #7)
register("domain_quota_sample", domains.domain_quota_sample,
         domains.DOMAIN_QUOTA_SAMPLE_ORACLE)
register("domain_quality_prior", domains.domain_quality_prior,
         domains.DOMAIN_QUALITY_PRIOR_ORACLE)
register("domain_dedup_rollup", domains.domain_dedup_rollup,
         domains.DOMAIN_DEDUP_ROLLUP_ORACLE)
# round 9: tokenizer-aware packing twin (r8 verdict ask #8)
register("sequence_packing_bpe", packing.sequence_packing_bpe,
         packing.SEQUENCE_PACKING_BPE_ORACLE)
# round 9: dynamic partition pruning over the day-partitioned store
register("events_dpp_join", partitioned.events_dpp_join,
         partitioned.EVENTS_DPP_JOIN_ORACLE)
# round 9: per-source decile calibration (group-boundary ntile)
register("source_length_deciles", curation.source_length_deciles,
         curation.SOURCE_LENGTH_DECILES_ORACLE)
# round 9: streaming maintainer of the daily-activity store (stream
# state == batch full recompute, same oracle as daily_activity_cdc)
register("daily_activity_stream", stream_windows.daily_activity_stream_q,
         cohort.DAILY_ACTIVITY_CDC_ORACLE)
# round 10: stream -> STORE wiring (r9 verdict ask #4) — the drained
# finalized day windows are APPENDED into the user-bucketed store and
# the post-append store itself is hashed against the full recompute
register("daily_activity_store_stream",
         stream_windows.daily_activity_store_stream_q,
         cohort.DAILY_ACTIVITY_CDC_ORACLE)
register("source_length_deciles_approx",
         curation.source_length_deciles_approx, None)
# round 9: semantic decontamination (bench-matrix broadcast GEMM)
register("embedding_decontamination",
         similarity_arrow.embedding_decontamination,
         similarity_arrow.EMBEDDING_DECONTAMINATION_ORACLE)
# round 10: substring-span dedup removal (r9 verdict ask #1)
register("span_dedup_removal", spandedup.span_dedup_removal,
         spandedup.SPAN_DEDUP_REMOVAL_ORACLE)
register("span_dedup_rollup", spandedup.span_dedup_rollup,
         spandedup.SPAN_DEDUP_ROLLUP_ORACLE)
# round 10: benchmark-span SCRUBBING — the decontamination transform
# (remove contaminated spans, keep the document) built from the span
# sweep + the broadcast benchmark gram set
register("contamination_span_scrub", spandedup.contamination_span_scrub,
         spandedup.CONTAMINATION_SPAN_SCRUB_ORACLE)
register("contamination_scrub_rollup",
         spandedup.contamination_scrub_rollup,
         spandedup.CONTAMINATION_SCRUB_ROLLUP_ORACLE)
# round 10: distribution-matching selection — hashed-feature NB
# quality/domain classifier + DSIR importance weights (Xie et al.)
register("nb_lang_classifier", distmatch.nb_lang_classifier,
         distmatch.NB_LANG_CLASSIFIER_ORACLE)
register("dsir_importance_weights", distmatch.dsir_importance_weights,
         distmatch.DSIR_IMPORTANCE_WEIGHTS_ORACLE)
# round 10: deterministic training-shard shuffle — the pipeline's
# last step (N independent in-partition sorts, no global sort)
register("training_shard_shuffle", sampling.training_shard_shuffle,
         sampling.TRAINING_SHARD_SHUFFLE_ORACLE)
# round 11: token-balanced contiguous sharding — the count-balanced
# shuffle's token-mass twin (distributed cumsum, no global window)
register("token_balanced_shards", sampling.token_balanced_shards,
         sampling._token_balanced_oracle())
# round 11: real RIFF/PCM WAV codec (encode -> chunk-walking decode ->
# audio features); the codec stub now covers compressed formats only
register("wav_decode_features", multimodal.wav_decode_features,
         multimodal.WAV_DECODE_FEATURES_ORACLE)
register("pgm_resize_features", multimodal.pgm_resize_features,
         multimodal.PGM_RESIZE_FEATURES_ORACLE)
# round 12: real PNG codec via stdlib zlib (CRC-verified chunk walk,
# multi-IDAT inflate, all five scanline unfilters) — the first
# COMPRESSED format decoded for real; the stub now covers only
# formats whose codecs the container genuinely lacks (JPEG/MP4/FLAC)
register("png_decode_features", multimodal.png_decode_features,
         multimodal.PNG_DECODE_FEATURES_ORACLE)
# round 12: incremental curation funnel — admit a new batch against
# the CONVERGED store (store-precedence near-dup screen + batch
# exact/fuzzy/quality), oracle = from-scratch SQL recompute of the
# same semantics (the dedup_incremental / daily_activity_cdc pattern)
register("curation_incremental", curation.curation_incremental,
         curation._curation_incremental_oracle())
# round 12: image near-dup dedup over REAL-decoded PNG pixels —
# perceptual dHash (area-mean 8x9 grid, 64 comparison bits) +
# 4x16-bit banded Hamming join (the simhash64 shape on the
# multimodal column)
register("image_dhash", imagededup.image_dhash,
         imagededup.IMAGE_DHASH_ORACLE)
register("image_near_dups", imagededup.image_near_dups,
         imagededup.IMAGE_NEAR_DUPS_ORACLE)
# round 12: baseline JPEG codec (Annex K tables, Huffman + DCT, FF
# stuffing) - lossy, so the row is a rows-only round-trip-error
# monitor (the bpe_token_stats convention), pytest-bracketed incl. a
# hand-assembled golden bitstream
register("jpeg_roundtrip_quality", jpeg.jpeg_roundtrip_quality, None)
# round 13: baseline FLAC codec (fixed predictors + Rice coding,
# CRC-8/16, STREAMINFO MD5 self-check) — LOSSLESS, so unlike JPEG the
# row is fully oracled: features come from the decoded samples and
# the oracle re-derives them from the generative formula (n_frames
# additionally gates the framing). Registered after the r13 rotation
# -> tail of QUERIES, heads the r14 never-hashed queue.
register("flac_decode_features", flac.flac_decode_features,
         flac.FLAC_DECODE_FEATURES_ORACLE)
# round 13: ISO BMFF (MP4) container metadata — the box grammar is
# real (builder + recursive walker, largesize + unknown-box skip);
# only the codec PAYLOAD decode remains stubbed in decode_media.
# Registered after the r13 rotation -> r14 never-hashed queue.
register("mp4_metadata", mp4.mp4_metadata, mp4.MP4_METADATA_ORACLE)
# round 13: product quantization (Jegou et al. 2011) — per-subspace
# Lloyd codebooks, 8-code encodings, ADC top-k, recall audit; the
# compressed-storage half of IVF-PQ (the >= 1e9-vector memory lever).
# Registered after the r13 rotation -> r14 never-hashed queue.
# round 13: audio fingerprinting — Walsh-Hadamard sequency landmarks
# (integer-exact cross-engine by construction, no libm in the gate)
# through the real WAV round-trip; near-dup completes the
# four-modality dedup matrix (text / image / video / audio).
register("audio_fingerprint", audio.audio_fingerprint,
         audio.AUDIO_FINGERPRINT_ORACLE)
register("audio_near_dups", audio.audio_near_dups,
         audio.AUDIO_NEAR_DUPS_ORACLE)
# round 13: MJ-PNG video pipeline — real multi-sample MP4 tables
# (variable stsz + stsc + stco), sample-table-driven frame
# extraction, lossless per-frame decode, stride sampling, and video
# near-dup over frame signatures through the hybrid banded engine.
register("video_frame_sample", video.video_frame_sample,
         video.VIDEO_FRAME_SAMPLE_ORACLE)
register("video_near_dups", video.video_near_dups,
         video.VIDEO_NEAR_DUPS_ORACLE)
register("pq_codes", pq.pq_codes, pq.PQ_CODES_ORACLE)
register("pq_codes_arrow", pq.pq_codes_arrow, pq.PQ_CODES_ORACLE)
register("pq_codes_sampled", pq.pq_codes_sampled,
         pq.PQ_CODES_SAMPLED_ORACLE)
register("ivf_pq_topk", pq.ivf_pq_topk, pq.IVF_PQ_TOPK_ORACLE)
register("pq_adc_topk", pq.pq_adc_topk, pq.PQ_ADC_TOPK_ORACLE)
register("pq_recall_audit", pq.pq_recall_audit,
         pq.PQ_RECALL_AUDIT_ORACLE)
# round 12: the updated per-source ledger after a batch admission
register("curation_incremental_rollup",
         curation.curation_incremental_rollup,
         curation._curation_incremental_rollup_oracle())
# round 10: broadcast-vocab BPE tokenizer (r9 verdict ask #7);
# token_stats/packing rows are rows-only by design (iterative merge
# training is not SQL-expressible) and pytest-bracketed vs a driver
# replica; pair_counts is the hash-checked training-input anchor
register("bpe_pair_counts", bpe.bpe_pair_counts,
         bpe.BPE_PAIR_COUNTS_ORACLE)
register("bpe_token_stats", bpe.bpe_token_stats, None)
register("sequence_packing_bpe_real", packing.sequence_packing_bpe_real,
         None)
# round 10: the approx-distinct twin that closes the
# revenue_by_nation_preagg exact-distinct book (rows-only monitor,
# pytest-bracketed against the exact twin like the other sketches)
register("revenue_by_nation_approx", scale_demos.revenue_by_nation_approx,
         None)
# round 10: unpruned control for the DPP row — same result by
# construction (same oracle); bench reports the pruned-vs-unpruned
# Spark delta as the row's headline
register("events_dpp_join_unpruned", partitioned.events_dpp_join_unpruned,
         partitioned.EVENTS_DPP_JOIN_ORACLE)
# round 11: fuzzy dedup as ONE restartable pipeline (r10 verdict ask
# #1) — shingle->LSH->CC->canonicalize->remove with durable stage +
# per-iteration checkpoints; doc-level verdict + removal ledger
register("fuzzy_dedup_removal", fuzzydedup.fuzzy_dedup_removal,
         fuzzydedup.FUZZY_DEDUP_REMOVAL_ORACLE)
register("fuzzy_dedup_rollup", fuzzydedup.fuzzy_dedup_rollup,
         fuzzydedup.FUZZY_DEDUP_ROLLUP_ORACLE)
# round 11: quantized ANN at rest (r10 verdict ask #2) — int8-code
# prefilter feeds the banded near-dup verify; only survivors touch
# float vectors
register("embedding_near_dups_quantized",
         similarity.embedding_near_dups_quantized,
         similarity.EMBEDDING_NEAR_DUP_QUANTIZED_ORACLE)
# round 11: CLI display-toggle golden-line delta rows (r10 verdict ask
# #6) — one oracled row per reference main.py:49-63 toggle
register("mermaid_erd_lines_untyped",
         lambda s, d: diagrams.mermaid_lines(s, show_column_types=False),
         fmt_oracles.mermaid_lines_oracle(show_column_types=False))
register("plantuml_erd_lines_nonull",
         lambda s, d: diagrams.plantuml_lines(
             s, show_column_nullable=False),
         fmt_oracles.plantuml_lines_oracle(show_column_nullable=False))
register("mermaid_erd_lines_noviews",
         lambda s, d: diagrams.mermaid_lines_noviews(s),
         fmt_oracles.mermaid_lines_oracle(include_views=False,
                                          include_external=False))
register("drawio_erd_lines_dark",
         lambda s, d: diagrams.drawio_lines(s, theme="dark"),
         fmt_oracles.drawio_lines_oracle(theme="dark"))
# round 11: SemDeDup (Abbas et al. 2023) — k-means quantizer ->
# cluster-banded eps-pairs -> CC -> keep the least-centroid-similar
# representative per semantic group
register("semantic_dedup", semdedup.semantic_dedup,
         semdedup.SEMANTIC_DEDUP_ORACLE)
register("semantic_dedup_rollup", semdedup.semantic_dedup_rollup,
         semdedup.SEMANTIC_DEDUP_ROLLUP_ORACLE)
# round 11: the production curation FUNNEL — exact -> fuzzy(LSH over
# exact survivors) -> quality, per-doc monotone verdict + per-source
# stage ledger
register("curation_funnel", curation.curation_funnel,
         curation._funnel_oracle())
register("curation_funnel_rollup", curation.curation_funnel_rollup,
         curation._funnel_rollup_oracle())
register("jsonl_roundtrip", interop.jsonl_roundtrip,
         interop.JSONL_ROUNDTRIP_ORACLE)
register("csv_roundtrip", interop.csv_roundtrip,
         interop.CSV_ROUNDTRIP_ORACLE)

# --- block B: the 26 r3-stale driver greens (r6 verdict ask #1) -----------
register("user_sessions", stream_windows.user_sessions,
         stream_windows.USER_SESSIONS_ORACLE)
register("windowed_counts_stream", stream_windows.windowed_counts_stream_q,
         stream_windows.WINDOWED_COUNTS_STREAM_ORACLE)
register("dedup_stream", stream_windows.dedup_stream_q,
         stream_windows.DEDUP_STREAM_ORACLE)
register("sliding_counts_stream", stream_windows.sliding_counts_stream_q,
         stream_windows.SLIDING_COUNTS_STREAM_ORACLE)
register("closed_sessions_stream",
         stream_stateful.closed_sessions_stream_q,
         stream_stateful.CLOSED_SESSIONS_ORACLE)
register("enriched_segment_stream", stream_windows.enriched_segment_stream_q,
         stream_windows.ENRICHED_SEGMENT_STREAM_ORACLE)
register("click_attribution_stream",
         stream_windows.click_attribution_stream_q,
         stream_windows.CLICK_ATTRIBUTION_STREAM_ORACLE)
register("dedup_near_pairs", dedup.near_dup_pairs, dedup.NEAR_DUP_ORACLE)
register("dedup_groups", dedup.dedup_groups, dedup.DEDUP_GROUPS_ORACLE)
register("dedup_simhash", dedup.simhash, dedup.SIMHASH_ORACLE)
register("simhash_near_pairs", dedup.simhash_near_pairs,
         dedup.SIMHASH_NEAR_PAIRS_ORACLE)
register("decontamination_hashed", decontam.decontamination_hashed,
         decontam.DECONTAMINATION_ORACLE)
register("decontamination", decontam.decontamination,
         decontam.DECONTAMINATION_ORACLE)
register("text_token_stats", text.token_stats, text.TOKEN_STATS_ORACLE)
register("text_fingerprints", text.fingerprints,
         text.FINGERPRINTS_ORACLE)
register("repetition_flags", text.repetition_flags,
         text.REPETITION_FLAGS_ORACLE)
register("vocab_entropy", text.vocab_entropy,
         text.VOCAB_ENTROPY_ORACLE)
register("doc_chunks", chunks.doc_chunks, chunks.DOC_CHUNKS_ORACLE)
register("asof_last_order", asof.asof_last_order,
         asof.ASOF_LAST_ORDER_ORACLE)
register("scd2_history", scd2.scd2_history, scd2.SCD2_HISTORY_ORACLE)
register("corpus_curation", curation.curate, curation.CURATE_ORACLE)
register("train_val_split", curation.train_val_split,
         curation.TRAIN_VAL_SPLIT_ORACLE)
register("pii_redaction", redact.pii_redaction,
         redact.PII_REDACTION_ORACLE)
register("boilerplate_flags", boilerplate.boilerplate_flags,
         boilerplate.BOILERPLATE_FLAGS_ORACLE)
register("media_frame_sample", multimodal.media_frame_sample,
         multimodal.MEDIA_FRAME_SAMPLE_ORACLE)
register("media_resize", multimodal.media_resize,
         multimodal.MEDIA_RESIZE_ORACLE)
register("multimodal_features", multimodal.media_features,
         multimodal.MEDIA_FEATURES_ORACLE)
register("similarity_kmeans_assign", similarity.kmeans_assign,
         similarity.KMEANS_ASSIGN_ORACLE)
register("value_percentiles", payload.value_percentiles,
         payload.VALUE_PERCENTILES_ORACLE)
register("rules_file_source",
         lambda s, d: rules_config.rules_file_source(s),
         rules_config.RULES_FILE_SOURCE_ORACLE)

# --- block C: r4-green refreshes (window filler to 50) --------------------
register("revenue_by_nation", payload.revenue_by_nation,
         payload.REVENUE_BY_NATION_ORACLE)
register("revenue_by_nation_bucketed",
         scale_demos.revenue_by_nation_bucketed,
         payload.REVENUE_BY_NATION_ORACLE)
register("revenue_by_nation_preagg", scale_demos.revenue_by_nation_preagg,
         payload.REVENUE_BY_NATION_ORACLE)
register("revenue_by_nation_salted", scale_demos.revenue_by_nation_salted,
         payload.REVENUE_BY_NATION_ORACLE)
register("profile_orders", profile.profile_orders,
         profile.PROFILE_ORDERS_ORACLE)
register("paragraph_dedup", paradedup.paragraph_dedup,
         paradedup.PARAGRAPH_DEDUP_ORACLE)
register("kmeans_iterate", similarity.kmeans_iterate,
         similarity.KMEANS_ITERATE_ORACLE)
register("funnel_conversion", funnel.funnel_conversion,
         funnel.FUNNEL_CONVERSION_ORACLE)
register("funnel_completions_stream",
         stream_stateful.funnel_completions_stream_q,
         stream_stateful.FUNNEL_COMPLETIONS_ORACLE)
register("hll_distinct", sketches.hll_distinct,
         sketches.HLL_DISTINCT_ORACLE)
register("hll_grouped", sketches.hll_grouped,
         sketches.HLL_GROUPED_ORACLE)
register("cms_heavy_hitters", sketches.cms_heavy_hitters,
         sketches.CMS_HEAVY_HITTERS_ORACLE)
register("bloom_prefilter_audit", bloom.bloom_prefilter_audit,
         bloom.BLOOM_PREFILTER_AUDIT_ORACLE)
register("incremental_agg", snap.incremental_agg_query,
         snap.INCREMENTAL_AGG_ORACLE)
register("retention_policy", snap.retention_policy_query,
         snap.RETENTION_POLICY_ORACLE)
register("snapshot_diff", snap.snapshot_diff_query,
         snap.SNAPSHOT_DIFF_ORACLE)
register("restore_summary", snap.restore_summary_query,
         snap.RESTORE_SUMMARY_ORACLE)
register("detect_foreign_key",
         lambda s, d: detection.detect_foreign_keys(s),
         do.strategy_oracle("j1"))
register("pagerank_tables", graph.pagerank_query,
         graph.pagerank_oracle())
register("stratified_sample", sampling.stratified_sample,
         sampling.STRATIFIED_SAMPLE_ORACLE)
register("events_by_type_two_phase", scale_demos.events_by_type_two_phase,
         scale_demos.EVENTS_BY_TYPE_ORACLE)
register("prefix_filter_pairs", dedup.prefix_filter_pairs,
         dedup.PREFIX_FILTER_PAIRS_ORACLE)
register("simhash64", dedup.simhash64, dedup.SIMHASH64_ORACLE)

# --- rotated out of the window (driver greens held from r4/r6) ------------
register("simhash64_near_pairs", dedup.simhash64_near_pairs,
         dedup.SIMHASH64_NEAR_PAIRS_ORACLE)
register("pmi_collocations", collocations.pmi_collocations,
         collocations.PMI_COLLOCATIONS_ORACLE)
register("value_drift_psi", drift.value_drift_psi,
         drift.VALUE_DRIFT_PSI_ORACLE)
register("corpus_mixture", sampling.corpus_mixture,
         sampling.CORPUS_MIXTURE_ORACLE)
register("drawio_erd_lines",
         lambda s, d: diagrams.drawio_lines(s),
         fmt_oracles.drawio_lines_oracle())
register("hll_distinct_native", sketches.hll_distinct_native,
         sketches.HLL_DISTINCT_NATIVE_ORACLE)
register("profile_orders_fast", profile.profile_orders_fast,
         profile.PROFILE_ORDERS_FAST_ORACLE)
register("lm_doc_scores", lm.lm_doc_scores, lm.LM_DOC_SCORES_ORACLE)
register("lm_doc_scores_pruned", lm.lm_doc_scores_pruned,
         lm.LM_DOC_SCORES_PRUNED_ORACLE)
register("lm_quality_bins", lm.lm_quality_bins,
         lm.LM_QUALITY_BINS_ORACLE)
register("weighted_sample", sampling.weighted_sample,
         sampling.WEIGHTED_SAMPLE_ORACLE)
register("detect_naming_convention",
         lambda s, d: detection.detect_naming_conventions(s),
         do.strategy_oracle("j4"))
register("detect_enhanced_pk_fk",
         lambda s, d: detection.detect_enhanced_pk_fk(s),
         do.strategy_oracle("j2"))
register("detect_data_type_match",
         lambda s, d: detection.detect_data_type_matches(s),
         do.strategy_oracle("j3"))
register("detect_custom_rules",
         lambda s, d: detection.apply_custom_rules(s),
         do.strategy_oracle("j5"))
register("data_test_report", datatest.data_test_report,
         datatest.data_test_oracle())
register("adaptive_sample_size", datatest.adaptive_sample_sizes,
         datatest.adaptive_sample_oracle())
register("detect_pipeline",
         lambda s, d: detection.detect_all(s),
         do.pipeline_oracle())
register("classify_pk_fk", classify.classification_query,
         classify.classification_oracle())
register("schema_complexity", classify.schema_complexity_query,
         classify.schema_complexity_oracle())
register("top_orders_per_customer", payload.top_orders_per_customer,
         payload.TOP_ORDERS_ORACLE)
register("frequency_distribution", payload.frequency_distribution,
         payload.FREQUENCY_ORACLE)
register("distinct_cardinalities", payload.distinct_cardinalities,
         payload.DISTINCT_ORACLE)
register("orphan_users", payload.orphan_users,
         payload.ORPHAN_USERS_ORACLE)
register("common_keys", payload.common_keys,
         payload.COMMON_KEYS_ORACLE)
register("scalar_battery", payload.scalar_battery,
         payload.SCALAR_BATTERY_ORACLE)
register("events_hourly", payload.events_hourly,
         payload.EVENTS_HOURLY_ORACLE)
register("audit_window_scan", payload.audit_window_scan,
         payload.AUDIT_WINDOW_ORACLE)
register("timestamp_battery", payload.timestamp_battery,
         payload.TIMESTAMP_BATTERY_ORACLE)
register("graph_roots", graph.roots_query, graph.roots_oracle())
register("graph_bfs_levels", graph.bfs_levels_query,
         graph.bfs_levels_oracle())
register("checksum_gate", state.checksum_gate,
         state.checksum_gate_oracle())
register("state_staleness", state.staleness, state.staleness_oracle())
register("quality_report", state.quality_report,
         state.quality_report_oracle())
register("quality_by_method", state.quality_by_method,
         state.quality_by_method_oracle())
register("mermaid_erd_lines",
         lambda s, d: diagrams.mermaid_lines(s),
         fmt_oracles.mermaid_lines_oracle())
register("plantuml_erd_lines",
         lambda s, d: diagrams.plantuml_lines(s),
         fmt_oracles.plantuml_lines_oracle())
register("dedup_exact_groups", dedup.exact_dup_groups,
         dedup.EXACT_DUP_ORACLE)
register("sequence_packing", packing.sequence_packing,
         packing.SEQUENCE_PACKING_ORACLE)
register("text_language_id", text.language_id, text.LANGUAGE_ID_ORACLE)
register("c4_quality_filters", text.c4_quality_filters,
         text.C4_QUALITY_FILTERS_ORACLE)
register("dedup_minhash_signatures", dedup.minhash_signatures,
         dedup.MINHASH_ORACLE)
register("dedup_lsh_buckets", dedup.lsh_bucket_stats,
         dedup.LSH_BUCKETS_ORACLE)
register("dedup_keep_best", dedup.dedup_keep_best,
         dedup._keep_best_oracle())
register("corpus_rollup", rollup.corpus_rollup,
         rollup.CORPUS_ROLLUP_ORACLE)
register("similarity_cosine_topk", similarity.cosine_topk,
         similarity.COSINE_TOPK_ORACLE)
register("similarity_ivf_topk", similarity.ivf_topk,
         similarity.IVF_TOPK_ORACLE)
register("similarity_rp_lsh_buckets", similarity.rp_lsh_buckets,
         similarity.RP_LSH_BUCKETS_ORACLE)
register("catalog_tables", payload.catalog_tables,
         payload.catalog_tables_oracle())
register("sample_scan", payload.sample_scan, payload.SAMPLE_SCAN_ORACLE)
register("table_batching_rank", payload.table_batching_rank,
         payload.table_batching_oracle())
register("events_props_json", payload.events_props_json,
         payload.EVENTS_PROPS_JSON_ORACLE)
register("relationships_per_table", state.relationships_per_table,
         state.relationships_per_table_oracle())
register("state_upsert", state.state_upsert, state.state_upsert_oracle())
register("cache_lookup", state.cache_lookup, state.cache_lookup_oracle())
register("metadata_richness", payload.metadata_richness,
         payload.metadata_richness_oracle())
register("batch_ann64_topk", similarity.batch_ann64_topk,
         similarity.BATCH_ANN64_TOPK_ORACLE)
register("order_lines_nested_bucketed", nested.order_lines_nested_bucketed,
         nested.ORDER_LINES_NESTED_ORACLE)
register("order_lines_nested", nested.order_lines_nested,
         nested.ORDER_LINES_NESTED_ORACLE)
register("robust_outliers", payload.robust_outliers,
         payload.ROBUST_OUTLIERS_ORACLE)
register("corpus_mixture_temp", sampling.corpus_mixture_temp,
         sampling.CORPUS_MIXTURE_TEMP_ORACLE)
register("pricing_summary", payload.pricing_summary,
         payload.PRICING_SUMMARY_ORACLE)
register("bm25_topk", retrieval.bm25_topk, retrieval.BM25_TOPK_ORACLE)
register("bm25_topk_capped", retrieval.bm25_topk_capped,
         retrieval.BM25_TOPK_CAPPED_ORACLE)
register("inverted_index", index.inverted_index,
         index.INVERTED_INDEX_ORACLE)
register("embedding_quantize", similarity.embedding_quantize,
         similarity.EMBEDDING_QUANTIZE_ORACLE)
register("tfidf_top_terms", tfidf.tfidf_top_terms,
         tfidf.TFIDF_TOP_TERMS_ORACLE)
register("corpus_vocabulary", tfidf.corpus_vocabulary,
         tfidf.CORPUS_VOCABULARY_ORACLE)
register("label_centroids", similarity.label_centroids,
         similarity.LABEL_CENTROIDS_ORACLE)
register("events_in_type_windows", rangejoin.events_in_type_windows,
         rangejoin.EVENTS_IN_TYPE_WINDOWS_ORACLE)
register("ann_recall_audit", similarity.ann_recall_audit,
         similarity.ANN_RECALL_AUDIT_ORACLE)
register("cosine_topk_arrow", similarity_arrow.cosine_topk_arrow,
         similarity.COSINE_TOPK_ORACLE)
register("ann_rerank", similarity_arrow.ann_rerank,
         similarity_arrow.ANN_RERANK_ORACLE)
register("embedding_near_dups_auto", similarity.embedding_near_dups_auto,
         similarity.EMBEDDING_NEAR_DUPS_AUTO_ORACLE)
# round 13 (r12 verdict asks #4 and #6): the label-group-sharded
# candidate path is result-identical to the auto path by construction
# (pytest set-equality) — registered over the PLANTED corpus so the
# driver hash is evidence on 12 real pairs, not the empty set (auto
# itself hashes 0 rows at sf0.01; the r11 quantized-row lesson). This
# makes the declared >= 1e9-vector plan driver-gated, not pytest-only.
# The 128-dim row gates the dims-generic plane family at a width with
# no historical evidence (64 was the only driver-hashed width).
register("embedding_near_dups_sharded",
         similarity.embedding_near_dups_sharded_planted,
         similarity.EMBEDDING_NEAR_DUPS_SHARDED_ORACLE)
register("embedding_near_dups_128", similarity.embedding_near_dups_128,
         similarity.EMBEDDING_NEAR_DUPS_128_ORACLE)
register("embedding_near_dups64", similarity.embedding_near_dups64,
         similarity.EMBEDDING_NEAR_DUP64_ORACLE)
register("evolving_read", evolution.evolving_read,
         evolution.EVOLVING_READ_ORACLE)
register("events_pivot", pivot.events_pivot,
         pivot.EVENTS_PIVOT_ORACLE)
register("events_rolling", pivot.events_rolling,
         pivot.EVENTS_ROLLING_ORACLE)
register("events_gapfill", pivot.events_gapfill,
         pivot.EVENTS_GAPFILL_ORACLE)
register("zorder_layout", zorder.zorder_layout,
         zorder.ZORDER_LAYOUT_ORACLE)
register("similarity_embedding_near_dups", similarity.embedding_near_dups,
         similarity.EMBEDDING_NEAR_DUP_ORACLE)
register("batch_ann_topk", similarity.batch_ann_topk,
         similarity.BATCH_ANN_TOPK_ORACLE)
register("similarity_rp_lsh_topk", similarity.rp_lsh_topk,
         similarity.RP_LSH_TOPK_ORACLE)
# round 10: incremental embedding admission against the persisted
# corpus signature store (the embedding analog of dedup_incremental)
register("embedding_incremental_dedup",
         similarity.embedding_incremental_dedup,
         similarity.EMBEDDING_INCREMENTAL_DEDUP_ORACLE)


# ---------------------------------------------------------------------------
# ROUND-9 WINDOW ROTATION (r8 verdict ask #1). The driver hashes the
# FIRST 50 entries of QUERIES each round. The r9 window:
#   (1) the 8 round-8 additions the driver has never hashed
#       (decontamination_hashed, rfm_segments, bm25_topk,
#       c4_quality_filters, media_frame_sample, media_resize,
#       incremental_agg, retention_policy);
#   (2) the 3 r4 leftovers promised since r8 (simhash64,
#       corpus_mixture_temp, events_gapfill);
#   (3) operators NEW in round 9 (appended to _R9_NEW as they land);
#   (4) backfill with the rows whose newest driver green is round 6 —
#       the oldest hard evidence remaining in the registry.
# The two rows-only sketch monitors (value_percentiles_approx,
# profile_orders_approx) stay out by design: no oracle, `err:
# no_oracle` rows would be noise; they are pytest-bracketed instead.
# ---------------------------------------------------------------------------

_R9_NEVER_HASHED = [
    "decontamination_hashed",
    "rfm_segments",
    "bm25_topk",
    "c4_quality_filters",
    "media_frame_sample",
    "media_resize",
    "incremental_agg",
    "retention_policy",
    "simhash64",
    "corpus_mixture_temp",
    "events_gapfill",
]

# new round-9 operators — window slots reserved ahead of backfill
_R9_NEW: list[str] = [
    "bm25_topk_capped",
    "retention_cohorts_preagg",
    "path_transitions_preagg",
    "active_users_rolling7_preagg",
    "active_users_rolling7_sweep",
    "daily_activity_cdc",
    "domain_quota_sample",
    "domain_quality_prior",
    "domain_dedup_rollup",
    "sequence_packing_bpe",
    "events_dpp_join",
    "source_length_deciles",
    "daily_activity_stream",
    "embedding_decontamination",
]

# oldest remaining driver evidence (newest green = r6), in prior
# registry order; trimmed to fit the 50-slot budget after the never-
# hashed rows and the round-9 additions
_R9_BACKFILL_R6 = [
    "drawio_erd_lines",
    "hll_distinct_native",
    "profile_orders_fast",
    "lm_doc_scores",
    "lm_quality_bins",
    "weighted_sample",
    "detect_naming_convention",
    "detect_enhanced_pk_fk",
    "detect_data_type_match",
    "detect_custom_rules",
    "data_test_report",
    "adaptive_sample_size",
    "detect_pipeline",
    "classify_pk_fk",
    "schema_complexity",
    "top_orders_per_customer",
    "frequency_distribution",
    "distinct_cardinalities",
    "orphan_users",
    "common_keys",
    "scalar_battery",
    "events_hourly",
    "audit_window_scan",
    "timestamp_battery",
    "graph_roots",
    "graph_bfs_levels",
    "checksum_gate",
    "state_staleness",
    "quality_report",
    "quality_by_method",
    "mermaid_erd_lines",
    "plantuml_erd_lines",
    "dedup_exact_groups",
    "sequence_packing",
    "text_language_id",
    "dedup_minhash_signatures",
    "dedup_lsh_buckets",
    "dedup_keep_best",
    "corpus_rollup",
]

def _rotate_window(priority: list[str], just_past: list[str]) -> None:
    global QUERIES
    head = [*priority, *just_past]
    missing = [q for q in head if q not in QUERIES]
    assert not missing, f"window names unknown: {missing}"
    assert len(priority) == 50, len(priority)
    rest = [k for k in QUERIES if k not in set(head)]
    QUERIES = {k: QUERIES[k] for k in [*head, *rest]}


_r9_head = [*_R9_NEVER_HASHED, *_R9_NEW]
_r9_fill = _R9_BACKFILL_R6[: 50 - len(_r9_head)]
_rotate_window([*_r9_head, *_r9_fill],
               _R9_BACKFILL_R6[50 - len(_r9_head):])


# ---------------------------------------------------------------------------
# ROUND-10 WINDOW ROTATION (r9 verdict ask #5). Applied after (and
# superseding) the r9 rotation above, which is kept as the evidence
# record of what round 9 hashed. The r10 window:
#   (1) the round-10 additions the driver has never hashed (span dedup
#       removal + rollup, BPE pair counts, the stream->store gate, the
#       DPP unpruned control) — the rows-only monitors
#       (bpe_token_stats, sequence_packing_bpe_real,
#       revenue_by_nation_approx) stay out by the established
#       convention: no oracle, pytest-bracketed instead;
#   (2) embedding_near_dups_auto — driver-green in r8, but round 10
#       changed its knob contract (bits uncapped + band compensation)
#       and its oracle, so the r8 hash is stale evidence;
#   (3) ALL 25 rows whose newest driver green is round 6 (the
#       _R9_BACKFILL_R6 tail that missed the r9 window plus the 11
#       r6 rows never rotated) — after this round no oracled row's
#       newest driver green is older than round 7;
#   (4) backfill to 50 with the oldest round-7 rows in registry order.
# ---------------------------------------------------------------------------

_R10_NEW = [
    "span_dedup_removal",
    "span_dedup_rollup",
    "contamination_span_scrub",
    "contamination_scrub_rollup",
    "nb_lang_classifier",
    "dsir_importance_weights",
    "training_shard_shuffle",
    "bpe_pair_counts",
    "daily_activity_store_stream",
    "events_dpp_join_unpruned",
    "embedding_near_dups_auto",
    "embedding_incremental_dedup",
]

_R10_R6_STALE = [
    "graph_bfs_levels",
    "checksum_gate",
    "state_staleness",
    "quality_report",
    "quality_by_method",
    "mermaid_erd_lines",
    "plantuml_erd_lines",
    "dedup_exact_groups",
    "sequence_packing",
    "text_language_id",
    "dedup_minhash_signatures",
    "dedup_lsh_buckets",
    "dedup_keep_best",
    "corpus_rollup",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "similarity_rp_lsh_buckets",
    "catalog_tables",
    "sample_scan",
    "table_batching_rank",
    "events_props_json",
    "relationships_per_table",
    "state_upsert",
    "cache_lookup",
    "metadata_richness",
]

# the 48 rows whose newest driver green is round 7, in registry order;
# the head fills the r10 window, the tail is the r11 rotation's queue
_R10_R7_QUEUE = [
    "kmeans_iterate_arrow",
    "lm_doc_scores_arrow",
    "lm_quality_bins_arrow",
    "embedding_quantize_arrow",
    "label_centroids_arrow",
    "repetition_flags_arrow",
    "force_layout_coords",
    "rule_compiler_truth",
    "dup_ngram_fraction",
    "dup_ngram_stats",
    "source_vocab_overlap",
    "cross_source_dup_matrix",
    "dedup_incremental",
    "forget_propagation",
    "corpus_budget_selection",
    "admission_pipeline",
    "ingest_screen_stream",
    "retention_cohorts",
    "path_transitions",
    "active_users_rolling7",
    "jsonl_roundtrip",
    "csv_roundtrip",
    "user_sessions",
    "windowed_counts_stream",
    "dedup_stream",
    "sliding_counts_stream",
    "closed_sessions_stream",
    "enriched_segment_stream",
    "click_attribution_stream",
    "dedup_near_pairs",
    "dedup_groups",
    "dedup_simhash",
    "simhash_near_pairs",
    "decontamination",
    "text_token_stats",
    "text_fingerprints",
    "repetition_flags",
    "vocab_entropy",
    "doc_chunks",
    "asof_last_order",
    "scd2_history",
    "corpus_curation",
    "train_val_split",
    "pii_redaction",
    "boilerplate_flags",
    "multimodal_features",
    "similarity_kmeans_assign",
    "value_percentiles",
]

_r10_head = [*_R10_NEW, *_R10_R6_STALE]
_r10_fill = _R10_R7_QUEUE[: 50 - len(_r10_head)]
_rotate_window([*_r10_head, *_r10_fill],
               _R10_R7_QUEUE[50 - len(_r10_head):])

# ---------------------------------------------------------------------------
# ROUND-11 WINDOW ROTATION (r10 verdict ask #5). Superseding the r10
# rotation above (kept as the r10 evidence record). The r11 window:
#   (1) the round-11 additions the driver has never hashed (the
#       composed fuzzy-dedup transform + ledger, the int8-prefiltered
#       near-dup verify, the four CLI display-toggle delta rows);
#   (2) drawio_erd_lines — r9-green, but round 11 added the default
#       theme color triple to BOTH engines' line grammar, so the r9
#       hash is stale evidence;
#   (3) ALL 35 rows whose newest driver green is round 7 (computed
#       from CORRECTNESS_r01-r10 at rotation time — the r10 fill took
#       the first 13 of the 48-row r7 queue; these are the rest);
#   (4) backfill to 50 with the oldest round-8 rows in registry order
#       (the round-11 additions grew to 15, so the computed fill is
#       EMPTY and _R11_R8_QUEUE is carried intact as the r12 queue).
# After this round no oracled row's newest driver green is older than
# round 8.
# ---------------------------------------------------------------------------

_R11_NEW = [
    "fuzzy_dedup_removal",
    "fuzzy_dedup_rollup",
    "semantic_dedup",
    "semantic_dedup_rollup",
    "curation_funnel",
    "curation_funnel_rollup",
    "token_balanced_shards",
    "wav_decode_features",
    "pgm_resize_features",
    "embedding_near_dups_quantized",
    "mermaid_erd_lines_untyped",
    "plantuml_erd_lines_nonull",
    "mermaid_erd_lines_noviews",
    "drawio_erd_lines_dark",
    "drawio_erd_lines",
]

_R11_R7_STALE = [
    "forget_propagation",
    "corpus_budget_selection",
    "admission_pipeline",
    "ingest_screen_stream",
    "retention_cohorts",
    "path_transitions",
    "active_users_rolling7",
    "jsonl_roundtrip",
    "csv_roundtrip",
    "user_sessions",
    "windowed_counts_stream",
    "dedup_stream",
    "sliding_counts_stream",
    "closed_sessions_stream",
    "enriched_segment_stream",
    "click_attribution_stream",
    "dedup_near_pairs",
    "dedup_groups",
    "dedup_simhash",
    "simhash_near_pairs",
    "decontamination",
    "text_token_stats",
    "text_fingerprints",
    "repetition_flags",
    "vocab_entropy",
    "doc_chunks",
    "asof_last_order",
    "scd2_history",
    "corpus_curation",
    "train_val_split",
    "pii_redaction",
    "boilerplate_flags",
    "multimodal_features",
    "similarity_kmeans_assign",
    "value_percentiles",
]

# oldest round-8 rows in registry order; head backfills the window,
# tail is the r12 rotation's queue
_R11_R8_QUEUE = [
    "grid_layout_coords",
    "rules_file_source",
    "revenue_by_nation",
    "revenue_by_nation_bucketed",
    "revenue_by_nation_preagg",
    "revenue_by_nation_salted",
    "profile_orders",
    "paragraph_dedup",
    "kmeans_iterate",
    "funnel_conversion",
]

_r11_head = [*_R11_NEW, *_R11_R7_STALE]
_r11_fill = _R11_R8_QUEUE[: 50 - len(_r11_head)]
_rotate_window([*_r11_head, *_r11_fill],
               _R11_R8_QUEUE[50 - len(_r11_head):])

# ---------------------------------------------------------------------------
# ROUND-12 WINDOW ROTATION (r11 verdict ask #5). Superseding the r11
# rotation above (kept as the r11 evidence record). The r12 window:
#   (1) the round-12 additions the driver has never hashed
#       (png_decode_features, curation_incremental);
#   (2) embedding_near_dups_quantized — green r11, but that hash was a
#       match on the EMPTY set (r11 verdict "what's wrong" #1) and
#       round 12 planted near-dup twins into the row's corpus AND its
#       oracle, so both the contract and the evidence need a fresh
#       non-vacuous driver hash;
#   (3) 47 of the 49 rows whose newest driver green is round 8
#       (recomputed from CORRECTNESS_r01-r11 at rotation time).
# The 50-slot window cannot hold 49 + 3: the two rows deferred to the
# r13 queue head are grid_layout_coords and rules_file_source — both
# re-verified green at HEAD by the r11 judge's own sampled gate (the
# freshest manual evidence among the 49), so deferring them one round
# loses the least. After this round at most those two oracled rows
# have driver evidence older than r9.
# ---------------------------------------------------------------------------

_R12_NEW = [
    "png_decode_features",
    "curation_incremental",
    "embedding_near_dups_quantized",
]

# the 49 rows whose newest driver green is r8, in CORRECTNESS_r08
# order; the last two (judge-re-verified at r11 HEAD) defer to r13
_R12_R8_STALE = [
    "detect_foreign_key",
    "pricing_summary",
    "revenue_by_nation",
    "similarity_embedding_near_dups",
    "tfidf_top_terms",
    "similarity_rp_lsh_topk",
    "label_centroids",
    "stratified_sample",
    "snapshot_diff",
    "restore_summary",
    "events_in_type_windows",
    "kmeans_iterate",
    "corpus_mixture",
    "pagerank_tables",
    "corpus_vocabulary",
    "batch_ann_topk",
    "simhash64_near_pairs",
    "batch_ann64_topk",
    "order_lines_nested",
    "hll_distinct",
    "cms_heavy_hitters",
    "bloom_prefilter_audit",
    "prefix_filter_pairs",
    "funnel_conversion",
    "robust_outliers",
    "funnel_completions_stream",
    "hll_grouped",
    "value_drift_psi",
    "pmi_collocations",
    "revenue_by_nation_salted",
    "events_by_type_two_phase",
    "revenue_by_nation_bucketed",
    "inverted_index",
    "embedding_quantize",
    "paragraph_dedup",
    "ann_recall_audit",
    "cosine_topk_arrow",
    "ann_rerank",
    "embedding_near_dups64",
    "profile_orders",
    "evolving_read",
    "events_pivot",
    "events_rolling",
    "zorder_layout",
    "revenue_by_nation_preagg",
    "lm_doc_scores_pruned",
    "order_lines_nested_bucketed",
    "grid_layout_coords",
    "rules_file_source",
]

_r12_head = [*_R12_NEW, *_R12_R8_STALE[:50 - len(_R12_NEW)]]
_rotate_window(_r12_head, _R12_R8_STALE[50 - len(_R12_NEW):])

# R13 QUEUE (precomputed at r12 close for the next rotation):
#   (1) never-hashed r12 late additions: image_dhash, image_near_dups,
#       curation_incremental_rollup (jpeg_roundtrip_quality is
#       rows-only by convention and stays out of the window);
#   (2) the two r12 deferrals: grid_layout_coords, rules_file_source;
#   (3) the 49 rows whose newest driver green is r9 (recomputed from
#       CORRECTNESS_r01-r11): classify_pk_fk, schema_complexity,
#       detect_naming_convention, detect_enhanced_pk_fk,
#       detect_data_type_match, detect_custom_rules, detect_pipeline,
#       top_orders_per_customer, frequency_distribution,
#       distinct_cardinalities, common_keys, scalar_battery,
#       timestamp_battery, graph_roots, data_test_report,
#       adaptive_sample_size, orphan_users, events_hourly,
#       audit_window_scan, simhash64, corpus_mixture_temp,
#       lm_doc_scores, weighted_sample, lm_quality_bins,
#       events_gapfill, hll_distinct_native, profile_orders_fast,
#       decontamination_hashed, rfm_segments, bm25_topk,
#       c4_quality_filters, media_frame_sample, media_resize,
#       incremental_agg, retention_policy, bm25_topk_capped,
#       retention_cohorts_preagg, path_transitions_preagg,
#       active_users_rolling7_preagg, active_users_rolling7_sweep,
#       daily_activity_cdc, domain_quota_sample, domain_quality_prior,
#       domain_dedup_rollup, sequence_packing_bpe, events_dpp_join,
#       source_length_deciles, daily_activity_stream,
#       embedding_decontamination.
# 3 + 2 + 49 = 54 > 50: the r13 rotation will defer the overflow tail
# of (3) to r14 the way r12 deferred its two judge-re-verified rows.

# ---------------------------------------------------------------------------
# ROUND-13 WINDOW ROTATION (r12 verdict ask #2). Superseding the r12
# rotation above (kept as the r12 evidence record). The r13 window:
#   (1) the r12 late additions the driver has never hashed
#       (image_dhash, image_near_dups, curation_incremental_rollup) —
#       image_near_dups additionally changed plan this round (hybrid
#       cap/blocked verify; output-identical, pytest-asserted);
#   (2) the round-13 additions (embedding_near_dups_sharded,
#       embedding_near_dups_128);
#   (3) the rows whose CONTRACT changed this round: the quantized-
#       verify default flip rewired embedding_near_dups64 and
#       embedding_near_dups_auto (verify stage + oracle prefilter
#       CTE), so their r12/r11 greens no longer cover HEAD;
#   (4) the two r12 deferrals (grid_layout_coords, rules_file_source
#       — the last rows with driver evidence older than r9);
#   (5) 41 of the 49 rows whose newest driver green is r9 (the
#       precomputed queue above).
# 9 + 41 = 50; the 8-row overflow tail of (5) defers to r14 in queue
# order (domain_quota_sample, domain_quality_prior,
# domain_dedup_rollup, sequence_packing_bpe, events_dpp_join,
# source_length_deciles, daily_activity_stream,
# embedding_decontamination) — each re-verified green by tools/check
# at HEAD this round; after r13 no other oracled row's newest driver
# green is older than r10.
# ---------------------------------------------------------------------------

_R13_NEW = [
    "image_dhash",
    "image_near_dups",
    "curation_incremental_rollup",
    "embedding_near_dups_sharded",
    "embedding_near_dups_128",
    "embedding_near_dups64",
    "embedding_near_dups_auto",
    "grid_layout_coords",
    "rules_file_source",
]

# the 49 rows whose newest driver green is r9, in CORRECTNESS_r09
# order (recomputed at r12 close — the R13 QUEUE comment above)
_R13_R9_STALE = [
    "classify_pk_fk",
    "schema_complexity",
    "detect_naming_convention",
    "detect_enhanced_pk_fk",
    "detect_data_type_match",
    "detect_custom_rules",
    "detect_pipeline",
    "top_orders_per_customer",
    "frequency_distribution",
    "distinct_cardinalities",
    "common_keys",
    "scalar_battery",
    "timestamp_battery",
    "graph_roots",
    "data_test_report",
    "adaptive_sample_size",
    "orphan_users",
    "events_hourly",
    "audit_window_scan",
    "simhash64",
    "corpus_mixture_temp",
    "lm_doc_scores",
    "weighted_sample",
    "lm_quality_bins",
    "events_gapfill",
    "hll_distinct_native",
    "profile_orders_fast",
    "decontamination_hashed",
    "rfm_segments",
    "bm25_topk",
    "c4_quality_filters",
    "media_frame_sample",
    "media_resize",
    "incremental_agg",
    "retention_policy",
    "bm25_topk_capped",
    "retention_cohorts_preagg",
    "path_transitions_preagg",
    "active_users_rolling7_preagg",
    "active_users_rolling7_sweep",
    "daily_activity_cdc",
    "domain_quota_sample",
    "domain_quality_prior",
    "domain_dedup_rollup",
    "sequence_packing_bpe",
    "events_dpp_join",
    "source_length_deciles",
    "daily_activity_stream",
    "embedding_decontamination",
]

_r13_head = [*_R13_NEW, *_R13_R9_STALE[:50 - len(_R13_NEW)]]
_rotate_window(_r13_head, _R13_R9_STALE[50 - len(_R13_NEW):])


# ---------------------------------------------------------------------------
# ROUND-14 WINDOW ROTATION (r13 verdict asks #1 and #10). Superseding
# the r13 rotation above (kept as the r13 evidence record). The r14
# window:
#   (1) image_dhash — the r13 driver-red row (hash_match=false,
#       unreproduced locally; kernel hardened + live-path pinned this
#       round, see plans/r14/image_dhash_red_note.md) — MUST re-gate;
#   (2) every row whose internals the r14 optimizer changed:
#       image_near_dups (round-trip guard in the shared kernel),
#       pricing_summary / revenue_by_nation / kmeans_iterate
#       (conditional fan-out now that their exact-fold outputs are
#       verified core-count-invariant), curation_incremental
#       (threaded batch frames) + curation_incremental_rollup
#       (union-of-aggregates one-pass), batch_ann_topk /
#       batch_ann64_topk / ann_rerank / ann_recall_audit (probe side
#       bucketized from the filtered scan), pq_codes_sampled
#       (driver-side sample training, bit-identity pytest-pinned);
#   (3) the 12 build-continuation rows the driver has never hashed
#       (FLAC, MP4, audio x2, video x2, PQ x6);
#   (4) the 8 r13 deferrals (newest driver green r9);
#   (5) 18 of the 49 rows whose newest driver green is r10, in
#       CORRECTNESS_r10 order.
# 11 + 12 + 8 + 19 = 50 (pq_codes_sampled / video x2 overlap (2)+(3));
# the remaining 31 r10-stale rows defer to r15 in queue order.
# ---------------------------------------------------------------------------

_R14_PRIORITY = [
    # (1) driver-red
    "image_dhash",
    # (2) optimizer-touched
    "image_near_dups",
    "pricing_summary",
    "revenue_by_nation",
    "kmeans_iterate",
    "curation_incremental",
    "curation_incremental_rollup",
    "batch_ann_topk",
    "batch_ann64_topk",
    "ann_rerank",
    "ann_recall_audit",
    # (3) never hashed by any driver round
    "flac_decode_features",
    "mp4_metadata",
    "audio_fingerprint",
    "audio_near_dups",
    "video_frame_sample",
    "video_near_dups",
    "pq_codes",
    "pq_codes_arrow",
    "pq_codes_sampled",
    "ivf_pq_topk",
    "pq_adc_topk",
    "pq_recall_audit",
    # (4) r13 deferrals (newest green r9)
    "domain_quota_sample",
    "domain_quality_prior",
    "domain_dedup_rollup",
    "sequence_packing_bpe",
    "events_dpp_join",
    "source_length_deciles",
    "daily_activity_stream",
    "embedding_decontamination",
]

# the 49 rows whose newest driver green is r10, in CORRECTNESS_r10
# order (recomputed at r14 from CORRECTNESS_r01-r13)
_R14_R10_STALE = [
    "span_dedup_removal",
    "span_dedup_rollup",
    "contamination_span_scrub",
    "contamination_scrub_rollup",
    "nb_lang_classifier",
    "dsir_importance_weights",
    "training_shard_shuffle",
    "bpe_pair_counts",
    "daily_activity_store_stream",
    "events_dpp_join_unpruned",
    "embedding_incremental_dedup",
    "graph_bfs_levels",
    "checksum_gate",
    "state_staleness",
    "quality_report",
    "quality_by_method",
    "mermaid_erd_lines",
    "plantuml_erd_lines",
    "dedup_exact_groups",
    "sequence_packing",
    "text_language_id",
    "dedup_minhash_signatures",
    "dedup_lsh_buckets",
    "dedup_keep_best",
    "corpus_rollup",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    "similarity_rp_lsh_buckets",
    "catalog_tables",
    "sample_scan",
    "table_batching_rank",
    "events_props_json",
    "relationships_per_table",
    "state_upsert",
    "cache_lookup",
    "metadata_richness",
    "kmeans_iterate_arrow",
    "lm_doc_scores_arrow",
    "lm_quality_bins_arrow",
    "embedding_quantize_arrow",
    "label_centroids_arrow",
    "repetition_flags_arrow",
    "force_layout_coords",
    "rule_compiler_truth",
    "dup_ngram_fraction",
    "dup_ngram_stats",
    "source_vocab_overlap",
    "cross_source_dup_matrix",
    "dedup_incremental",
]

_r14_head = [*_R14_PRIORITY,
             *_R14_R10_STALE[:50 - len(_R14_PRIORITY)]]
_rotate_window(_r14_head, _R14_R10_STALE[50 - len(_R14_PRIORITY):])


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return detection.detect_all(spark)
