"""Multimodal columns: binary payloads + typed metadata (north-star
extension).

Images/audio/video are opaque ``binary`` columns with a metadata struct;
decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, batch shape, partitioning) is real and
oracle-tested; the actual codec step is STUBBED (no image/audio libs in
this container) behind ``decode_media``, with a deterministic fake
featurizer exercising the identical UDF signature.

At 100 TB: binary payloads ride in parquet with
``spark.sql.files.maxPartitionBytes`` bounding task input; mapInPandas
streams Arrow batches so peak memory is one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_datalake_utils_spark.sources import load_table

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("first_byte", T.IntegerType(), True),
    T.StructField("last_byte", T.IntegerType(), True),
    T.StructField("payload_md5", T.StringType(), True),
])


def binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as multimodal assets: payload = utf-8 bytes, metadata
    struct typed per-kind (the layout a real image/audio table uses)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars")).alias("meta"))


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads — the real
    mapInPandas pipeline with a deterministic featurizer (byte stats +
    md5); swap ``_featurize`` for a codec-backed one on a full image."""
    import hashlib

    def _featurize(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "byte_len": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(
                    lambda b: int(b[0]) if len(b) else None),
                "last_byte": payloads.map(
                    lambda b: int(b[-1]) if len(b) else None),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest()),
            })

    return assets.mapInPandas(_featurize, FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] the full binary->features pipeline (oracle recomputes the
    same byte stats in SQL — proving the Arrow round-trip is lossless)."""
    return extract_features(binary_assets(spark, sf_dir))


MEDIA_FEATURES_ORACLE = """
SELECT doc_id AS asset_id, 'text' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(CASE WHEN length(text) > 0
            THEN ascii(substr(text, 1, 1)) END AS INTEGER) AS first_byte,
       CAST(CASE WHEN length(text) > 0
            THEN ascii(substr(text, length(text), 1)) END AS INTEGER)
         AS last_byte,
       md5(text) AS payload_md5
FROM documents
"""


def decode_media(assets: DataFrame, target_kind: str = "image") -> DataFrame:
    """Codec-backed decode (resize / frame-sample / spectrogram). The
    container ships no image/audio libraries, so this is an explicit
    stub: the plumbing above (schema, Arrow batching, partition flow) is
    what a codec plugs into."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg) not present "
        "in this environment; use extract_features for the byte-level "
        "pipeline or register a codec-backed featurizer with the same "
        "mapInPandas signature")


# ---------------------------------------------------------------------------
# Round 8: the remaining multimodal kernel SHAPES — frame sampling
# (one binary row -> N frame rows, the video path's batch geometry)
# and stride resize (binary -> smaller binary). As with
# extract_features, the codec byte-decode is a deterministic stand-in
# (fixed-size byte chunks as "frames"; byte-stride as "resize") while
# the Spark-side plumbing — Arrow batching, 1->N row fan-out, binary
# round-trip, schema — is real and oracle-gated. Oracle equivalence
# notes: payload bytes ARE text chars on this corpus (verified: zero
# multibyte docs at every sf), so the SQL twin mirrors the byte
# arithmetic with substr; a production byte corpus would gate on
# binary fixtures instead.
# ---------------------------------------------------------------------------

FRAME_BYTES = 64     # fake frame = 64-byte chunk
FRAME_STRIDE = 3     # sample every 3rd frame
RESIZE_STRIDE = 4    # fake resize = every 4th byte

_FRAME_SCHEMA = ("asset_id long, frame_idx int, frame_len int, "
                 "frame_md5 string")
_RESIZE_SCHEMA = ("asset_id long, orig_len long, resized_len long, "
                  "resized_md5 string")


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_id, frame_idx, frame_len, frame_md5): split each
    binary payload into FRAME_BYTES-sized frames and keep every
    FRAME_STRIDE-th — the video frame-sampling kernel shape (one input
    row fans out to N output rows inside the Arrow batch; empty
    payloads yield none)."""
    import hashlib
    import math

    def _frames(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                if b is None:
                    # NULL payload mirrors the oracle's length(NULL)
                    # exclusion: no frames
                    continue
                b = bytes(b)
                nf = math.ceil(len(b) / FRAME_BYTES)
                for i in range(0, nf, FRAME_STRIDE):
                    fr = b[i * FRAME_BYTES:(i + 1) * FRAME_BYTES]
                    ids.append(aid)
                    idxs.append(i)
                    lens.append(len(fr))
                    md5s.append(hashlib.md5(fr).hexdigest())
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs,
                                "frame_len": lens, "frame_md5": md5s})

    return binary_assets(spark, sf_dir).select(
        "asset_id", "payload").mapInPandas(_frames, _FRAME_SCHEMA)


MEDIA_FRAME_SAMPLE_ORACLE = f"""
WITH f AS (
  SELECT doc_id AS asset_id, u.i AS frame_idx,
         substr(text, CAST(u.i * {FRAME_BYTES} + 1 AS BIGINT),
                {FRAME_BYTES}) AS frame
  FROM documents,
       unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                            AS BIGINT), {FRAME_STRIDE})) AS u(i)
  WHERE length(text) > 0
)
SELECT asset_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(length(frame) AS INTEGER) AS frame_len,
       md5(frame) AS frame_md5
FROM f
"""


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_id, orig_len, resized_len, resized_md5): byte-stride
    "resize" of each payload (every RESIZE_STRIDE-th byte) — the
    image-resize kernel shape: binary in, smaller binary out, verified
    by fingerprinting the resized bytes."""
    import hashlib

    def _resize(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads null-propagate (the oracle's length(NULL) /
            # md5(NULL) row), mirroring the JVM semantics
            res = pdf["payload"].map(
                lambda b: None if b is None
                else bytes(b)[::RESIZE_STRIDE])
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "orig_len": pdf["payload"].map(
                    lambda b: None if b is None else len(b)),
                "resized_len": res.map(
                    lambda b: None if b is None else len(b)),
                "resized_md5": res.map(
                    lambda b: None if b is None
                    else hashlib.md5(b).hexdigest()),
            })

    return binary_assets(spark, sf_dir).select(
        "asset_id", "payload").mapInPandas(_resize, _RESIZE_SCHEMA)


MEDIA_RESIZE_ORACLE = f"""
SELECT doc_id AS asset_id,
       CAST(length(text) AS BIGINT) AS orig_len,
       CAST(length(r) AS BIGINT) AS resized_len,
       md5(r) AS resized_md5
FROM (
  SELECT doc_id, text,
         array_to_string(list_transform(
           range(1, length(text) + 1, {RESIZE_STRIDE}),
           i -> substr(text, i, 1)), '') AS r
  FROM documents
)
"""
