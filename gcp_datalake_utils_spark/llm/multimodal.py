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
