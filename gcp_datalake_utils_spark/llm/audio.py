"""Audio fingerprinting + near-dup detection (round 13) — the AUDIO
member of the near-dup modality matrix (text: MinHash/SimHash; image:
dHash; video: frame signatures; audio: THIS), completing four-modality
dedup coverage.

Pipeline: document bytes -> PCM samples -> genuine WAV round-trip
(build_wav -> parse_wav, the real RIFF codec chain the wav rows use)
-> frame into FP_FRAMES windows -> WALSH-HADAMARD transform per frame
-> dominant sequency bin per frame (the audio-hashing landmark — the
Shazam-style constellation reduced to one peak per window) ->
fingerprint = the 8-bin sequence -> banded candidate join (consecutive
bin pairs as 10-bit keys) -> verify on >= AUDIO_MATCH_MIN matching
frames.

Why Walsh-Hadamard and not a DFT: WHT coefficients are +-1, so the
whole transform is INTEGER arithmetic — bit-for-bit identical across
Spark, numpy, and DuckDB by construction (the SQL mirror computes the
sign as 1 - 2*(bit_count(k & n) % 2)). A DFT fingerprint would hang
the cross-engine gate on libm cos/sin ulps; the sequency domain gives
the same windowed-spectral-peak semantics with zero float risk. Ties
in the per-frame argmax break to the lowest bin on both engines
(integer compare, then k).

At 100 TB: decode + transform + fingerprint ride ONE zero-exchange
Arrow scan (a 32x32 +-1 matmul per frame batch); the candidate join
ships 10-bit band keys (measured at sf0.1: worst band bucket 23 of
2,901 assets — the text-derived spectra are well spread, unlike the
image dHash space); the verify joins candidate pairs to the
8-element fingerprint arrays (pair-sized traffic).

Reference parity: no media handling in the reference; north-star
extension per SURVEY.md §1.2 (multimodal columns).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.multimodal import (
    _WAV_CENTER,
    binary_assets,
    build_wav,
    fan_out,
    parse_wav,
)

FRAME_N = 32          # samples per analysis window
FP_FRAMES = 8         # windows per fingerprint
FP_SAMPLES = FRAME_N * FP_FRAMES  # = 256 leading samples
AUDIO_MATCH_MIN = 6   # near-dup verify: >= 6 of 8 dominant bins equal
AUD_PLANT_N = 8
AUD_PLANT_OFFSET = 2_000_000
AUD_PLANT_BUMP = 16

_FP_SCHEMA = ("asset_id long, frame_idx int, dom_bin int, "
              "dom_mag long, energy long")


def _fingerprint_rows(spark: SparkSession, sf_dir: str,
                      plant: bool) -> DataFrame:
    """(asset_id, frame_idx, dom_bin, dom_mag, energy) through the
    REAL codec chain: bytes -> PCM -> build_wav -> parse_wav ->
    windowed WHT. Docs shorter than FP_SAMPLES bytes are excluded on
    both engines. With ``plant``, twins of the first AUD_PLANT_N
    qualifying assets are added (even ids byte-exact; odd ids bump
    byte 0 by +AUD_PLANT_BUMP mod 256 — only frame 0's spectrum can
    change, so >= 7 of 8 bins still match)."""
    import numpy as np

    # sequency sign matrix: H[k, n] = (-1)^popcount(k & n) — built
    # with int.bit_count (numpy < 2 has no bitwise_count; 32x32 is
    # a one-time constant)
    hmat = np.array(
        [[1 - 2 * ((k & n).bit_count() & 1)
          for n in range(FRAME_N)] for k in range(FRAME_N)],
        dtype=np.int64)

    def _kernel(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fks, bins, mags, ens = [], [], [], [], []

            def emit(aid: int, by: bytes) -> None:
                pcm = (np.frombuffer(by, dtype=np.uint8)
                       .astype(np.int16) - _WAV_CENTER) * 256
                _, _, _, samples = parse_wav(build_wav(pcm))
                fr = (samples[:FP_SAMPLES].astype(np.int64)
                      .reshape(FP_FRAMES, FRAME_N))
                mag = np.abs(fr @ hmat.T)          # (frames, bins)
                dom = mag[:, 1:].argmax(axis=1) + 1  # skip DC; ties
                # -> first max = lowest bin (integer-exact both sides)
                en = (fr * fr).sum(axis=1)
                for f in range(FP_FRAMES):
                    ids.append(aid)
                    fks.append(f)
                    bins.append(int(dom[f]))
                    mags.append(int(mag[f, dom[f]]))
                    ens.append(int(en[f]))

            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                if plant and aid >= AUD_PLANT_OFFSET:
                    raise ValueError(
                        f"asset_id {aid} collides with "
                        f"AUD_PLANT_OFFSET={AUD_PLANT_OFFSET}")
                b = bytes(b)
                if len(b) < FP_SAMPLES:
                    continue
                emit(aid, b)
                if plant and aid < AUD_PLANT_N:
                    tb = bytearray(b)
                    if aid % 2 == 1:
                        tb[0] = (tb[0] + AUD_PLANT_BUMP) % 256
                    emit(aid + AUD_PLANT_OFFSET, bytes(tb))
            yield pd.DataFrame({
                "asset_id": ids,
                "frame_idx": pd.Series(fks, dtype="int32"),
                "dom_bin": pd.Series(bins, dtype="int32"),
                "dom_mag": pd.Series(mags, dtype="int64"),
                "energy": pd.Series(ens, dtype="int64")})

    return (fan_out(binary_assets(spark, sf_dir), "asset_id", "payload")
            .mapInPandas(_kernel, _FP_SCHEMA))


def audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] per-window sequency landmark table (asset_id, frame_idx,
    dom_bin, dom_mag, energy) through the real WAV round-trip — the
    per-asset signature a 100 TB audio corpus builds in its decode
    pass. Integer-exact: the oracle re-derives every value from the
    generative formula with bit_count sign arithmetic."""
    return _fingerprint_rows(spark, sf_dir, plant=False)


def _dom_lists(fp: DataFrame) -> DataFrame:
    """(asset_id, d): the 8-element dominant-bin array per asset."""
    return (fp.groupBy("asset_id")
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("frame_idx", "dom_bin"))),
                lambda s: s["dom_bin"]).alias("d")))


def audio_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_a, asset_b, matching_frames): audio near-dup pairs
    over the planted corpus. Candidates must agree on at least one
    BAND (a consecutive window pair packed as a 10-bit key — 4 bands
    per asset); a candidate verifies iff >= AUDIO_MATCH_MIN of the
    FP_FRAMES dominant bins match. Declared-banding capture contract
    (the family standard): a twin differing in <= 1 window keeps >= 3
    clean bands.

    Plan shape (the imagededup cold-path lesson, applied up front
    this time after an sf10 measurement caught the candidate-sized
    distinct at 132.8 s): each band row CARRIES its 8-int fingerprint
    through the self-join, the matching-frames verify runs inside the
    join stage, and the filter lands BEFORE distinct — so the
    exchange after the join is output-sized (verified near-dups),
    never candidate-sized. Band keys stay int; fingerprints are
    ~40 B/row."""
    fp = _fingerprint_rows(spark, sf_dir, plant=True).localCheckpoint()
    dl = _dom_lists(fp)
    bands = (dl.select("asset_id", "d", F.explode(F.array(*[
        F.struct(F.lit(j).alias("band"),
                 (F.element_at("d", 2 * j + 1) * FRAME_N
                  + F.element_at("d", 2 * j + 2)).alias("key"))
        for j in range(FP_FRAMES // 2)])).alias("bk"))
        .select("asset_id", "d", "bk.band", "bk.key"))
    a = bands.select(F.col("asset_id").alias("asset_a"),
                     F.col("d").alias("da"), "band", "key")
    b = bands.select(F.col("asset_id").alias("asset_b"),
                     F.col("d").alias("db"), "band", "key")
    match = F.aggregate(
        F.zip_with("da", "db",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x)
    return (a.join(b, ["band", "key"])
            .where(F.col("asset_a") < F.col("asset_b"))
            .withColumn("matching_frames", match.cast("int"))
            .where(F.col("matching_frames") >= AUDIO_MATCH_MIN)
            .select("asset_a", "asset_b", "matching_frames")
            .distinct())


# sample j (1-based in SQL lists): (byte - _WAV_CENTER) * 256; the
# int16 cast in the PCM path cannot wrap on this corpus (ASCII bytes
# <= 126 -> max |sample| 11776 + the planted bump stays < 2^15)
_SAMPLES_SQL = f"""
SELECT doc_id AS asset_id,
       list_transform(range(1, {FP_SAMPLES} + 1),
         j -> (ascii(substr(text, CAST(j AS INTEGER), 1))
               - {_WAV_CENTER}) * 256) AS sm
FROM documents WHERE length(text) >= {FP_SAMPLES}
"""

_WHT_MAG_SQL = f"""
abs(list_sum(list_transform(range({FRAME_N}), n ->
  sm[CAST(f * {FRAME_N} + n + 1 AS INTEGER)]
  * (1 - 2 * (bit_count(CAST(k AS BIGINT) & CAST(n AS BIGINT))
              % 2)))))
"""

_FR_SQL = f"""
SELECT asset_id, f, k, {_WHT_MAG_SQL} AS mag
FROM s, unnest(range({FP_FRAMES})) AS tf(f),
     unnest(range(1, {FRAME_N})) AS tk(k)
"""

_DOM_SQL = """
SELECT asset_id, f, k AS dom_bin, mag AS dom_mag FROM fr
QUALIFY row_number() OVER (PARTITION BY asset_id, f
                           ORDER BY mag DESC, k) = 1
"""

AUDIO_FINGERPRINT_ORACLE = f"""
WITH s AS ({_SAMPLES_SQL}),
fr AS ({_FR_SQL}),
dom AS ({_DOM_SQL}),
en AS (
  SELECT asset_id, f,
         list_sum(list_transform(range({FRAME_N}), n ->
           CAST(sm[CAST(f * {FRAME_N} + n + 1 AS INTEGER)] AS BIGINT)
           * sm[CAST(f * {FRAME_N} + n + 1 AS INTEGER)])) AS energy
  FROM s, unnest(range({FP_FRAMES})) AS tf(f))
SELECT d.asset_id, CAST(d.f AS INTEGER) AS frame_idx,
       CAST(d.dom_bin AS INTEGER) AS dom_bin,
       CAST(d.dom_mag AS BIGINT) AS dom_mag,
       CAST(e.energy AS BIGINT) AS energy
FROM dom d JOIN en e ON d.asset_id = e.asset_id AND d.f = e.f
"""

AUDIO_NEAR_DUPS_ORACLE = f"""
WITH s0 AS ({_SAMPLES_SQL}),
s AS (
  SELECT asset_id, sm FROM s0
  UNION ALL
  SELECT asset_id + {AUD_PLANT_OFFSET} AS asset_id,
         CASE WHEN asset_id % 2 = 0 THEN sm
              -- mirror the kernel's (byte + BUMP) % 256 exactly:
              -- sm[1] is a multiple of 256, so // is exact division
              ELSE list_concat(
                [(((sm[1] // 256 + {_WAV_CENTER} + {AUD_PLANT_BUMP})
                   % 256) - {_WAV_CENTER}) * 256],
                sm[2:]) END AS sm
  FROM s0 WHERE asset_id < {AUD_PLANT_N}
),
fr AS ({_FR_SQL}),
dom AS ({_DOM_SQL}),
dl AS (
  SELECT asset_id, list(dom_bin ORDER BY f) AS d FROM dom
  GROUP BY asset_id
),
bk AS (
  SELECT asset_id, j AS band,
         d[2 * j + 1] * {FRAME_N} + d[2 * j + 2] AS key
  FROM dl, unnest(range({FP_FRAMES // 2})) AS t(j)
),
cand AS (
  SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                     AND a.asset_id < b.asset_id
)
SELECT c.asset_a, c.asset_b,
       CAST(list_sum(list_transform(list_zip(da.d, db.d),
              p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END))
         AS INTEGER) AS matching_frames
FROM cand c
JOIN dl da ON da.asset_id = c.asset_a
JOIN dl db ON db.asset_id = c.asset_b
WHERE list_sum(list_transform(list_zip(da.d, db.d),
        p -> CASE WHEN p[1] = p[2] THEN 1 ELSE 0 END))
      >= {AUDIO_MATCH_MIN}
"""
