"""Image near-duplicate detection over DECODED pixels (round 12) —
the multimodal member of the dedup family, composing the real PNG
codec with the SimHash-style banded Hamming join.

Pipeline: text-derived pixels -> genuine PNG bytes (build_png) ->
REAL decode (parse_png: CRC-verified chunk walk, inflate, unfilter)
-> area-mean resize to an 8x9 grid -> dHash (difference hash: bit =
right cell brighter than left, 8x8 = 64 bits packed as two 32-bit
halves, the simhash64 convention) -> 4x16-bit banded candidate join
-> exact Hamming <= HAM_MAX verify. This is the LAION-style image
dedup shape: the perceptual hash is locality-sensitive (small pixel
perturbations flip few bits), banding makes candidate generation an
equi-join (never all-pairs), and the verify touches candidates only.

At 100 TB: the dHash is a zero-exchange scan-side projection riding
the decode pass the pipeline already pays; the band join shuffles
8-byte keys; Hamming verify is bit_count(xor) — whole-stage codegen,
no Python. The oracle re-derives grid, bits, and packing straight
from the generative pixel formula in SQL, so a decode/resize/packing
defect is a hash mismatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm.multimodal import (
    PNG_WIDTH,
    binary_assets,
    build_png,
    parse_png,
)

GRID_H = 8          # output rows; input needs >= 8 pixel rows
GRID_W = 9          # output cols; 8 horizontal comparisons per row
HAM_MAX = 6         # near-dup verify threshold (bits of 64)
IMG_PLANT_N = 10    # planted twins for the near-dup gate
IMG_PLANT_OFFSET = 2_000_000
IMG_PLANT_BUMP = 16  # +16 (mod 256) on pixel 0 of odd-id twins

_DHASH_SCHEMA = "asset_id long, dh_hi long, dh_lo long"


def _dhash_of(pix) -> tuple[int, int]:
    """(dh_hi, dh_lo) 32-bit halves of the 64-bit dHash of an (h, w)
    uint8 array: area-mean resize to GRID_H x GRID_W (integer floor
    means over floor-boundary blocks), bit r*8+c = grid[r][c+1] >
    grid[r][c]."""
    import numpy as np
    h, w = pix.shape
    x = pix.astype(np.int64)
    rb = [(r * h) // GRID_H for r in range(GRID_H + 1)]
    cb = [(c * w) // GRID_W for c in range(GRID_W + 1)]
    g = np.array([[int(x[rb[r]:rb[r + 1], cb[c]:cb[c + 1]].sum())
                   // ((rb[r + 1] - rb[r]) * (cb[c + 1] - cb[c]))
                   for c in range(GRID_W)] for r in range(GRID_H)],
                 dtype=np.int64)
    bits = (g[:, 1:] > g[:, :-1]).flatten()  # index r*8+c
    lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
    hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
    return hi, lo


def _dhash_rows(spark: SparkSession, sf_dir: str,
                plant: bool) -> DataFrame:
    """(asset_id, dh_hi, dh_lo) via the REAL codec round-trip; docs
    under GRID_H pixel rows are excluded on both engines. With
    ``plant``, deterministic twins of the first IMG_PLANT_N
    qualifying assets are added (even ids byte-exact — dHash
    identical; odd ids bump pixel 0 by +16 mod 256 — at most the one
    affected comparison bit flips), so the near-dup gate verifies a
    non-empty set."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los = [], [], []

            def emit(aid: int, pix) -> None:
                img, _ = parse_png(build_png(pix))
                hi, lo = _dhash_of(img)
                ids.append(aid)
                his.append(hi)
                los.append(lo)

            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                if plant and aid >= IMG_PLANT_OFFSET:
                    # fail loudly instead of silently aliasing a
                    # planted twin id (ADVICE r12)
                    raise ValueError(
                        f"asset_id {aid} collides with "
                        f"IMG_PLANT_OFFSET={IMG_PLANT_OFFSET}")
                b = bytes(b)
                h = len(b) // PNG_WIDTH
                if h < GRID_H:
                    continue
                pix = np.frombuffer(b[:h * PNG_WIDTH], dtype=np.uint8) \
                    .reshape(h, PNG_WIDTH)
                emit(aid, pix)
                if plant and aid < IMG_PLANT_N:
                    tp = pix.copy()
                    if aid % 2 == 1:
                        tp[0, 0] = (int(tp[0, 0]) + IMG_PLANT_BUMP) \
                            % 256
                    emit(aid + IMG_PLANT_OFFSET, tp)
            yield pd.DataFrame({"asset_id": ids, "dh_hi": his,
                                "dh_lo": los})

    return (binary_assets(spark, sf_dir)
            .select("asset_id", "payload")
            .mapInPandas(_kernel, _DHASH_SCHEMA))


def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_id, dh_hi, dh_lo): the perceptual difference hash of
    every qualifying document-image, computed from REAL-decoded PNG
    pixels. The oracle re-derives grid means, comparison bits and the
    two-half packing from the text bytes, so the whole
    encode -> decode -> resize -> hash chain is value-gated."""
    return _dhash_rows(spark, sf_dir, plant=False)


def image_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_a, asset_b, hamming): image near-duplicate pairs at
    Hamming <= HAM_MAX over the planted corpus — 4x16-bit banded
    candidate generation + exact bit_count(xor) verify on candidates
    only. All JVM-side after the hash scan: integer band slicing,
    equi-join, bit_count — whole-stage codegen, no Python in the join
    path.

    Capture contract (mirrored exactly in the oracle, so both engines
    agree row-for-row): 4 exact-match bands guarantee capture for
    Hamming <= 3 (pigeonhole — some band is clean); pairs at 4-6 are
    captured iff the differing bits leave one band untouched (a twin
    differing in <= 1 bit collides in >= 3 of 4 bands; structured
    perturbations like JPEG re-encode concentrate in few cells). The
    declared-banding semantics is the simhash_near_pairs precedent.
    Corpus note (BASELINE round 12): on the synthetic text-pixel
    corpus the dHash bits are low-entropy, so 16-bit band buckets run
    hot (~214M candidate pairs at 500k images before the verify cuts
    them to 5.8k); real image corpora distribute perceptual-hash keys
    near-uniformly, and the LSH family's hot-bucket salting applies
    unchanged if they don't."""
    dh = _dhash_rows(spark, sf_dir, plant=True).localCheckpoint()
    mask = F.lit(0xFFFF)
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            (F.shiftrightunsigned("dh_lo" if j < 2 else "dh_hi",
                                  16 * (j % 2))
             .bitwiseAND(mask)).alias("key"))
        for j in range(4)])
    bk = (dh.select("asset_id", F.explode(bands).alias("bk"))
          .select("asset_id", "bk.band", "bk.key"))
    a = bk.select(F.col("asset_id").alias("asset_a"), "band", "key")
    b = bk.select(F.col("asset_id").alias("asset_b"), "band", "key")
    cand = (a.join(b, ["band", "key"])
            .where(F.col("asset_a") < F.col("asset_b"))
            .select("asset_a", "asset_b").distinct())
    da = dh.select(F.col("asset_id").alias("asset_a"),
                   F.col("dh_hi").alias("hi_a"),
                   F.col("dh_lo").alias("lo_a"))
    db = dh.select(F.col("asset_id").alias("asset_b"),
                   F.col("dh_hi").alias("hi_b"),
                   F.col("dh_lo").alias("lo_b"))
    ham = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
           + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (cand.join(da, "asset_a").join(db, "asset_b")
            .withColumn("hamming", ham.cast("int"))
            .where(F.col("hamming") <= HAM_MAX)
            .select("asset_a", "asset_b", "hamming"))


# --- oracles ---------------------------------------------------------------

# grid cell i (0..71): r = i//9, c = i%9; block rows [r*h//8,(r+1)*h//8),
# cols [c*32//9,(c+1)*32//9); integer floor mean — mirrored exactly
_GRID_SQL = f"""
list_transform(range({GRID_H * GRID_W}), i ->
  list_sum(list_transform(
      range((i // {GRID_W}) * h // {GRID_H},
            (i // {GRID_W} + 1) * h // {GRID_H}), ri ->
    list_sum(list_transform(
        range((i % {GRID_W}) * {PNG_WIDTH} // {GRID_W},
              (i % {GRID_W} + 1) * {PNG_WIDTH} // {GRID_W}), ci ->
      CAST(p[CAST(ri * {PNG_WIDTH} + ci + 1 AS INTEGER)] AS BIGINT)))))
  // (((i // {GRID_W} + 1) * h // {GRID_H}
       - (i // {GRID_W}) * h // {GRID_H})
      * ((i % {GRID_W} + 1) * {PNG_WIDTH} // {GRID_W}
         - (i % {GRID_W}) * {PNG_WIDTH} // {GRID_W})))
"""

# bit k (0..31 within a half, ``base`` = 0 for lo / 32 for hi):
# r = (base+k)//8, c = (base+k)%8; compare g[r*9+c+2] > g[r*9+c+1]


def _pack_sql(base: int) -> str:
    return f"""
list_sum(list_transform(range(32), k ->
  CASE WHEN g[CAST((({base} + k) // 8) * {GRID_W}
              + (({base} + k) % 8) + 2 AS INTEGER)]
            > g[CAST((({base} + k) // 8) * {GRID_W}
              + (({base} + k) % 8) + 1 AS INTEGER)]
       THEN CAST(1 AS BIGINT) << CAST(k AS INTEGER)
       ELSE CAST(0 AS BIGINT) END))
"""


_PIX_SQL = f"""
SELECT doc_id AS asset_id, (length(text) // {PNG_WIDTH}) AS h,
       list_transform(range(1, (length(text) // {PNG_WIDTH})
                               * {PNG_WIDTH} + 1),
         j -> ascii(substr(text, CAST(j AS INTEGER), 1))) AS p
FROM documents
WHERE length(text) // {PNG_WIDTH} >= {GRID_H}
"""

_DHASH_FROM_PIX_SQL = f"""
SELECT asset_id,
       coalesce({_pack_sql(32)}, 0) AS dh_hi,
       coalesce({_pack_sql(0)}, 0) AS dh_lo
FROM (SELECT asset_id, {_GRID_SQL} AS g FROM pix)
"""

IMAGE_DHASH_ORACLE = f"""
WITH pix AS ({_PIX_SQL})
{_DHASH_FROM_PIX_SQL}
"""

IMAGE_NEAR_DUPS_ORACLE = f"""
WITH pix0 AS ({_PIX_SQL}),
pix AS (
  SELECT asset_id, h, p FROM pix0
  UNION ALL
  SELECT asset_id + {IMG_PLANT_OFFSET} AS asset_id, h,
         CASE WHEN asset_id % 2 = 0 THEN p
              ELSE list_concat(
                [(p[1] + {IMG_PLANT_BUMP}) % 256], p[2:]) END AS p
  FROM pix0 WHERE asset_id < {IMG_PLANT_N}
),
dh AS ({_DHASH_FROM_PIX_SQL}),
bk AS (
  SELECT asset_id, j AS band,
         CASE WHEN j < 2 THEN (dh_lo >> (16 * j)) & 65535
              ELSE (dh_hi >> (16 * (j - 2))) & 65535 END AS key
  FROM dh, unnest(range(4)) AS t(j)
),
cand AS (
  SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                     AND a.asset_id < b.asset_id
)
SELECT c.asset_a, c.asset_b,
       CAST(bit_count(CAST(xor(da.dh_hi, db.dh_hi) AS BIGINT))
            + bit_count(CAST(xor(da.dh_lo, db.dh_lo) AS BIGINT))
         AS INTEGER) AS hamming
FROM cand c
JOIN dh da ON da.asset_id = c.asset_a
JOIN dh db ON db.asset_id = c.asset_b
WHERE bit_count(CAST(xor(da.dh_hi, db.dh_hi) AS BIGINT))
      + bit_count(CAST(xor(da.dh_lo, db.dh_lo) AS BIGINT))
      <= {HAM_MAX}
"""
