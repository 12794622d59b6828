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
    build_png_batch,
    fan_out,
    parse_png,
)

GRID_H = 8          # output rows; input needs >= 8 pixel rows
GRID_W = 9          # output cols; 8 horizontal comparisons per row
HAM_MAX = 6         # near-dup verify threshold (bits of 64)
IMG_PLANT_N = 10    # planted twins for the near-dup gate
IMG_PLANT_OFFSET = 2_000_000
IMG_PLANT_BUMP = 16  # +16 (mod 256) on pixel 0 of odd-id twins

# Hot-bucket mitigation (round 13, r12 verdict ask #1): band buckets
# larger than BUCKET_CAP skip the self-join and go through a blocked
# within-bucket Arrow verify instead; BLOCK bounds the per-task
# pair-matrix side. Measured at tmp/sf10 (317k images): CAP=64 splits
# the 214.2M-pair candidate mass into a 3.8M-row cold join + 0.96M hot
# members whose 210.4M comparisons run as vectorized numpy popcounts
# (~1.04M shuffled rows after block-pair replication at B=1024).
BUCKET_CAP = 64
BLOCK = 1024

_DHASH_SCHEMA = "asset_id long, dh_hi long, dh_lo long"


_BIT_W32 = None  # 1 << arange(32), built lazily per worker


def _dhash_of(pix) -> tuple[int, int]:
    """(dh_hi, dh_lo) 32-bit halves of the 64-bit dHash of an (h, w)
    uint8 array: area-mean resize to GRID_H x GRID_W (integer floor
    means over floor-boundary blocks), bit r*8+c = grid[r][c+1] >
    grid[r][c]. Block sums run as two np.add.reduceat passes (one per
    axis) instead of 72 per-cell slice-sums — same floor-boundary
    blocks, same integer floor means (pytest + the oracled rows gate
    bit-identity). The r13 driver gate recorded a hash mismatch on
    this row that no local run reproduces (see
    plans/r14/image_dhash_red_note.md), so the block sums are now
    recomputed through an independent integral-image path and any
    disagreement raises with both grids — a worker-env numeric
    divergence fails loudly instead of emitting a silently wrong
    hash."""
    import numpy as np
    global _BIT_W32
    if _BIT_W32 is None:
        _BIT_W32 = 1 << np.arange(32, dtype=np.int64)
    h, w = pix.shape
    if h < GRID_H or w < GRID_W:
        raise ValueError(
            f"dHash needs >= {GRID_H}x{GRID_W} pixels, got {h}x{w}")
    x = pix.astype(np.int64)
    rb = np.arange(GRID_H + 1, dtype=np.int64) * h // GRID_H
    cb = np.arange(GRID_W + 1, dtype=np.int64) * w // GRID_W
    g = np.add.reduceat(np.add.reduceat(x, rb[:-1], axis=0),
                        cb[:-1], axis=1)
    s = np.zeros((h + 1, w + 1), dtype=np.int64)
    np.cumsum(np.cumsum(x, axis=0), axis=1, out=s[1:, 1:])
    g2 = (s[rb[1:]][:, cb[1:]] - s[rb[:-1]][:, cb[1:]]
          - s[rb[1:]][:, cb[:-1]] + s[rb[:-1]][:, cb[:-1]])
    if not np.array_equal(g, g2):
        raise ValueError(
            "dHash block-sum divergence (reduceat vs integral image): "
            f"{g.tolist()} vs {g2.tolist()}")
    g //= np.diff(rb)[:, None] * np.diff(cb)[None, :]
    bits = (g[:, 1:] > g[:, :-1]).ravel()  # index r*8+c
    lo = int((bits[:32] * _BIT_W32).sum())
    hi = int((bits[32:] * _BIT_W32).sum())
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
            ids, pixes = [], []
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
                ids.append(aid)
                pixes.append(pix)
                if plant and aid < IMG_PLANT_N:
                    tp = pix.copy()
                    if aid % 2 == 1:
                        tp[0, 0] = (int(tp[0, 0]) + IMG_PLANT_BUMP) \
                            % 256
                    ids.append(aid + IMG_PLANT_OFFSET)
                    pixes.append(tp)
            # one stacked filter+deflate pass for the whole batch
            # (same per-image bytes as build_png), then decode + hash.
            # The decoded image must equal the source pixels (lossless
            # round trip); asserting it per asset turns any worker-env
            # codec divergence into a loud, attributable error instead
            # of a silent hash mismatch (r13 driver-red hardening).
            his, los = [], []
            for aid, pix, png in zip(ids, pixes, build_png_batch(pixes)):
                img, _ = parse_png(png)
                if not np.array_equal(img, pix):
                    raise ValueError(
                        f"PNG round-trip divergence on asset {aid}: "
                        f"shape {pix.shape} -> {img.shape}")
                hi, lo = _dhash_of(img)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame({"asset_id": ids, "dh_hi": his,
                                "dh_lo": los})

    return (fan_out(binary_assets(spark, sf_dir), "asset_id", "payload")
            .mapInPandas(_kernel, _DHASH_SCHEMA))


def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_id, dh_hi, dh_lo): the perceptual difference hash of
    every qualifying document-image, computed from REAL-decoded PNG
    pixels. The oracle re-derives grid means, comparison bits and the
    two-half packing from the text bytes, so the whole
    encode -> decode -> resize -> hash chain is value-gated."""
    return _dhash_rows(spark, sf_dir, plant=False)


def _band_rows(dh: DataFrame) -> DataFrame:
    """(asset_id, dh_hi, dh_lo, band, key): one row per (image, band)
    with the 16-bit band key — 4 rows/image, hashes carried so the
    verify never re-joins the hash table."""
    mask = F.lit(0xFFFF)
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            (F.shiftrightunsigned("dh_lo" if j < 2 else "dh_hi",
                                  16 * (j % 2))
             .bitwiseAND(mask)).alias("key"))
        for j in range(4)])
    return (dh.select("asset_id", "dh_hi", "dh_lo",
                      F.explode(bands).alias("bk"))
            .select("asset_id", "dh_hi", "dh_lo",
                    "bk.band", "bk.key"))


_PAIR_SCHEMA = "asset_a long, asset_b long, hamming int"
_POPCOUNT = None  # byte-popcount LUT, built once per executor


def _hot_verify_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """All-pairs Hamming verify for ONE block-pair task of a hot
    bucket: vectorized uint64 XOR + byte-LUT popcount (numpy < 2 has
    no bitwise_count). Emits only verified pairs (hamming <= HAM_MAX,
    asset_a < asset_b) — the candidate matrix never leaves the task."""
    import numpy as np
    global _POPCOUNT
    if _POPCOUNT is None:
        _POPCOUNT = np.array([bin(i).count("1") for i in range(256)],
                             dtype=np.uint8)

    ids = pdf["asset_id"].to_numpy()
    f = ((pdf["dh_hi"].to_numpy().astype(np.uint64) << np.uint64(32))
         | pdf["dh_lo"].to_numpy().astype(np.uint64))
    ti = int(pdf["ti"].iloc[0])
    tj = int(pdf["tj"].iloc[0])
    if ti == tj:
        ia = ib = np.arange(len(ids))
    else:
        ia = np.flatnonzero(pdf["blk"].to_numpy() == ti)
        ib = np.flatnonzero(pdf["blk"].to_numpy() == tj)
    outs = []
    # chunk both sides so the XOR matrix stays <= ~32 MB even if a
    # block runs large (pmod skew)
    for a0 in range(0, len(ia), 2048):
        sa = ia[a0:a0 + 2048]
        for b0 in range(0, len(ib), 2048):
            sb = ib[b0:b0 + 2048]
            x = f[sa][:, None] ^ f[sb][None, :]
            h = _POPCOUNT[x.view(np.uint8).reshape(
                len(sa), len(sb), 8)].sum(axis=2, dtype=np.int32)
            r, c = np.nonzero(h <= HAM_MAX)
            if not len(r):
                continue
            aa, bb = ids[sa[r]], ids[sb[c]]
            if ti == tj:
                # full matrix: drop diagonal + one of each mirrored
                # ordering
                keep = aa < bb
                aa, bb, hh = aa[keep], bb[keep], h[r, c][keep]
            else:
                # cross-block: each unordered pair appears exactly
                # once — order it, never drop it
                hh = h[r, c]
                aa, bb = np.minimum(aa, bb), np.maximum(aa, bb)
            outs.append(pd.DataFrame({
                "asset_a": aa, "asset_b": bb,
                "hamming": hh.astype("int32")}))
    if not outs:
        return pd.DataFrame({"asset_a": pd.Series([], dtype="int64"),
                             "asset_b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int32")})
    return pd.concat(outs, ignore_index=True)


def image_near_dups(spark: SparkSession, sf_dir: str,
                    cap: int = BUCKET_CAP,
                    block: int = BLOCK) -> DataFrame:
    """[Q] (asset_a, asset_b, hamming): image near-duplicate pairs at
    Hamming <= HAM_MAX over the planted corpus — 4x16-bit banded
    candidate generation + exact Hamming verify on candidates only.

    Capture contract (mirrored exactly in the oracle, so both engines
    agree row-for-row): 4 exact-match bands guarantee capture for
    Hamming <= 3 (pigeonhole — some band is clean); pairs at 4-6 are
    captured iff the differing bits leave one band untouched (a twin
    differing in <= 1 bit collides in >= 3 of 4 bands; structured
    perturbations like JPEG re-encode concentrate in few cells). The
    declared-banding semantics is the simhash_near_pairs precedent.

    Hot-bucket execution (round 13, r12 verdict ask #1): the synthetic
    text-pixel corpus gives LOW-ENTROPY dHash bits, so 16-bit band
    buckets run hot — the r12 single-path self-join materialized and
    distinct-ed ~214M candidate rows at 500k images. The plan now
    splits per bucket size, with IDENTICAL output (so the oracle is
    untouched — this is a physical strategy for the same declared
    contract, pytest-asserted equal to the plain join):
      * cold buckets (n <= cap): whole-stage-codegen self-join, but
        the Hamming filter runs BEFORE distinct, so the shuffle after
        the join is output-sized, not candidate-sized;
      * hot buckets (n > cap): members are replicated to
        ceil(n/block) block-pair tasks (blocked all-pairs — shuffle
        is sum(n*ceil(n/block)) rows, compute is the same sum-C(n,2)
        popcounts but as in-task vectorized numpy, never join rows).
    At 100x corpus a 284k-member bucket ships ~79M 29-byte rows and
    spreads ~40G popcounts over ~39k tasks — both terms bounded by
    block, no single-task skew, no candidate-sized exchange."""
    dh = _dhash_rows(spark, sf_dir, plant=True).localCheckpoint()
    return banded_hamming_pairs(dh, cap, block)


def banded_hamming_pairs(dh: DataFrame, cap: int = BUCKET_CAP,
                         block: int = BLOCK) -> DataFrame:
    """(asset_a, asset_b, hamming <= HAM_MAX) over any
    (asset_id, dh_hi, dh_lo) signature frame — the hybrid cold-join /
    hot-blocked banded Hamming engine behind image_near_dups,
    factored out so other signature spaces (llm/video.py's frame-0
    video signatures) get the hot-bucket-safe plan for free. The
    caller owns materializing ``dh`` (localCheckpoint or scratch
    store) since it is scanned by both the size profile and the
    join."""
    sizes = (_band_rows(dh).groupBy("band", "key")
             .agg(F.count("*").alias("n")))
    bk = _band_rows(dh).join(F.broadcast(sizes), ["band", "key"])

    cold = bk.where(F.col("n") <= cap)
    a = cold.select("band", "key",
                    F.col("asset_id").alias("asset_a"),
                    F.col("dh_hi").alias("hi_a"),
                    F.col("dh_lo").alias("lo_a"))
    b = cold.select("band", "key",
                    F.col("asset_id").alias("asset_b"),
                    F.col("dh_hi").alias("hi_b"),
                    F.col("dh_lo").alias("lo_b"))
    ham = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
           + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    cold_pairs = (a.join(b, ["band", "key"])
                  .where(F.col("asset_a") < F.col("asset_b"))
                  .withColumn("hamming", ham.cast("int"))
                  .where(F.col("hamming") <= HAM_MAX)
                  .select("asset_a", "asset_b", "hamming"))

    # hot members: block id within the bucket; each member joins every
    # block-pair task its block participates in — task (i, j) sees
    # block i once (via o = j) and block j once (via o = i)
    hot = (bk.where(F.col("n") > cap)
           .withColumn("nb", F.ceil(F.col("n") / F.lit(block))
                       .cast("int"))
           .withColumn("blk", F.pmod("asset_id", "nb").cast("int"))
           .withColumn("o", F.explode(
               F.sequence(F.lit(0), F.col("nb") - 1)))
           .select("asset_id", "dh_hi", "dh_lo", "band", "key", "blk",
                   F.least("blk", "o").alias("ti"),
                   F.greatest("blk", "o").alias("tj")))
    hot_pairs = (hot.groupBy("band", "key", "ti", "tj")
                 .applyInPandas(_hot_verify_kernel, _PAIR_SCHEMA))

    # a pair can recur across bands (and across the cold/hot split
    # when it shares both a cold and a hot band) — distinct runs on
    # the VERIFIED output, which is near-dup-sized, not candidate-sized
    return cold_pairs.unionByName(hot_pairs).distinct()


def _image_near_dups_plain(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """The single-path r12 plan (band self-join over every bucket,
    distinct on candidates, then verify) — kept as the reference twin
    for the pytest that proves the hybrid plan is output-identical."""
    dh = _dhash_rows(spark, sf_dir, plant=True).localCheckpoint()
    bk = _band_rows(dh).select("asset_id", "band", "key")
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
