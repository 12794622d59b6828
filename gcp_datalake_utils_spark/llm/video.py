"""Video frame pipeline (round 13) — multi-sample MP4 containers with
REAL per-frame sample tables, sample-table-driven frame extraction,
lossless per-frame decode, and video-level near-dup detection over
frame signatures.

This completes the multimodal brief's "frame-sample" leg with every
stage real except the one that genuinely needs external codecs:

- CONTAINER (real): ``build_video_mp4`` emits an ISO BMFF file whose
  sample table is no longer degenerate — a variable-size ``stsz``
  (sample_size=0 + per-frame size entries), a real ``stsc``
  (one chunk holding all frames) and an absolute-offset ``stco``;
  ``extract_frames`` re-derives each frame's byte range by PARSING
  those boxes (cumulative stsz walk from the stco chunk offset), so
  any arithmetic defect in the table is a wrong frame and a hash
  mismatch downstream.
- INTRA-FRAME CODEC (real): frames are PNG (llm/multimodal's
  CRC-verified, zlib-inflating codec) — lossless, so decoded pixels
  are formula-derivable and the whole chain stays fully oracled,
  unlike a lossy H.264 payload (which remains decode_media's honestly
  scoped stub; it would plug in exactly at the per-frame decode call).
- PIPELINE (real): stride frame-sampling (every FRAME_STRIDE-th
  sample — the triage rate a 100 TB video corpus actually decodes),
  per-frame dHash, and banded video near-dup via the SAME hybrid
  cold-join / hot-blocked Hamming engine images use
  (imagededup.banded_hamming_pairs — the hot-bucket mitigation is
  inherited as code, not prose).

Fixture: a document's byte-grid image (the imagededup corpus) is
frame 0; frame k is the grid row-rolled by k (pixel(r, c) =
base((r + k) mod h, c)) — motion the oracle can re-derive in SQL.

At 100 TB: container metadata + frame extraction + dHash ride ONE
zero-exchange Arrow scan per asset (no shuffle carries pixels); the
near-dup candidate join ships 8-byte frame-0 band keys through the
hybrid engine; the multi-frame verify joins only candidate pairs to
the 3-row-per-video signature table.

Reference parity: no media handling anywhere in the reference;
north-star extension per SURVEY.md §1.2 (multimodal columns).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import mp4 as M
from gcp_datalake_utils_spark.llm.imagededup import (
    GRID_H,
    HAM_MAX,
    _dhash_of,
    _GRID_SQL,
    _pack_sql,
    _PIX_SQL,
    banded_hamming_pairs,
)
from gcp_datalake_utils_spark.llm.multimodal import (
    PNG_WIDTH,
    binary_assets,
    build_png_batch,
    fan_out,
    parse_png,
)

N_FRAMES = 6
FRAME_STRIDE = 2
SAMPLED = tuple(range(0, N_FRAMES, FRAME_STRIDE))  # 0, 2, 4
VID_PLANT_N = 8
VID_PLANT_OFFSET = 2_000_000
VID_PLANT_BUMP = 16


def build_video_mp4(frames: list[bytes], lang: str = "en") -> bytes:
    """A spec-valid ISO BMFF file with ONE video track whose sample
    table describes ``frames`` as variable-size samples in a single
    mdat chunk: stsd('png ' visual entry), stts (N at
    MP4_SAMPLE_DELTA ticks), stsz (sample_size=0 + per-frame sizes),
    stsc (1 chunk, all samples), stco (absolute file offset of the
    first frame). Box grammar (sizes, version/flags, packed ISO-639
    language) reuses llm/mp4's builder primitives."""
    n = len(frames)
    payload = b"".join(frames)
    duration = n * M.MP4_SAMPLE_DELTA
    lang_code = M._LANG_639.get(lang, "und")

    ftyp = M._box(b"ftyp", b"isom" + struct.pack(">I", 512)
                  + b"isomiso2mp41")
    mdat = M._box(b"mdat", payload)

    mvhd = M._full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, M.MP4_TIMESCALE, duration)
        + struct.pack(">i", 0x00010000)
        + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + M._UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2))
    tkhd = M._full(b"tkhd", 0, 0x000007, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + M._UNITY_MATRIX
        + struct.pack(">II", PNG_WIDTH << 16, 0))
    mdhd = M._full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, M.MP4_TIMESCALE, duration,
        M._pack_lang(lang_code), 0))
    hdlr = M._full(b"hdlr", 0, 0, struct.pack(">I4s", 0, b"vide")
                   + b"\x00" * 12 + b"VideoHandler\x00")

    entry = M._box(b"png ", b"\x00" * 6 + struct.pack(">H", 1))
    stsd = M._full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = M._full(b"stts", 0, 0,
                   struct.pack(">III", 1, n, M.MP4_SAMPLE_DELTA)
                   if n else struct.pack(">I", 0))
    stsz = M._full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                   + b"".join(struct.pack(">I", len(f))
                              for f in frames))
    stsc = M._full(b"stsc", 0, 0,
                   struct.pack(">I", 1) + struct.pack(">III", 1, n, 1)
                   if n else struct.pack(">I", 0))
    stco = M._full(b"stco", 0, 0,
                   struct.pack(">II", 1, len(ftyp) + 8)
                   if n else struct.pack(">I", 0))
    stbl = M._box(b"stbl", stsd + stts + stsz + stsc + stco)

    vmhd = M._full(b"vmhd", 0, 1, struct.pack(">Hhhh", 0, 0, 0, 0))
    dref = M._full(b"dref", 0, 0, struct.pack(">I", 1)
                   + M._full(b"url ", 0, 1, b""))
    minf = M._box(b"minf", vmhd + M._box(b"dinf", dref) + stbl)
    mdia = M._box(b"mdia", mdhd + hdlr + minf)
    trak = M._box(b"trak", tkhd + mdia)
    moov = M._box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def extract_frames(b: bytes,
                   indices: tuple[int, ...] | None = None
                   ) -> list[tuple[int, bytes]]:
    """[(frame_idx, frame_bytes)] for ``indices`` (default: all),
    re-derived from the container's OWN sample table: walk to stbl,
    require a variable-size stsz, accumulate sizes from the stco
    chunk offset (absolute file offset), validate every frame lies
    inside mdat. Raises on structural damage — a frame is never
    guessed from magic bytes."""
    mv = M._find(b, 0, len(b), b"moov")
    if mv is None:
        raise ValueError("missing moov box")
    trak = M._find(b, mv[0], mv[1], b"trak")
    if trak is None:
        raise ValueError("missing trak box")
    stbl = None
    mdia = M._find(b, trak[0], trak[1], b"mdia")
    if mdia is not None:
        minf = M._find(b, mdia[0], mdia[1], b"minf")
        if minf is not None:
            stbl = M._find(b, minf[0], minf[1], b"stbl")
    if stbl is None:
        raise ValueError("missing stbl box")
    stsz = M._find(b, stbl[0], stbl[1], b"stsz")
    stco = M._find(b, stbl[0], stbl[1], b"stco")
    if stsz is None or stco is None:
        raise ValueError("missing stsz/stco box")
    sample_size, count = struct.unpack_from(">II", b, stsz[0] + 4)
    if sample_size != 0:
        raise ValueError("fixed-size stsz: not a framed video track")
    if stsz[0] + 12 + 4 * count > stsz[1]:
        raise ValueError("stsz table truncated")
    sizes = struct.unpack_from(f">{count}I", b, stsz[0] + 12)
    (n_chunks,) = struct.unpack_from(">I", b, stco[0] + 4)
    if n_chunks != 1:
        raise ValueError("expected a single chunk")
    (chunk_off,) = struct.unpack_from(">I", b, stco[0] + 8)
    md = M._find(b, 0, len(b), b"mdat")
    if md is None:
        raise ValueError("missing mdat box")
    want = tuple(range(count)) if indices is None else indices
    offs = [chunk_off]
    for s in sizes:
        offs.append(offs[-1] + s)
    out = []
    for k in want:
        if k >= count:
            raise ValueError(f"frame {k} out of range ({count})")
        lo, hi = offs[k], offs[k + 1]
        if lo < md[0] or hi > md[1]:
            raise ValueError("frame range escapes mdat")
        out.append((k, b[lo:hi]))
    return out


_FRAME_SCHEMA = ("asset_id long, frame_idx int, height int, "
                 "dh_hi long, dh_lo long")


def _video_frame_rows(spark: SparkSession, sf_dir: str,
                      plant: bool) -> DataFrame:
    """(asset_id, frame_idx, height, dh_hi, dh_lo) for the SAMPLED
    frames of every qualifying document-video, through the full
    byte-level round-trip: pixels -> N_FRAMES row-rolled PNGs ->
    build_video_mp4 -> extract_frames (sample-table walk) ->
    parse_png -> dHash. With ``plant``, twins of the first
    VID_PLANT_N assets are added (even ids byte-exact; odd ids bump
    base pixel (0,0) by +VID_PLANT_BUMP — the bump rolls through one
    cell of every frame, flipping at most 2 dHash bits per frame)."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # pass 1: collect every asset's base raster (+ planted
            # twins), then encode ALL N_FRAMES rolls of ALL assets in
            # one stacked build_png_batch call — the per-frame numpy
            # dispatch overhead was the dominant cost of this kernel
            ids, bases = [], []
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                if plant and aid >= VID_PLANT_OFFSET:
                    raise ValueError(
                        f"asset_id {aid} collides with "
                        f"VID_PLANT_OFFSET={VID_PLANT_OFFSET}")
                b = bytes(b)
                h = len(b) // PNG_WIDTH
                if h < GRID_H:
                    continue
                base = np.frombuffer(b[:h * PNG_WIDTH], dtype=np.uint8) \
                    .reshape(h, PNG_WIDTH)
                ids.append(aid)
                bases.append(base)
                if plant and aid < VID_PLANT_N:
                    tp = base.copy()
                    if aid % 2 == 1:
                        tp[0, 0] = (int(tp[0, 0]) + VID_PLANT_BUMP) \
                            % 256
                    ids.append(aid + VID_PLANT_OFFSET)
                    bases.append(tp)
            pngs = build_png_batch(
                [np.roll(base, -k, axis=0)
                 for base in bases for k in range(N_FRAMES)])
            out_ids, fks, hs, his, los = [], [], [], [], []
            for i, aid in enumerate(ids):
                frames = pngs[i * N_FRAMES:(i + 1) * N_FRAMES]
                video = build_video_mp4(frames)
                for k, fb in extract_frames(video, SAMPLED):
                    img, _ = parse_png(fb)
                    hi, lo = _dhash_of(img)
                    out_ids.append(aid)
                    fks.append(k)
                    hs.append(img.shape[0])
                    his.append(hi)
                    los.append(lo)
            yield pd.DataFrame({
                "asset_id": out_ids,
                "frame_idx": pd.Series(fks, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "dh_hi": pd.Series(his, dtype="int64"),
                "dh_lo": pd.Series(los, dtype="int64")})

    return (fan_out(binary_assets(spark, sf_dir), "asset_id", "payload")
            .mapInPandas(_kernel, _FRAME_SCHEMA))


def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] per-sampled-frame signature table (asset_id, frame_idx,
    height, dh_hi, dh_lo) — the triage table a video corpus builds
    before any cross-asset work. The oracle re-derives every value
    from the generative roll formula in SQL, so a defect anywhere in
    the container sample-table arithmetic, the PNG round-trip, or the
    dHash packing is a hash mismatch."""
    return _video_frame_rows(spark, sf_dir, plant=False)


# frame k of a document's pixel list p (h rows of PNG_WIDTH): output
# pixel j (0-based, row j//W, col j%W) = p[((j//W + k) % h) * W + j%W]
_ROLL_SQL = f"""
list_transform(range(h * {PNG_WIDTH}), j ->
  p[CAST((((j // {PNG_WIDTH}) + k) % h) * {PNG_WIDTH}
         + (j % {PNG_WIDTH}) + 1 AS INTEGER)])
"""

_SAMPLED_SQL = "[" + ", ".join(str(k) for k in SAMPLED) + "]"

_PF_SQL = f"""
SELECT asset_id, CAST(k AS INTEGER) AS frame_idx, h,
       {_ROLL_SQL} AS p
FROM pix, unnest({_SAMPLED_SQL}) AS t(k)
"""

VIDEO_FRAME_SAMPLE_ORACLE = f"""
WITH pix AS ({_PIX_SQL}),
pf AS ({_PF_SQL})
SELECT asset_id, frame_idx, CAST(h AS INTEGER) AS height,
       coalesce({_pack_sql(32)}, 0) AS dh_hi,
       coalesce({_pack_sql(0)}, 0) AS dh_lo
FROM (SELECT asset_id, frame_idx, h, {_GRID_SQL} AS g FROM pf)
"""


def video_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (asset_a, asset_b, max_frame_hamming, total_hamming):
    video near-duplicate pairs over the planted corpus. Candidates
    are frame-0 banded-Hamming pairs through the hybrid cold/hot
    engine (imagededup.banded_hamming_pairs — capture contract and
    hot-bucket physics inherited as code); a candidate pair verifies
    iff EVERY sampled frame agrees within HAM_MAX bits. The verify
    joins candidate pairs to the 3-row-per-video signature table —
    pair-sized, never corpus-sized."""
    fr = _video_frame_rows(spark, sf_dir, plant=True).localCheckpoint()
    f0 = (fr.where(F.col("frame_idx") == 0)
          .select("asset_id", "dh_hi", "dh_lo"))
    pairs0 = banded_hamming_pairs(f0).select("asset_a", "asset_b")
    pa = fr.select(F.col("asset_id").alias("asset_a"), "frame_idx",
                   F.col("dh_hi").alias("hi_a"),
                   F.col("dh_lo").alias("lo_a"))
    pb = fr.select(F.col("asset_id").alias("asset_b"), "frame_idx",
                   F.col("dh_hi").alias("hi_b"),
                   F.col("dh_lo").alias("lo_b"))
    ham = (F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
           + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))))
    return (pairs0.join(pa, "asset_a")
            .join(pb, ["asset_b", "frame_idx"])
            .withColumn("ham", ham.cast("int"))
            .groupBy("asset_a", "asset_b")
            .agg(F.max("ham").alias("max_frame_hamming"),
                 F.sum("ham").cast("int").alias("total_hamming"),
                 F.count("*").alias("nf"))
            .where((F.col("nf") == len(SAMPLED))
                   & (F.col("max_frame_hamming") <= HAM_MAX))
            .select("asset_a", "asset_b", "max_frame_hamming",
                    "total_hamming"))


VIDEO_NEAR_DUPS_ORACLE = f"""
WITH pix0 AS ({_PIX_SQL}),
pix AS (
  SELECT asset_id, h, p FROM pix0
  UNION ALL
  SELECT asset_id + {VID_PLANT_OFFSET} AS asset_id, h,
         CASE WHEN asset_id % 2 = 0 THEN p
              ELSE list_concat(
                [(p[1] + {VID_PLANT_BUMP}) % 256], p[2:]) END AS p
  FROM pix0 WHERE asset_id < {VID_PLANT_N}
),
pf AS ({_PF_SQL}),
dh AS (
  SELECT asset_id, frame_idx,
         coalesce({_pack_sql(32)}, 0) AS dh_hi,
         coalesce({_pack_sql(0)}, 0) AS dh_lo
  FROM (SELECT asset_id, frame_idx, h, {_GRID_SQL} AS g FROM pf)
),
f0 AS (SELECT * FROM dh WHERE frame_idx = 0),
bk AS (
  SELECT asset_id, j AS band,
         CASE WHEN j < 2 THEN (dh_lo >> (16 * j)) & 65535
              ELSE (dh_hi >> (16 * (j - 2))) & 65535 END AS key
  FROM f0, unnest(range(4)) AS t(j)
),
cand AS (
  SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
                     AND a.asset_id < b.asset_id
),
p0 AS (
  SELECT c.asset_a, c.asset_b
  FROM cand c
  JOIN f0 da ON da.asset_id = c.asset_a
  JOIN f0 db ON db.asset_id = c.asset_b
  WHERE bit_count(CAST(xor(da.dh_hi, db.dh_hi) AS BIGINT))
        + bit_count(CAST(xor(da.dh_lo, db.dh_lo) AS BIGINT))
        <= {HAM_MAX}
),
per AS (
  SELECT c.asset_a, c.asset_b, da.frame_idx,
         CAST(bit_count(CAST(xor(da.dh_hi, db.dh_hi) AS BIGINT))
              + bit_count(CAST(xor(da.dh_lo, db.dh_lo) AS BIGINT))
           AS INTEGER) AS ham
  FROM p0 c
  JOIN dh da ON da.asset_id = c.asset_a
  JOIN dh db ON db.asset_id = c.asset_b
            AND db.frame_idx = da.frame_idx
)
SELECT asset_a, asset_b,
       CAST(max(ham) AS INTEGER) AS max_frame_hamming,
       CAST(sum(ham) AS INTEGER) AS total_hamming
FROM per GROUP BY asset_a, asset_b
HAVING count(*) = {len(SAMPLED)} AND max(ham) <= {HAM_MAX}
"""
