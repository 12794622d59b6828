"""Round-12 additions: the real PNG codec (stdlib-zlib inflate + the
five scanline unfilters), the non-vacuous planted quantized near-dup
gate, the incremental curation funnel, and session-cache hygiene."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from gcp_datalake_utils_spark.llm import multimodal as M

SF = "/root/testdata/sf0.001"


# --- PNG codec ------------------------------------------------------------


def test_png_roundtrip_all_shapes():
    """decode(encode(x)) == x across shapes that exercise every filter
    type (h >= 5 hits none/sub/up/average/paeth) and both the single-
    and multi-IDAT paths."""
    rng = np.random.default_rng(7)
    for h, w in [(1, 32), (2, 5), (4, 1), (5, 32), (7, 32), (9, 3),
                 (64, 64)]:
        pix = rng.integers(0, 256, (h, w)).astype(np.uint8)
        img, n_idat = M.parse_png(M.build_png(pix))
        assert img.shape == (h, w)
        assert (img == pix).all(), (h, w)
    # gradient + constant images (filter-friendly extremes)
    for pix in (np.tile(np.arange(32, dtype=np.uint8), (6, 1)),
                np.full((6, 32), 200, dtype=np.uint8)):
        img, _ = M.parse_png(M.build_png(pix))
        assert (img == pix).all()


def test_png_multi_idat_and_ancillary_skip():
    """Normal-document-sized images deflate past _PNG_IDAT_CHUNK, so
    the stream spans >= 2 IDAT chunks the walker must concatenate; the
    tEXt ancillary chunk is present in the bytes and skipped."""
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    b = M.build_png(pix)
    assert b.count(b"IDAT") >= 2
    assert b"tEXt" in b
    img, n_idat = M.parse_png(b)
    assert n_idat >= 2
    assert (img == pix).all()


def test_png_filter_bytes_cover_all_five():
    """The encoder's r % 5 schedule must materialize as real filter
    bytes in the deflated stream — peek the inflated scanlines."""
    pix = np.random.default_rng(3).integers(0, 256, (10, 8)) \
        .astype(np.uint8)
    b = M.build_png(pix)
    # concat IDAT data the same way the parser does
    pos, idat = 8, bytearray()
    while pos + 8 <= len(b):
        size, ctype = struct.unpack_from(">I4s", b, pos)
        if ctype == b"IDAT":
            idat += b[pos + 8:pos + 8 + size]
        pos += 12 + size
    raw = zlib.decompress(bytes(idat))
    filters = [raw[r * 9] for r in range(10)]
    assert filters == [r % 5 for r in range(10)]


def test_png_known_pixels_hand_checked():
    """2x2 image decoded equals the hand-derived raster (row 0 filter
    none, row 1 filter sub: [10, 250] -> filtered [10, 240]; decode
    must prefix-sum mod 256)."""
    pix = np.array([[7, 9], [10, 250]], dtype=np.uint8)
    b = M.build_png(pix)
    img, _ = M.parse_png(b)
    assert img.tolist() == [[7, 9], [10, 250]]


def test_png_malformed_raise():
    pix = np.random.default_rng(5).integers(0, 256, (5, 32)) \
        .astype(np.uint8)
    b = M.build_png(pix)
    with pytest.raises(ValueError, match="signature"):
        M.parse_png(b"nope" + b[4:])
    bad = bytearray(b)
    bad[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        M.parse_png(bytes(bad))
    with pytest.raises(ValueError, match="IHDR|IDAT|IEND"):
        M.parse_png(b[:-12])  # drop IEND
    # color type 2 (RGB) must be rejected, not misread
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    rgb = (M._PNG_SIG + M._png_chunk(b"IHDR", ihdr)
           + M._png_chunk(b"IDAT", zlib.compress(b"\x00" * 14))
           + M._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="grayscale"):
        M.parse_png(rgb)
    # truncated IDAT payload vs declared length
    with pytest.raises(ValueError):
        M.parse_png(b[:len(b) // 2])


def test_png_features_match_pixel_arithmetic(spark):
    """The [Q] row's features recomputed directly from the text bytes
    (the oracle's generative formula) equal the decoded-path output."""
    import hashlib

    df = M.png_decode_features(spark, SF)
    rows = {r["asset_id"]: r for r in df.collect()}
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect())
    n_checked = 0
    for d in docs[:40]:
        raw = d["text"].encode()
        h = len(raw) // M.PNG_WIDTH
        if h < 1:
            assert d["doc_id"] not in rows
            continue
        pix = np.frombuffer(raw[:h * M.PNG_WIDTH], dtype=np.uint8) \
            .reshape(h, M.PNG_WIDTH)
        r = rows[d["doc_id"]]
        assert r["width"] == M.PNG_WIDTH and r["height"] == h
        assert r["pixel_md5"] == hashlib.md5(pix.tobytes()).hexdigest()
        x = pix.astype(np.float64)
        assert r["mean_luma"] == pytest.approx(x.mean(), abs=1e-6)
        assert r["mean_abs_dx"] == pytest.approx(
            np.abs(np.diff(x, axis=1)).mean(), abs=1e-6)
        n_checked += 1
    assert n_checked >= 30


# --- session-cache hygiene --------------------------------------------------


def test_session_cache_pops_gate_on_builder_failure():
    """A raising builder() must not leave its per-key gate behind
    (monotonic _building growth under repeated distinct-key failures);
    the next caller for the key retries and can succeed."""
    from gcp_datalake_utils_spark.session import SessionCache

    c = SessionCache()
    for k in range(20):
        with pytest.raises(RuntimeError):
            c.get_or_build(k, lambda: (_ for _ in ()).throw(
                RuntimeError("boom")))
    assert not c._building, "gate entries leaked on failure"
    assert c.get_or_build(3, lambda: "ok") == "ok"


# --- planted quantized near-dup gate ----------------------------------------


def test_quantized_gate_planted_pairs_nonvacuous(spark):
    """The [Q] row verifies a NON-EMPTY set: every planted twin pair
    (i, i + ND_PLANT_OFFSET) for i < ND_PLANT_N appears; even anchors
    at cosine exactly 1.0, odd bumped twins strictly inside
    (0.95, 1.0) — i.e. the prefilter admitted a non-trivial value."""
    from gcp_datalake_utils_spark.llm import similarity as S

    rows = S.embedding_near_dups_quantized(spark, SF).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}
    assert len(got) >= S.ND_PLANT_N
    for i in range(S.ND_PLANT_N):
        cos = got[(i, i + S.ND_PLANT_OFFSET)]
        if i % 2 == 0:
            assert cos == pytest.approx(1.0, abs=1e-6)
        else:
            assert 0.95 <= cos < 0.9999, (i, cos)


# --- incremental curation funnel ---------------------------------------------


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_curation_incremental_monotone_and_store_precedence(spark):
    """Verdict flags are monotone per doc; any batch doc with an exact
    twin in the admitted store is dropped at the exact stage."""
    from gcp_datalake_utils_spark.llm import curation as C

    rows = C.curation_incremental(spark, SF).collect()
    assert rows, "batch verdict is empty"
    for r in rows:
        assert r["doc_id"] % 10 == 0
        # monotone: dropped at stage k stays dropped
        assert not (r["fuzzy_kept"] and not r["exact_kept"])
        assert not (r["final_kept"] and not r["fuzzy_kept"])


def test_curation_store_replay_reproduces_verdict(spark, tmp_path):
    """The persisted-store path equals the in-memory [Q] row; a second
    call after 'restart' skips the store build (parquet untouched) and
    reproduces the verdict byte-for-byte; a crash mid-build (no
    CONVERGED marker, partial files present) rebuilds cleanly."""
    import os

    from gcp_datalake_utils_spark.llm import curation as C

    store = str(tmp_path / "store")
    expected = _rows(C.curation_incremental(spark, SF))

    got1 = _rows(C.admit_batch_against_store(spark, SF, store))
    assert got1 == expected
    assert os.path.exists(os.path.join(store, "CONVERGED"))

    # replay: store must NOT be rebuilt (mtimes frozen), verdict equal
    mtimes = {p: os.path.getmtime(os.path.join(store, p))
              for p in ("hashes", "bands", "shingles")}
    got2 = _rows(C.admit_batch_against_store(spark, SF, store))
    assert got2 == expected
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(store, p)) == t, \
            f"{p} rebuilt on replay"

    # crash mid-build: marker gone, partial artifacts remain
    os.remove(os.path.join(store, "CONVERGED"))
    import shutil
    shutil.rmtree(os.path.join(store, "shingles"))
    got3 = _rows(C.admit_batch_against_store(spark, SF, store))
    assert got3 == expected
    assert os.path.exists(os.path.join(store, "CONVERGED"))


# --- label-group-sharded ANN candidates --------------------------------------


def _formatted_plan(df) -> str:
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution \
        .ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def test_sharded_candidates_equal_unsharded(spark, tmp_path):
    """Label-group sharding is LOSSLESS: both the in-DAG extra-key
    form and the sequential parquet-committed form produce exactly
    the unsharded candidate set (and verified pair set)."""
    from gcp_datalake_utils_spark.llm import similarity as S
    from gcp_datalake_utils_spark.sources import load_table

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "embeddings")
    bits, bands = S._auto_band_plan(e.count())
    base = set(map(tuple, S._banded_candidates(e, bits, bands)
                   .collect()))
    assert base, "need non-empty candidates for a meaningful check"
    indag = set(map(tuple, S._banded_candidates_sharded(
        e, bits, bands, n_shards=4).collect()))
    assert indag == base
    seq = set(map(tuple, S._banded_candidates_sharded(
        e, bits, bands, n_shards=3,
        scratch_dir=str(tmp_path / "cand")).collect()))
    assert seq == base
    auto = set(map(tuple, S.embedding_near_dups_auto(spark, sf)
                   .collect()))
    shd = set(map(tuple, S.embedding_near_dups_sharded(spark, sf, 4)
                  .collect()))
    assert shd == auto


def test_sharded_candidates_plan_shape(spark):
    """The in-DAG sharded join is an EQUI join carrying the shard key
    (no cartesian, no broadcast-nested-loop), with shard/label/band/key
    all in the join keys."""
    from gcp_datalake_utils_spark.llm import similarity as S
    from gcp_datalake_utils_spark.sources import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    df = S._banded_candidates_sharded(e, 8, 8, n_shards=4)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    key_lines = [ln for ln in plan.splitlines()
                 if ln.strip().startswith(("Left keys", "Right keys"))]
    assert key_lines, "no equi-join key lines in the plan"
    assert all("[4]" in ln and "shard" in ln and "label" in ln
               and "band" in ln and "key" in ln for ln in key_lines), \
        "shard must join as an extra equi key alongside label/band/key"


# --- image near-dup dedup over decoded pixels --------------------------------


def test_image_dhash_locality_and_planting(spark):
    """dHash is locality-sensitive: an exact pixel twin hashes
    identically; a one-pixel bump flips at most one comparison bit.
    Every qualifying planted pair appears in the near-dup output."""
    from gcp_datalake_utils_spark.llm import imagededup as I

    base = {r["asset_id"]: (r["dh_hi"], r["dh_lo"])
            for r in I.image_dhash(spark, SF).collect()}
    assert base, "no qualifying images"
    pairs = {(r["asset_a"], r["asset_b"]): r["hamming"]
             for r in I.image_near_dups(spark, SF).collect()}
    n_planted = 0
    for aid in base:
        if aid >= I.IMG_PLANT_N:
            continue
        ham = pairs[(aid, aid + I.IMG_PLANT_OFFSET)]
        assert ham <= 1, (aid, ham)
        if aid % 2 == 0:
            assert ham == 0
        n_planted += 1
    assert n_planted >= 1
    for (a, b), h in pairs.items():
        assert 0 <= h <= I.HAM_MAX and a < b


def test_image_dhash_matches_pixel_arithmetic(spark):
    """The decoded-path dHash equals one recomputed directly from the
    text-derived pixels (the oracle's generative formula) — the
    encode -> decode round trip is transparent to the hash."""
    import numpy as np

    from gcp_datalake_utils_spark.llm import imagededup as I
    from gcp_datalake_utils_spark.llm.multimodal import PNG_WIDTH

    got = {r["asset_id"]: (r["dh_hi"], r["dh_lo"])
           for r in I.image_dhash(spark, SF).collect()}
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect())
    n = 0
    for d in docs:
        raw = d["text"].encode()
        h = len(raw) // PNG_WIDTH
        if h < I.GRID_H:
            assert d["doc_id"] not in got
            continue
        pix = np.frombuffer(raw[:h * PNG_WIDTH], dtype=np.uint8) \
            .reshape(h, PNG_WIDTH)
        assert got[d["doc_id"]] == I._dhash_of(pix)
        n += 1
    assert n >= 10


# --- baseline JPEG codec ------------------------------------------------------


def test_jpeg_flat_blocks_reconstruct_within_one():
    """DC-only blocks: quantization error bounded by the DC step."""
    from gcp_datalake_utils_spark.llm import jpeg as J

    for v in (0, 37, 128, 200, 255):
        pix = np.full((16, 32), v, dtype=np.uint8)
        dec = J.parse_jpeg(J.build_jpeg(pix))
        assert dec.shape == pix.shape
        assert np.abs(dec.astype(int) - int(v)).max() <= 1, v


def test_jpeg_roundtrip_error_bounds_and_padding():
    """Worst-case (uniform-noise) images stay inside the Annex-K-table
    error envelope; non-multiple-of-8 shapes pad and crop correctly;
    a smooth gradient (the content JPEG is FOR) reconstructs within
    +-2."""
    from gcp_datalake_utils_spark.llm import jpeg as J

    rng = np.random.default_rng(3)
    for shape in [(8, 8), (9, 15), (40, 32), (5, 3)]:
        pix = rng.integers(0, 256, shape).astype(np.uint8)
        dec = J.parse_jpeg(J.build_jpeg(pix))
        assert dec.shape == shape
        err = np.abs(dec.astype(int) - pix.astype(int))
        assert err.max() <= 110 and err.mean() <= 25, shape
    g = np.tile(np.arange(32, dtype=np.uint8) * 4, (16, 1))
    dec = J.parse_jpeg(J.build_jpeg(g))
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2


def test_jpeg_golden_bitstream_hand_assembled():
    """Decoder validated against a HAND-computed entropy stream (so
    encoder and decoder cannot share a compensating bug): an all-zero
    8x8 image level-shifts to -128, DC = -1024, quantized -64 ->
    DC category 7 ('11110'), amplitude bits -64+127=63 ('0111111'),
    EOB ('1010') = bytes F3 FA. The encoder must emit exactly that
    scan; the decoder must reconstruct all zeros from it."""
    import struct

    from gcp_datalake_utils_spark.llm import jpeg as J

    pix = np.zeros((8, 8), dtype=np.uint8)
    coded = J.build_jpeg(pix)
    sos_at = coded.find(b"\xff\xda")
    (sos_len,) = struct.unpack_from(">H", coded, sos_at + 2)
    scan = coded[sos_at + 2 + sos_len:-2]
    assert scan.hex() == "f3fa"
    # independent assembly of the same file structure
    hand = (b"\xff\xd8"
            + J._seg(0xFFDB, b"\x00" + bytes(
                J.QTABLE[J.ZIGZAG[k]] for k in range(64)))
            + J._seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1)
                     + bytes([1, 0x11, 0]))
            + J._seg(0xFFC4, b"\x00" + bytes(J.DC_BITS)
                     + bytes(J.DC_VALS))
            + J._seg(0xFFC4, b"\x10" + bytes(J.AC_BITS)
                     + bytes(J.AC_VALS))
            + J._seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bytes.fromhex("f3fa") + b"\xff\xd9")
    assert (J.parse_jpeg(hand) == 0).all()


def test_jpeg_byte_stuffing_roundtrip():
    """Scans that produce 0xFF bytes must stuff FF00 and the reader
    must strip it — scan many seeds until a stuffed byte appears."""
    from gcp_datalake_utils_spark.llm import jpeg as J

    found = False
    for seed in range(40):
        pix = np.random.default_rng(seed).integers(
            0, 256, (16, 16)).astype(np.uint8)
        b = J.build_jpeg(pix)
        sos_at = b.find(b"\xff\xda")
        scan = b[sos_at + 14:-2]
        if b"\xff\x00" in scan:
            found = True
            dec = J.parse_jpeg(b)
            assert dec.shape == (16, 16)
    assert found, "no stuffed byte in 40 seeds — stuffing untested"


def test_jpeg_malformed_raise():
    from gcp_datalake_utils_spark.llm import jpeg as J

    pix = np.random.default_rng(1).integers(0, 256, (8, 8)) \
        .astype(np.uint8)
    b = J.build_jpeg(pix)
    with pytest.raises(ValueError, match="SOI"):
        J.parse_jpeg(b"xx" + b[2:])
    with pytest.raises(ValueError):
        J.parse_jpeg(b[:len(b) // 2])  # truncated
    # progressive marker rejected
    prog = b.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        J.parse_jpeg(prog)


def test_jpeg_roundtrip_quality_row(spark):
    """The rows-only monitor ledger is sane on the driver corpus:
    every qualifying doc appears, dims match, and the measured error
    stays inside the codec's pytest envelope."""
    from gcp_datalake_utils_spark.llm import jpeg as J

    rows = J.jpeg_roundtrip_quality(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["width"] == 32 and r["height"] >= 1
        assert r["raw_bytes"] == 32 * r["height"]
        assert 0 <= r["max_abs_err"] <= 110
        assert r["mean_abs_err"] <= 25
        assert r["coded_bytes"] > 0


def test_dhash_survives_jpeg_reencode():
    """The perceptual-hash promise, composed across the round-12
    codecs: dHash of a JPEG round-tripped image stays within HAM_MAX
    of the original's — lossy re-encodes of the same picture are
    caught as near-duplicates (the production image-dedup case),
    while the hash still separates unrelated images."""
    from gcp_datalake_utils_spark.llm import imagededup as I
    from gcp_datalake_utils_spark.llm import jpeg as J

    rng = np.random.default_rng(17)
    # smooth-ish images (low-pass noise), the content class JPEG keeps
    base = rng.integers(0, 64, (12, 16, 32)).astype(np.float64)
    smooth = (base + np.roll(base, 1, 1) + np.roll(base, 1, 2)
              + np.roll(base, 2, 2)) * (255 / (4 * 63))
    imgs = smooth.astype(np.uint8)
    hams, cross = [], []
    hashes = []
    for pix in imgs:
        rt = J.parse_jpeg(J.build_jpeg(pix))
        h0, l0 = I._dhash_of(pix)
        h1, l1 = I._dhash_of(rt)
        hams.append(bin((h0 ^ h1) | ((l0 ^ l1) << 32)).count("1"))
        hashes.append((h0, l0))
    for i in range(len(imgs)):
        for j in range(i + 1, len(imgs)):
            hi, li = hashes[i]
            hj, lj = hashes[j]
            cross.append(bin((hi ^ hj) | ((li ^ lj) << 32))
                         .count("1"))
    assert max(hams) <= I.HAM_MAX, hams
    assert min(cross) > I.HAM_MAX, sorted(cross)[:3]
