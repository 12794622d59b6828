"""Round-13 operator tests: hot-bucket image near-dup plan,
planted-id guards, and JPEG parser edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


# --- image_near_dups hybrid plan ---------------------------------------------


def _pairs(df):
    return {(r["asset_a"], r["asset_b"]): r["hamming"]
            for r in df.collect()}


def test_image_near_dups_hybrid_equals_plain(spark):
    """The cap/blocked plan is a physical strategy for the same
    declared contract: with cap=2/block=2 EVERY bucket takes the hot
    path (blocked all-pairs Arrow verify) and with the default cap
    buckets split across both paths — both must equal the single-path
    r12 join row-for-row."""
    from gcp_datalake_utils_spark.llm import imagededup as I

    plain = _pairs(I._image_near_dups_plain(spark, SF))
    assert plain, "corpus yields no near-dup pairs (planting broken?)"
    assert _pairs(I.image_near_dups(spark, SF)) == plain
    assert _pairs(I.image_near_dups(spark, SF, cap=2, block=2)) \
        == plain
    # mixed split + multi-block tasks (block < bucket sizes)
    assert _pairs(I.image_near_dups(spark, SF, cap=4, block=3)) \
        == plain


def test_hot_verify_kernel_cross_block_ordering():
    """Cross-block tasks must emit the pair even when the block-ti
    member has the LARGER asset id (ordered, never dropped)."""
    from gcp_datalake_utils_spark.llm import imagededup as I

    pdf = pd.DataFrame({
        "asset_id": [10, 3],       # block 0 holds the larger id
        "dh_hi": [0, 0],
        "dh_lo": [0b1011, 0b1010],  # hamming 1
        "blk": [0, 1],
        "ti": [0, 0],
        "tj": [1, 1],
    })
    out = I._hot_verify_kernel(pdf)
    assert out.to_dict("records") == [
        {"asset_a": 3, "asset_b": 10, "hamming": 1}]


def test_hot_verify_kernel_same_block_dedup():
    """Same-block tasks see the full matrix: diagonal and mirrored
    orderings are dropped, true pairs kept once."""
    from gcp_datalake_utils_spark.llm import imagededup as I

    pdf = pd.DataFrame({
        "asset_id": [7, 1, 5],
        "dh_hi": [0, 0, 1 << 20],
        "dh_lo": [0, 1, 0],
        "blk": [0, 0, 0],
        "ti": [0, 0, 0],
        "tj": [0, 0, 0],
    })
    out = I._hot_verify_kernel(pdf).sort_values(
        ["asset_a", "asset_b"]).to_dict("records")
    assert out == [
        {"asset_a": 1, "asset_b": 5, "hamming": 2},
        {"asset_a": 1, "asset_b": 7, "hamming": 1},
        {"asset_a": 5, "asset_b": 7, "hamming": 1},
    ]


def test_image_plant_guard_raises(spark):
    """A real asset_id at or past IMG_PLANT_OFFSET fails the planting
    kernel loudly instead of aliasing a twin."""
    from pyspark.errors.exceptions.captured import PythonException

    from gcp_datalake_utils_spark.llm import imagededup as I
    from gcp_datalake_utils_spark.llm.multimodal import PNG_WIDTH

    rows = [(I.IMG_PLANT_OFFSET + 5,
             bytearray(b"x" * (PNG_WIDTH * I.GRID_H)))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")

    import gcp_datalake_utils_spark.llm.imagededup as mod

    orig = mod.binary_assets
    mod.binary_assets = lambda s, d: df
    try:
        with pytest.raises(PythonException, match="IMG_PLANT_OFFSET"):
            mod._dhash_rows(spark, SF, plant=True).collect()
    finally:
        mod.binary_assets = orig


def test_nd_plant_guard_raises(spark):
    """A real vec_id at or past ND_PLANT_OFFSET fails the embedding
    twin-planting plan loudly instead of aliasing a twin."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from gcp_datalake_utils_spark.llm import similarity as S

    e = spark.createDataFrame(
        [(S.ND_PLANT_OFFSET + 1, [0.0] * S.N_DIMS, "a")],
        "vec_id long, embedding array<float>, label string")
    with pytest.raises(SparkRuntimeException,
                       match="ND_PLANT_OFFSET"):
        S._with_planted_twins(e).collect()


# --- round-13 near-dup rows ---------------------------------------------------


def test_sharded_planted_equals_auto_plan(spark):
    """The registered sharded row equals the unsharded auto plan run
    over the same planted corpus — sharding only refines the join
    key, never the result set."""
    from gcp_datalake_utils_spark.llm import similarity as S
    from gcp_datalake_utils_spark.sources import load_table

    e = S._with_planted_twins(
        load_table(spark, SF, "embeddings")).localCheckpoint()
    bits, bands = S._auto_band_plan(e.count())
    auto = S._verify_pairs_arrow(
        S._banded_candidates(e, bits, bands), e, 0.95)
    ref = {(r["vec_a"], r["vec_b"], r["label"], r["cosine"])
           for r in auto.collect()}
    got = {(r["vec_a"], r["vec_b"], r["label"], r["cosine"])
           for r in S.embedding_near_dups_sharded_planted(
               spark, SF).collect()}
    assert ref and got == ref


def test_near_dups_128_planted_pairs_survive_widening(spark):
    """cosine(concat(v, rev v), concat(w, rev w)) == cosine(v, w), so
    every planted 64-dim near-dup pair appears in the 128-dim row with
    the same rounded cosine."""
    from gcp_datalake_utils_spark.llm import similarity as S
    from gcp_datalake_utils_spark.sources import load_table

    e = S._with_planted_twins(
        load_table(spark, SF, "embeddings")).localCheckpoint()
    bits, bands = S._auto_band_plan(e.count())
    base = {(r["vec_a"], r["vec_b"]): r["cosine"]
            for r in S._verify_pairs_arrow(
                S._banded_candidates(e, bits, bands), e, 0.95)
            .collect()}
    got = {(r["vec_a"], r["vec_b"]): r["cosine"]
           for r in S.embedding_near_dups_128(spark, SF).collect()}
    assert base, "planted 64-dim pairs missing"
    for pair, cos in base.items():
        assert pair in got
        assert abs(got[pair] - cos) <= 1e-6, (pair, cos, got[pair])


# --- baseline FLAC codec (round 13) ------------------------------------------


def _flac_roundtrip(s):
    from gcp_datalake_utils_spark.llm import flac as FL
    b = FL.build_flac(np.asarray(s, dtype=np.int16))
    rate, ch, bits, out = FL.parse_flac(b)
    assert (rate, ch, bits) == (FL.FLAC_SAMPLE_RATE, 1, 16)
    return b, out


def test_flac_lossless_roundtrip_all_signal_classes():
    """FLAC is lossless: decoded samples must equal the input EXACTLY
    (not an error envelope) for every signal class the encoder can
    emit — constant, smooth (fixed predictors), incompressible
    (verbatim), int16 extremes, empty, and block-boundary lengths."""
    rng = np.random.RandomState(7)
    cases = [
        np.array([], dtype=np.int16),
        np.array([32767], dtype=np.int16),
        np.full(5000, -123, dtype=np.int16),
        (np.arange(9000) % 4001 - 2000).astype(np.int16),
        rng.randint(-32768, 32768, 12345).astype(np.int16),
        np.array([-32768, 32767] * 100, dtype=np.int16),
        rng.randint(-300, 300, 4096).astype(np.int16),
        rng.randint(-300, 300, 4097).astype(np.int16),
    ]
    for s in cases:
        _b, out = _flac_roundtrip(s)
        assert (out == s).all()


def test_flac_subframe_types_all_exercised():
    """The encoder's three subframe types are all live paths: a
    constant block emits CONSTANT (tiny stream), a linear ramp emits
    FIXED (compresses), white noise emits VERBATIM (raw-sized)."""
    from gcp_datalake_utils_spark.llm import flac as FL

    const = FL.build_flac(np.full(4096, 77, dtype=np.int16))
    assert len(const) < 80  # one CONSTANT subframe, no residuals
    ramp = FL.build_flac(
        (np.arange(4096) % 1000).astype(np.int16))
    assert len(ramp) < 4096 * 2 * 0.5  # FIXED beats raw by 2x+
    noise = FL.build_flac(np.random.RandomState(3)
                          .randint(-32768, 32768, 4096)
                          .astype(np.int16))
    assert len(noise) >= 4096 * 2  # VERBATIM: raw + headers
    for b in (const, ramp, noise):
        FL.parse_flac(b)  # and each decodes (MD5-verified)


def test_flac_crc_known_vectors():
    """The CRC kernels match the published check values for
    '123456789': CRC-8 poly 0x07 -> 0xF4, CRC-16 poly 0x8005
    (unreflected, init 0) -> 0xFEE8."""
    from gcp_datalake_utils_spark.llm import flac as FL

    assert FL._crc8(b"123456789") == 0xF4
    assert FL._crc16(b"123456789") == 0xFEE8


def test_flac_golden_bitstream():
    """Hand-assembled minimal stream: 4 samples of value 256 as one
    CONSTANT-subframe frame. The encoder must emit EXACTLY these
    bytes, and the decoder must reconstruct the samples from the
    independently assembled file — so encoder and decoder cannot
    share a compensating bug (the JPEG golden-bitstream convention)."""
    import hashlib
    import struct

    from gcp_datalake_utils_spark.llm import flac as FL

    samples = np.full(4, 256, dtype=np.int16)
    # STREAMINFO: blocksizes 4096/4096, framesizes 0/0, rate 8000,
    # mono, 16-bit, total 4, then MD5 of the raw samples
    tail = (8000 << 44) | (0 << 41) | (15 << 36) | 4
    streaminfo = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6
                  + tail.to_bytes(8, "big")
                  + hashlib.md5(samples.tobytes()).digest())
    assert len(streaminfo) == 34
    # frame header: sync+fixed 0xFFF8, bs-code 0b0111 / sr-code 0,
    # mono/16-bit 0x08, frame 0, blocksize-1 = 3, then CRC-8
    hdr = b"\xff\xf8\x70\x08\x00\x00\x03"
    hdr += bytes([FL._crc8(hdr)])
    # CONSTANT subframe: header 0x00, value 256 big-endian 16-bit
    frame = hdr + b"\x00\x01\x00"
    frame += FL._crc16(frame).to_bytes(2, "big")
    golden = (b"fLaC" + b"\x80" + (34).to_bytes(3, "big")
              + streaminfo + frame)
    assert FL.build_flac(samples) == golden
    _r, _c, _b, out = FL.parse_flac(golden)
    assert (out == samples).all()


def test_flac_rejects_malformed():
    """Magic, frame-header CRC-8, whole-frame CRC-16, the STREAMINFO
    MD5 self-check, truncation, and out-of-scope streams all raise
    with a telling message instead of returning corrupt audio."""
    from gcp_datalake_utils_spark.llm import flac as FL

    good = FL.build_flac((np.arange(600) % 97 - 48).astype(np.int16))

    with pytest.raises(ValueError, match="not a FLAC"):
        FL.parse_flac(b"fLaX" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        FL.parse_flac(good[:60])
    # flip a frame-header byte (blocksize low byte) -> CRC-8 catches
    bad = bytearray(good)
    hdr_at = 4 + 4 + 34  # first frame offset
    assert bad[hdr_at] == 0xFF
    bad[hdr_at + 6] ^= 0x01
    with pytest.raises(ValueError, match="CRC-8|frame sync"):
        FL.parse_flac(bytes(bad))
    # flip a residual byte mid-frame -> CRC-16 catches
    bad = bytearray(good)
    bad[hdr_at + 20] ^= 0x10
    with pytest.raises(ValueError, match="CRC-16|unary|truncated"):
        FL.parse_flac(bytes(bad))
    # corrupt the STREAMINFO MD5 -> end-to-end self-check catches
    bad = bytearray(good)
    bad[4 + 4 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        FL.parse_flac(bytes(bad))
    # stereo STREAMINFO -> scoped rejection (byte 12 packs
    # rate_low4 | channels-1 (3 bits, values 8/4/2) | bps_high1)
    bad = bytearray(good)
    bad[4 + 4 + 12] ^= 0b00000010  # channels-1: 0 -> 1 (stereo)
    with pytest.raises(ValueError, match="mono"):
        FL.parse_flac(bytes(bad))


def test_flac_utf8_frame_numbers_multibyte():
    """Streams long enough to need multi-byte coded frame numbers
    round-trip (frame index 128+ crosses into 2-byte UTF-8)."""
    from gcp_datalake_utils_spark.llm import flac as FL

    assert FL._utf8_code(0x7F) == b"\x7f"
    assert FL._utf8_code(0x80) == b"\xc2\x80"
    assert FL._utf8_code(0x7FF) == b"\xdf\xbf"
    assert FL._utf8_code(0x800) == b"\xe0\xa0\x80"
    # 130 frames: constant blocks keep this fast (~70 B/frame)
    s = np.full(FL.FLAC_BLOCK * 130, 9, dtype=np.int16)
    _b, out = _flac_roundtrip(s)
    assert (out == s).all()


# --- MP4 container box grammar (round 13) ------------------------------------


def test_mp4_roundtrip_metadata():
    """Every metadata column must come back out of the assembled box
    tree for both handler paths (smhd and vmhd), all mapped and
    unmapped languages, and the empty payload."""
    from gcp_datalake_utils_spark.llm import mp4 as M

    for payload, lang, kind, code in [
            (b"hello world!", "en", "soun", "eng"),
            (b"x" * 4097, "zh", "vide", "zho"),
            (b"", "xx", "soun", "und"),
            (b"abc", "he", "vide", "heb")]:
        meta = M.parse_mp4(M.build_mp4(payload, lang=lang,
                                       handler=kind))
        assert meta == {
            "major_brand": "isom", "timescale": 1000,
            "duration_ms": len(payload) * M.MP4_SAMPLE_DELTA,
            "n_tracks": 1, "handler": kind, "language": code,
            "sample_count": len(payload), "mdat_len": len(payload)}


def test_mp4_walker_largesize_and_unknown_boxes():
    """The walker must take the 64-bit largesize branch and skip
    unknown boxes (the spec's forward-compat rule) without losing the
    metadata that follows."""
    import struct

    from gcp_datalake_utils_spark.llm import mp4 as M

    b = M.build_mp4(b"data", lang="fr")
    # rewrite mdat as a largesize box (size=1 + 64-bit length)
    mdat_at = len(M._box(b"ftyp", b"isom" + struct.pack(">I", 512)
                         + b"isomiso2mp41"))
    size, cc = struct.unpack_from(">I4s", b, mdat_at)
    assert cc == b"mdat"
    body = b[mdat_at + 8:mdat_at + size]
    large = struct.pack(">I4sQ", 1, b"mdat", 16 + len(body)) + body
    rewritten = b[:mdat_at] + large + b[mdat_at + size:]
    meta = M.parse_mp4(rewritten)
    assert meta["language"] == "fra" and meta["mdat_len"] == 4
    # unknown box injected between mdat and moov is skipped
    free = struct.pack(">I4s", 16, b"free") + b"\x00" * 8
    injected = b[:mdat_at + size] + free + b[mdat_at + size:]
    assert M.parse_mp4(injected)["sample_count"] == 4


def test_mp4_rejects_malformed():
    import struct

    from gcp_datalake_utils_spark.llm import mp4 as M

    good = M.build_mp4(b"payload", lang="de")
    with pytest.raises(ValueError, match="ftyp must be first"):
        M.parse_mp4(b"\x00" * 8 + good)
    with pytest.raises(ValueError, match="truncated|overruns"):
        M.parse_mp4(good[:-5])
    # box size smaller than its own header
    bad = bytearray(good)
    struct.pack_into(">I", bad, 0, 5)
    with pytest.raises(ValueError, match="bad box size"):
        M.parse_mp4(bytes(bad))
    # strip moov -> structural error
    mdat_end = good.index(b"moov") - 4
    with pytest.raises(ValueError, match="missing moov"):
        M.parse_mp4(good[:mdat_end])


# --- JPEG parser edge cases (ADVICE r12) -------------------------------------


def test_parse_jpeg_multi_table_dqt():
    """A DQT segment legally packs multiple 65-byte tables; the parser
    must read them all (it used to read only the first)."""
    from gcp_datalake_utils_spark.llm import jpeg as J

    pix = np.full((8, 8), 128, dtype=np.uint8)
    b = bytearray(J.build_jpeg(pix))
    # locate the encoder's single DQT (FFDB len 67: Pq/Tq + 64 bytes)
    i = b.index(b"\xff\xdb")
    (seglen,) = (int.from_bytes(b[i + 2:i + 4], "big"),)
    assert seglen == 67
    table0 = bytes(b[i + 4:i + 4 + 65])
    # repack: one segment holding table 0 twice (ids 0 and 1)
    table1 = bytes([1]) + table0[1:]
    packed = b[:i + 2] + (2 + 130).to_bytes(2, "big") \
        + table0 + table1 + b[i + 4 + 65:]
    out = J.parse_jpeg(bytes(packed))
    assert out.shape == (8, 8)


def test_parse_jpeg_rejects_truncated_dqt():
    from gcp_datalake_utils_spark.llm import jpeg as J

    pix = np.full((8, 8), 128, dtype=np.uint8)
    b = bytearray(J.build_jpeg(pix))
    i = b.index(b"\xff\xdb")
    bad = b[:i + 2] + (2 + 64).to_bytes(2, "big") + b[i + 4:i + 4 + 64] \
        + b[i + 4 + 65:]
    with pytest.raises(ValueError):
        J.parse_jpeg(bytes(bad))


def test_read_symbol_bounded_at_16_bits():
    """An all-ones stream with a sparse table must raise before
    consuming a 17th bit."""
    from gcp_datalake_utils_spark.llm import jpeg as J

    br = J._BitReader(b"\xff\x00\xff\x00\xff\x00")
    with pytest.raises(ValueError, match="invalid Huffman"):
        J._read_symbol(br, {})  # no code ever matches
    # exactly 16 bits consumed: the next full byte is still there
    assert br.take(8) == 0xFF
