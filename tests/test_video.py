"""Video pipeline (llm/video.py): container round-trip, sample-table
validation, roll fixture semantics, planted-twin capture, and
frame-0/image-dHash consistency."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import imagededup, mp4, video
from gcp_datalake_utils_spark.llm.multimodal import build_png, parse_png


def _base(h=12, w=32, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w)).astype(np.uint8)


def test_video_mp4_frame_roundtrip():
    """Every frame extracted via the sample table must be BYTE-equal
    to the PNG that went in, at every index."""
    frames = [build_png(np.roll(_base(), -k, axis=0))
              for k in range(video.N_FRAMES)]
    b = video.build_video_mp4(frames)
    got = video.extract_frames(b)
    assert [k for k, _ in got] == list(range(video.N_FRAMES))
    for k, fb in got:
        assert fb == frames[k], k
    # subset extraction honors the stride indices
    got2 = video.extract_frames(b, video.SAMPLED)
    assert [k for k, _ in got2] == list(video.SAMPLED)
    for k, fb in got2:
        assert fb == frames[k]


def test_video_mp4_is_valid_bmff():
    """The framed file still parses through the generic container
    walker (handler vide, correct sample count and duration)."""
    frames = [build_png(_base()) for _ in range(video.N_FRAMES)]
    meta = mp4.parse_mp4(video.build_video_mp4(frames, lang="de"))
    assert meta["handler"] == "vide"
    assert meta["language"] == "deu"
    assert meta["duration_ms"] == video.N_FRAMES * mp4.MP4_SAMPLE_DELTA
    assert meta["mdat_len"] == sum(len(f) for f in frames)


def test_extract_frames_rejections():
    frames = [build_png(_base()) for _ in range(3)]
    good = video.build_video_mp4(frames)
    # audio-style fixed-size stsz is not a framed video track
    with pytest.raises(ValueError, match="fixed-size stsz"):
        video.extract_frames(mp4.build_mp4(b"payload"))
    # out-of-range frame index
    with pytest.raises(ValueError, match="out of range"):
        video.extract_frames(good, (5,))
    # corrupt the stco chunk offset so frames escape mdat
    bad = bytearray(good)
    i = bad.index(b"stco")
    struct.pack_into(">I", bad, i + 12, len(good))
    with pytest.raises(ValueError, match="escapes mdat"):
        video.extract_frames(bytes(bad))
    # truncated container
    with pytest.raises(ValueError):
        video.extract_frames(good[:40])


def test_roll_fixture_decodes_to_rolled_base():
    """Decoded frame k must equal base rows rolled by k — the exact
    formula the oracle re-derives in SQL."""
    base = _base(h=10)
    frames = [build_png(np.roll(base, -k, axis=0))
              for k in range(video.N_FRAMES)]
    b = video.build_video_mp4(frames)
    for k, fb in video.extract_frames(b, video.SAMPLED):
        img, _ = parse_png(fb)
        want = np.stack([base[(r + k) % base.shape[0]]
                         for r in range(base.shape[0])])
        assert (img == want).all(), k


def test_frame0_matches_image_dhash(spark, sf_dir):
    """Frame 0 is the un-rolled base image, so its signature must be
    IDENTICAL to image_dhash's for every qualifying asset — the
    cross-family consistency anchor."""
    f0 = {r.asset_id: (r.dh_hi, r.dh_lo)
          for r in video.video_frame_sample(spark, sf_dir)
          .where(F.col("frame_idx") == 0).collect()}
    img = {r.asset_id: (r.dh_hi, r.dh_lo)
           for r in imagededup.image_dhash(spark, sf_dir).collect()}
    assert f0 == img and len(f0) > 0


def test_planted_video_twins_captured(spark, sf_dir):
    """Every planted (base, twin) pair must appear: byte-exact even
    twins at total hamming 0, bumped odd twins within the per-frame
    budget."""
    qualifying = {r.asset_id
                  for r in video.video_frame_sample(spark, sf_dir)
                  .select("asset_id").distinct().collect()}
    pairs = {(r.asset_a, r.asset_b): r
             for r in video.video_near_dups(spark, sf_dir).collect()}
    planted = [a for a in qualifying if a < video.VID_PLANT_N]
    assert planted, "fixture must include plantable assets"
    for a in planted:
        key = (a, a + video.VID_PLANT_OFFSET)
        assert key in pairs, key
        r = pairs[key]
        if a % 2 == 0:
            assert r.total_hamming == 0 and r.max_frame_hamming == 0
        else:
            assert r.max_frame_hamming <= 2
