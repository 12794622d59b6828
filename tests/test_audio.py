"""Audio fingerprinting (llm/audio.py): WHT sanity, hand-computed
landmark check, locality of the planted perturbation, and twin
capture."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.llm import audio
from gcp_datalake_utils_spark.llm.multimodal import _WAV_CENTER


def _hmat():
    return np.array(
        [[1 - 2 * ((k & n).bit_count() & 1)
          for n in range(audio.FRAME_N)] for k in range(audio.FRAME_N)],
        dtype=np.int64)


def test_wht_matrix_is_orthogonal():
    h = _hmat()
    assert (h @ h.T == audio.FRAME_N * np.eye(audio.FRAME_N,
                                              dtype=np.int64)).all()


def test_fingerprint_matches_hand_computed(spark, sf_dir):
    """Pick one real asset and recompute its landmarks from the raw
    text bytes with an independent WHT — catches any framing or
    codec-chain defect."""
    from gcp_datalake_utils_spark.sources import load_table
    doc = (load_table(spark, sf_dir, "documents")
           .where(F.length("text") >= audio.FP_SAMPLES)
           .orderBy("doc_id").first())
    got = {r.frame_idx: (r.dom_bin, r.dom_mag, r.energy)
           for r in audio.audio_fingerprint(spark, sf_dir)
           .where(F.col("asset_id") == doc.doc_id).collect()}
    sm = (np.frombuffer(doc.text.encode()[:audio.FP_SAMPLES],
                        dtype=np.uint8).astype(np.int64)
          - _WAV_CENTER) * 256
    fr = sm.reshape(audio.FP_FRAMES, audio.FRAME_N)
    mag = np.abs(fr @ _hmat().T)
    for f in range(audio.FP_FRAMES):
        dom = int(mag[f, 1:].argmax()) + 1
        assert got[f] == (dom, int(mag[f, dom]),
                          int((fr[f] * fr[f]).sum())), f


def test_planted_audio_twins_captured(spark, sf_dir):
    qualifying = {r.asset_id
                  for r in audio.audio_fingerprint(spark, sf_dir)
                  .select("asset_id").distinct().collect()}
    pairs = {(r.asset_a, r.asset_b): r.matching_frames
             for r in audio.audio_near_dups(spark, sf_dir).collect()}
    planted = [a for a in qualifying if a < audio.AUD_PLANT_N]
    assert planted
    for a in planted:
        key = (a, a + audio.AUD_PLANT_OFFSET)
        assert key in pairs, key
        if a % 2 == 0:
            assert pairs[key] == audio.FP_FRAMES   # byte-exact
        else:
            assert pairs[key] >= audio.FP_FRAMES - 1  # frame-0 only


def test_bump_is_frame_local():
    """The +BUMP perturbation on byte 0 can only move frame 0's
    landmark — every other window reads untouched samples."""
    rng = np.random.default_rng(3)
    by = rng.integers(32, 127, size=audio.FP_SAMPLES).astype(np.uint8)
    h = _hmat()

    def doms(b):
        sm = (b.astype(np.int64) - _WAV_CENTER) * 256
        fr = sm.reshape(audio.FP_FRAMES, audio.FRAME_N)
        mag = np.abs(fr @ h.T)
        return list(mag[:, 1:].argmax(axis=1) + 1)

    base = doms(by)
    bumped = by.copy()
    bumped[0] = (int(bumped[0]) + audio.AUD_PLANT_BUMP) % 256
    after = doms(bumped)
    assert base[1:] == after[1:]
