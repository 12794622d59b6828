"""MP4 (ISO BMFF) container codec (round 13) — a REAL box-structure
builder + parser in stdlib only, completing the multimodal family's
honest split between CONTAINER work (doable from the public spec,
ISO/IEC 14496-12) and CODEC-PAYLOAD work (H.264/AAC entropy decode,
which genuinely needs external libraries and stays stubbed in
`decode_media`).

What's real here: the full nested box grammar (size + fourcc,
including 64-bit largesize boxes and unknown-box skipping), a
spec-shaped tree — ftyp, mdat, moov(mvhd, trak(tkhd, mdia(mdhd with
packed ISO-639 language, hdlr, minf(smhd/vmhd, dinf(dref(url)),
stbl(stsd, stts, stsz, stco))))) — with correct sizes, version/flags
fields, and the mvhd/mdhd timescale/duration arithmetic. The parser
is a real recursive walker that validates structure and raises on
malformed input (truncated/undersized boxes, missing mvhd, bad
largesize) instead of guessing.

What's NOT claimed here: decoding the mdat payload behind the stub
'mp4v'/'mp4a' sample entry (H.264/AAC entropy decode —
decode_media's documented contract). llm/video.py plugs in at
exactly that boundary with a REAL framed track: variable-size
stsz/stsc/stco sample tables and losslessly-decodable PNG frames,
so the container-to-pixels path is exercised end-to-end without
claiming the perceptual codecs.

The [Q] row (mp4_metadata) is the table a 100 TB video-corpus
pipeline actually builds FIRST: per-asset container metadata
(duration, track handler, language, sample count) extracted by a
zero-exchange Arrow scan — partition pruning and corpus triage run
on this table long before any codec touches pixels.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MP4_TIMESCALE = 1000      # mvhd/mdhd timescale: duration units = ms
MP4_SAMPLE_DELTA = 40     # per-sample duration (25 fps / 25 Hz)

# doc lang -> ISO-639-2/T code packed into mdhd (5 bits per letter)
_LANG_639 = {"en": "eng", "de": "deu", "fr": "fra", "zh": "zho",
             "he": "heb"}


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), fourcc) + payload


def _full(fourcc: bytes, version: int, flags: int,
          payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version,
                                    flags.to_bytes(3, "big")) + payload)


def _pack_lang(code: str) -> int:
    a, b, c = (ord(ch) - 0x60 for ch in code)
    return (a << 10) | (b << 5) | c


def _unpack_lang(v: int) -> str:
    return "".join(chr(0x60 + ((v >> s) & 0x1F)) for s in (10, 5, 0))


def build_mp4(payload: bytes, lang: str = "en",
              handler: str = "soun") -> bytes:
    """A spec-valid minimal ISO BMFF file: ftyp + mdat(payload) +
    moov with one track whose sample table declares len(payload)
    one-byte samples at MP4_SAMPLE_DELTA ticks each. The payload is
    OPAQUE (stub codec sample entry) — the container structure is the
    real part."""
    n = len(payload)
    duration = n * MP4_SAMPLE_DELTA
    lang_code = _LANG_639.get(lang, "und")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512)
                + b"isomiso2mp41")
    mdat = _box(b"mdat", payload)

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, MP4_TIMESCALE, duration)
        + struct.pack(">i", 0x00010000)     # rate 1.0
        + struct.pack(">h", 0x0100)         # volume 1.0
        + b"\x00" * 10                      # reserved
        + _UNITY_MATRIX
        + b"\x00" * 24                      # pre_defined
        + struct.pack(">I", 2))             # next_track_ID

    tkhd = _full(b"tkhd", 0, 0x000007, struct.pack(
        ">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8                       # reserved
        + struct.pack(">hhhh", 0, 0, 0x0100, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", 0, 0))         # width, height (16.16)

    mdhd = _full(b"mdhd", 0, 0, struct.pack(
        ">IIIIHH", 0, 0, MP4_TIMESCALE, duration,
        _pack_lang(lang_code), 0))

    hname = b"SoundHandler\x00" if handler == "soun" \
        else b"VideoHandler\x00"
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I4s", 0,
                                            handler.encode())
                 + b"\x00" * 12 + hname)

    # stub sample entry: generic box with 6 reserved bytes + a
    # data-reference index — the codec config a real avcC/esds would
    # carry is exactly what stays out of scope
    entry_cc = b"mp4a" if handler == "soun" else b"mp4v"
    entry = _box(entry_cc, b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1 if n else 0, n,
                                            MP4_SAMPLE_DELTA)
                 if n else struct.pack(">I", 0))
    stsz = _full(b"stsz", 0, 0, struct.pack(">III", 1, n, 0))
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, len(ftyp) + 8)
                 if n else struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsz + stco)

    mhd = _full(b"smhd", 0, 0, struct.pack(">hh", 0, 0)) \
        if handler == "soun" \
        else _full(b"vmhd", 0, 1, struct.pack(">Hhhh", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", mhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0,
                            0, 0x00010000, 0,
                            0, 0, 0x40000000)


def _walk(b: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [start, end), validating sizes; supports size==1 (64-bit
    largesize) and size==0 (box extends to end)."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size, cc = struct.unpack_from(">I4s", b, pos)
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
            if size < 16:
                raise ValueError("bad largesize")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise ValueError(f"bad box size {size}")
        if pos + size > end:
            raise ValueError(f"box {cc!r} overruns container")
        yield cc, body, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, fourcc: bytes):
    for cc, s, e in _walk(b, start, end):
        if cc == fourcc:
            return s, e
    return None


def parse_mp4(b: bytes) -> dict:
    """Real ISO BMFF walk -> container metadata dict: major_brand,
    timescale, duration_ms, n_tracks, and per first track (handler,
    language, sample_count, mdat_len). Raises on structural damage;
    skips unknown boxes (the spec's forward-compat rule). The mdat
    payload is returned OPAQUE (codec decode is out of scope —
    decode_media's documented boundary)."""
    ft = _find(b, 0, len(b), b"ftyp")
    if ft is None or b[:8][4:] != b"ftyp":
        raise ValueError("not an ISO BMFF file (ftyp must be first)")
    major = b[ft[0]:ft[0] + 4].decode("latin1")

    mv = _find(b, 0, len(b), b"moov")
    if mv is None:
        raise ValueError("missing moov box")
    mvhd = _find(b, mv[0], mv[1], b"mvhd")
    if mvhd is None:
        raise ValueError("missing mvhd box")
    ver = b[mvhd[0]]
    if ver == 0:
        _c, _m, timescale, duration = struct.unpack_from(
            ">IIII", b, mvhd[0] + 4)
    elif ver == 1:
        _c, _m, timescale, duration = struct.unpack_from(
            ">QQIQ", b, mvhd[0] + 4)
    else:
        raise ValueError(f"unknown mvhd version {ver}")
    if not timescale:
        raise ValueError("zero mvhd timescale")

    traks = [(s, e) for cc, s, e in _walk(b, mv[0], mv[1])
             if cc == b"trak"]
    handler = language = None
    sample_count = None
    if traks:
        t0, t1 = traks[0]
        mdia = _find(b, t0, t1, b"mdia")
        if mdia is None:
            raise ValueError("trak without mdia")
        mdhd = _find(b, mdia[0], mdia[1], b"mdhd")
        if mdhd is not None:
            off = mdhd[0] + 4 + (8 + 8 + 4 + 8 if b[mdhd[0]] == 1
                                 else 4 + 4 + 4 + 4)
            (lang_bits,) = struct.unpack_from(">H", b, off)
            language = _unpack_lang(lang_bits & 0x7FFF)
        hd = _find(b, mdia[0], mdia[1], b"hdlr")
        if hd is not None:
            handler = b[hd[0] + 8:hd[0] + 12].decode("latin1")
        minf = _find(b, mdia[0], mdia[1], b"minf")
        if minf is not None:
            stbl = _find(b, minf[0], minf[1], b"stbl")
            if stbl is not None:
                stsz = _find(b, stbl[0], stbl[1], b"stsz")
                if stsz is not None:
                    # body: version/flags(4), sample_size(4), count(4)
                    _ss, cnt = struct.unpack_from(
                        ">II", b, stsz[0] + 4)
                    sample_count = cnt

    mdat = _find(b, 0, len(b), b"mdat")
    mdat_len = (mdat[1] - mdat[0]) if mdat is not None else 0

    return {
        "major_brand": major,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": len(traks),
        "handler": handler,
        "language": language,
        "sample_count": sample_count,
        "mdat_len": mdat_len,
    }


# --- the [Q] row --------------------------------------------------------------

_MP4_META_SCHEMA = (
    "asset_id long, major_brand string, timescale int, "
    "duration_ms long, n_tracks int, handler string, "
    "language string, sample_count long, mdat_len long")


def mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] build -> REAL PARSE -> container metadata, one zero-
    exchange Arrow scan: every column comes from walking the
    assembled box tree back out of the bytes (not from the inputs),
    so a size, nesting, version-field or language-packing defect is a
    hash mismatch. handler alternates soun/vide by n_chars parity so
    both minf header paths (smhd/vmhd) are live."""

    def _kernel(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "asset_id", "major_brand", "timescale", "duration_ms",
                "n_tracks", "handler", "language", "sample_count",
                "mdat_len")}
            for aid, payload, lang in zip(pdf["asset_id"],
                                          pdf["payload"],
                                          pdf["lang"]):
                raw = bytes(payload)
                kind = "soun" if len(raw) % 2 == 0 else "vide"
                meta = parse_mp4(build_mp4(raw, lang=lang,
                                           handler=kind))
                out["asset_id"].append(aid)
                out["major_brand"].append(meta["major_brand"])
                out["timescale"].append(meta["timescale"])
                out["duration_ms"].append(meta["duration_ms"])
                out["n_tracks"].append(meta["n_tracks"])
                out["handler"].append(meta["handler"])
                out["language"].append(meta["language"])
                out["sample_count"].append(meta["sample_count"])
                out["mdat_len"].append(meta["mdat_len"])
            pdf_out = pd.DataFrame(out)
            pdf_out["timescale"] = pdf_out["timescale"].astype("int32")
            pdf_out["n_tracks"] = pdf_out["n_tracks"].astype("int32")
            yield pdf_out

    from gcp_datalake_utils_spark.llm.multimodal import (
        binary_assets,
        fan_out,
    )
    assets = binary_assets(spark, sf_dir)
    sel = assets.select("asset_id", "payload",
                        assets["meta.lang"].alias("lang"))
    return fan_out(sel).mapInPandas(_kernel, _MP4_META_SCHEMA)


_LANG_CASE = " ".join(
    f"WHEN lang = '{k}' THEN '{v}'" for k, v in _LANG_639.items())

MP4_METADATA_ORACLE = f"""
SELECT doc_id AS asset_id,
       'isom' AS major_brand,
       CAST({MP4_TIMESCALE} AS INTEGER) AS timescale,
       CAST(length(text) AS BIGINT) * {MP4_SAMPLE_DELTA}
         * 1000 // {MP4_TIMESCALE} AS duration_ms,
       CAST(1 AS INTEGER) AS n_tracks,
       CASE WHEN length(text) % 2 = 0 THEN 'soun' ELSE 'vide' END
         AS handler,
       CASE {_LANG_CASE} ELSE 'und' END AS language,
       CAST(length(text) AS BIGINT) AS sample_count,
       CAST(length(text) AS BIGINT) AS mdat_len
FROM documents
"""
