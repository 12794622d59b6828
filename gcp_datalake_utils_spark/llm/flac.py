"""Baseline FLAC codec (round 13) — REAL encoder + decoder in
stdlib + numpy, the lossless-audio sibling of llm/jpeg.py: after this
module, `decode_media`'s stub covers only formats that genuinely need
external codec libraries (MP4/H.264 video, MP3 perceptual audio).

Scope (the encoder's emitted subset; the decoder handles the same and
REJECTS the rest with a clear message, the parse_jpeg convention):
mono, 16-bit, fixed-blocksize streams; CONSTANT, VERBATIM and FIXED
(orders 0-4) subframes; Rice residual coding (partition order 0).
Everything is from the public format spec (RFC 9639 / the original
xiph.org format document): the 14-bit frame sync, UTF-8-style coded
frame numbers, CRC-8 (poly 0x07) frame-header checksum, CRC-16 (poly
0x8005) whole-frame checksum, zigzag Rice residuals, and the
STREAMINFO MD5 of the unencoded samples — which makes every decode
END-TO-END SELF-VERIFYING: parse_flac recomputes the MD5 of what it
decoded and raises on mismatch, so a wrong predictor/Rice/bit-reader
path cannot return silently corrupt audio.

Unlike JPEG, FLAC is LOSSLESS — the pytest contract is exact sample
round-trip equality, not an error envelope.

Reference parity note: the reference repo (bigquery-to-erd) has no
media handling at all; this module extends the multimodal family
(SURVEY.md north-star extensions), reusing the WAV row's generative
sample formula so the feature oracle stays SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FLAC_BLOCK = 4096          # encoder blocksize (last frame partial)
FLAC_SAMPLE_RATE = 8000    # matches the WAV row's rate

# fixed-predictor coefficients per order: residual = s[i] - sum(
# coef[j] * s[i-1-j]); decoder integrates the same recurrence
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc_tables() -> tuple[list[int], list[int]]:
    t8, t16 = [], []
    for byte in range(256):
        crc = byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
        t8.append(crc)
        crc = byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
        t16.append(crc)
    return t8, t16


# 256-entry tables derived once from the same bitwise recurrences the
# per-bit loops ran (standard table-driven CRC; 8x fewer Python ops)
_CRC8_T, _CRC16_T = _crc_tables()


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the FLAC frame-header
    checksum."""
    crc = 0
    t = _CRC8_T
    for byte in data:
        crc = t[crc ^ byte]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the FLAC
    whole-frame checksum."""
    crc = 0
    t = _CRC16_T
    for byte in data:
        crc = ((crc << 8) & 0xFF00) ^ t[(crc >> 8) ^ byte]
    return crc


def _utf8_code(n: int) -> bytes:
    """The UTF-8-style variable-length coding FLAC uses for frame
    numbers (plain UTF-8 for < 2^31, which covers any frame index this
    encoder emits)."""
    if n < 0x80:
        return bytes([n])
    out, bits = [], []
    while True:
        bits.append(n & 0x3F)
        n >>= 6
        # leading-byte capacity shrinks by 1 bit per continuation byte
        if n < (0x40 >> len(bits)):
            break
    out.append((0xFF ^ (0xFF >> (len(bits) + 1))) | n)
    out.extend(0x80 | b for b in reversed(bits))
    return bytes(out)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        if bits:
            self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
            self.n += bits
            while self.n >= 8:
                self.n -= 8
                self.buf.append((self.acc >> self.n) & 0xFF)
        # keep the accumulator small
        self.acc &= (1 << self.n) - 1

    def write_unary(self, q: int) -> None:
        # q zero bits then a 1 (the FLAC unary convention)
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_bit_array(self, bits) -> None:
        """Append an MSB-first 0/1 uint8 numpy array in bulk: flush
        the sub-byte accumulator into the array, np.packbits the
        byte-aligned prefix, keep the remainder in the accumulator.
        Emits exactly the bits the write()/write_unary() loop would."""
        import numpy as np
        if self.n:
            pre = np.empty(self.n, dtype=np.uint8)
            for i in range(self.n):
                pre[i] = (self.acc >> (self.n - 1 - i)) & 1
            bits = np.concatenate([pre, bits])
            self.acc = 0
            self.n = 0
        n8 = (len(bits) // 8) * 8
        if n8:
            self.buf += np.packbits(bits[:n8]).tobytes()
        for v in bits[n8:]:
            self.acc = (self.acc << 1) | int(v)
            self.n += 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.d):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.d[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_unary(self) -> int:
        # O(1) per code: refill byte-wise until a set bit exists, then
        # the leading-zero count is n - bit_length(acc) — identical
        # consumption to the bit-at-a-time loop
        while self.acc == 0:
            if self.pos >= len(self.d):
                raise ValueError("truncated FLAC bitstream")
            if self.n > 1 << 20:
                raise ValueError("runaway unary code (corrupt Rice "
                                 "parameter?)")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.n += 8
        bl = self.acc.bit_length()
        q = self.n - bl
        self.n = bl - 1
        self.acc &= (1 << self.n) - 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _rice_param(zz) -> int:
    """Smallest k with mean(zigzag) < 2^k (capped at 14 < the 4-bit
    escape code 15) — any deterministic choice decodes identically;
    this one keeps expected quotients ~1 bit."""
    import numpy as np
    if not len(zz):
        return 0
    mean = float(np.mean(zz))
    k = 0
    while (1 << k) < mean and k < 14:
        k += 1
    return k


def _encode_frame(w: "_BitWriter", frame_idx: int, block,
                  rate: int) -> None:
    import numpy as np
    n = len(block)
    hdr = bytearray()
    # sync(14)=0x3FFE, reserved(1)=0, blocking strategy(1)=0 (fixed):
    # 0xFFF8; blocksize code 0b0111 (16-bit blocksize-1 at header
    # end), sample-rate code 0b0000 (from STREAMINFO)
    hdr += b"\xff\xf8\x70"
    # channel assignment 0b0000 (mono), sample size 0b100 (16 bit),
    # reserved(1)=0
    hdr.append(0x08)
    hdr += _utf8_code(frame_idx)
    hdr += bytes([(n - 1) >> 8, (n - 1) & 0xFF])
    hdr.append(_crc8(bytes(hdr)))
    for byte in hdr:
        w.write(byte, 8)

    x = block.astype(np.int64)
    if n and bool((x == x[0]).all()):
        # CONSTANT subframe: header 0b000000, one 16-bit value
        w.write(0b0_000000_0, 8)
        w.write(int(x[0]) & 0xFFFF, 16)
        return
    # pick the cheapest subframe by EXACT coded size: for each fixed
    # order, Rice bits = sum(q) + len*(1+k) (computable without
    # emitting), plus 16-bit warm-ups; compare against verbatim
    best = None                            # (bits, order, zz, k)
    for order, coefs in _FIXED_COEFS.items():
        if order >= n:
            continue
        res = x[order:].copy()
        for j, c in enumerate(coefs):
            res -= c * x[order - 1 - j:n - 1 - j]
        zz = np.where(res >= 0, res << 1, (-res << 1) - 1)
        k = _rice_param(zz)
        bits = (order * 16 + 2 + 4 + 4
                + int((zz >> k).sum()) + len(zz) * (1 + k))
        if best is None or bits < best[0]:
            best = (bits, order, zz, k)
    if best is None or best[0] >= n * 16:
        # VERBATIM subframe: header 0b000001, raw 16-bit samples
        w.write(0b0_000001_0, 8)
        xv = x & 0xFFFF
        vb = np.empty((n, 16), dtype=np.uint8)
        for j in range(16):
            vb[:, j] = (xv >> (15 - j)) & 1
        w.write_bit_array(vb.ravel())
        return
    _bits, order, zz, k = best
    # FIXED subframe: header 0b001000 | order
    w.write((0b001000 | order) << 1, 8)
    for v in x[:order]:                    # warm-up, raw 16-bit
        w.write(int(v) & 0xFFFF, 16)
    w.write(0b00, 2)                       # residual method: 4-bit Rice
    w.write(0, 4)                          # partition order 0
    w.write(k, 4)                          # Rice parameter
    # Rice residuals as one vectorized bit array: unary(q) + 1 + the
    # k low bits per code — bit-for-bit the write_unary/write loop
    q = (zz >> k).astype(np.int64)
    lens = q + 1 + k
    starts = np.zeros(len(zz), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = int(starts[-1] + lens[-1]) if len(zz) else 0
    bits = np.zeros(total, dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    for j in range(k):
        bits[term + 1 + j] = (zz >> (k - 1 - j)) & 1
    w.write_bit_array(bits)


def build_flac(samples, rate: int = FLAC_SAMPLE_RATE) -> bytes:
    """Genuine FLAC bytes for mono 16-bit samples: fLaC magic +
    STREAMINFO (incl. the spec's MD5 of the unencoded samples) +
    fixed-blocksize frames with per-frame CRC-8/CRC-16."""
    import hashlib

    import numpy as np
    x = np.asarray(samples, dtype="<i2")
    n = len(x)
    md5 = hashlib.md5(x.tobytes()).digest()

    info = _BitWriter()
    info.write(FLAC_BLOCK, 16)             # min blocksize
    info.write(FLAC_BLOCK, 16)             # max blocksize
    info.write(0, 24)                      # min framesize unknown
    info.write(0, 24)                      # max framesize unknown
    info.write(rate, 20)
    info.write(0, 3)                       # channels - 1
    info.write(15, 5)                      # bits per sample - 1
    info.write(n, 36)
    info.align()
    body = info.bytes() + md5
    assert len(body) == 34
    out = bytearray(b"fLaC")
    out.append(0x80)                       # last-block flag | type 0
    out += (34).to_bytes(3, "big")
    out += body

    for i in range(0, n, FLAC_BLOCK):
        w = _BitWriter()
        _encode_frame(w, i // FLAC_BLOCK, x[i:i + FLAC_BLOCK], rate)
        w.align()
        frame = w.bytes()
        out += frame
        out += _crc16(frame).to_bytes(2, "big")
    return bytes(out)


def _decode_frame(br: "_BitReader", streaminfo) -> "object":
    import numpy as np
    hdr_start = br.pos
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("bad frame sync")
    if br.read(1):
        raise ValueError("reserved frame-header bit set")
    br.read(1)                             # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    br.read(1)                             # reserved
    if ch_code != 0:
        raise ValueError("demo decoder handles mono FLAC")
    if ss_code != 0b100:
        raise ValueError("demo decoder handles 16-bit FLAC")
    # UTF-8-coded frame number
    lead = br.read(8)
    if lead < 0x80:
        pass
    else:
        extra = 0
        probe = lead
        while probe & 0x40:
            extra += 1
            probe = (probe << 1) & 0xFF
        if not extra or extra > 6:
            raise ValueError("bad UTF-8 frame number")
        for _ in range(extra):
            if br.read(8) & 0xC0 != 0x80:
                raise ValueError("bad UTF-8 continuation")
    if bs_code == 0b0111:
        n = br.read(16) + 1
    elif bs_code == 0b0110:
        n = br.read(8) + 1
    elif bs_code == 0b0001:
        n = 192
    elif 0b0010 <= bs_code <= 0b0101:
        n = 576 << (bs_code - 2)
    elif bs_code >= 0b1000:
        n = 256 << (bs_code - 8)
    else:
        raise ValueError("reserved blocksize code 0b0000")
    if sr_code in (0b1100, 0b1101, 0b1110):   # coded at header end
        br.read(8 if sr_code == 0b1100 else 16)
    elif sr_code == 0b1111:
        raise ValueError("invalid sample-rate code")
    crc_expect = br.read(8)
    if _crc8(br.d[hdr_start:br.pos - 1]) != crc_expect:
        raise ValueError("frame-header CRC-8 mismatch")

    # subframe header
    if br.read(1):
        raise ValueError("reserved subframe-header bit set")
    stype = br.read(6)
    if br.read(1):
        raise ValueError("wasted-bits not supported by the demo "
                         "decoder")
    if stype == 0b000000:                  # CONSTANT
        v = br.read(16)
        v = v - 0x10000 if v & 0x8000 else v
        out = np.full(n, v, dtype=np.int64)
    elif stype == 0b000001:                # VERBATIM
        out = np.array([br.read(16) for _ in range(n)], dtype=np.int64)
        out[out >= 0x8000] -= 0x10000
    elif 0b001000 <= stype <= 0b001100:    # FIXED order 0-4
        order = stype & 0x07
        warm = [br.read(16) for _ in range(order)]
        warm = [v - 0x10000 if v & 0x8000 else v for v in warm]
        method = br.read(2)
        if method != 0b00:
            raise ValueError("only 4-bit Rice residuals supported")
        part_order = br.read(4)
        res: list[int] = []
        ap = res.append
        ru = br.read_unary
        rd = br.read
        n_parts = 1 << part_order
        for p in range(n_parts):
            k = rd(4)
            if k == 0b1111:
                raise ValueError("Rice escape codes not emitted by "
                                 "this encoder")
            count = (n >> part_order) - (order if p == 0 else 0)
            for _ in range(count):
                u = (ru() << k) | rd(k)
                ap((u >> 1) if u % 2 == 0 else -((u + 1) >> 1))
        # the fixed predictor of order m is the m-fold finite
        # difference, so reconstruction is m cumulative sums, each
        # seeded with the warm-up samples' highest-order differences —
        # the same recurrence the per-sample loop integrated, run as
        # numpy cumsums (sample-exact; the MD5 self-check below and
        # the round-trip pytests gate it)
        out = np.empty(n, dtype=np.int64)
        out[:order] = warm
        if order == 0:
            out = np.array(res, dtype=np.int64)
        else:
            wa = np.array(warm, dtype=np.int64)
            seeds = []
            d = wa
            for _m in range(order):
                seeds.append(int(d[-1]) if len(d) else 0)
                d = np.diff(d)
            cur = np.array(res, dtype=np.int64)
            for m in range(order - 1, -1, -1):
                cur = np.cumsum(
                    np.concatenate(([seeds[m]], cur)))[1:]
            out[order:] = cur
    elif stype >= 0b100000:
        raise ValueError("LPC subframes not emitted by this encoder "
                         "(fixed predictors only)")
    else:
        raise ValueError(f"reserved subframe type {stype:06b}")
    br.align()
    crc16_expect = (br.d[br.pos] << 8) | br.d[br.pos + 1] \
        if br.pos + 2 <= len(br.d) else None
    if crc16_expect is None:
        raise ValueError("truncated frame footer")
    if _crc16(br.d[hdr_start:br.pos]) != crc16_expect:
        raise ValueError("frame CRC-16 mismatch")
    br.pos += 2
    return out


def parse_flac(b: bytes):
    """Real FLAC decoder -> (rate, n_channels, bits, int16 samples).
    Verifies the magic, STREAMINFO layout, per-frame CRC-8/CRC-16 and
    finally the STREAMINFO MD5 against the DECODED samples — an
    end-to-end proof the predictor/Rice/bit paths reconstructed the
    exact original audio."""
    import hashlib

    import numpy as np
    if len(b) < 4 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(b):
            raise ValueError("truncated metadata block header")
        last = bool(b[pos] & 0x80)
        btype = b[pos] & 0x7F
        size = int.from_bytes(b[pos + 1:pos + 4], "big")
        body = b[pos + 4:pos + 4 + size]
        if len(body) != size:
            raise ValueError("truncated metadata block")
        if btype == 0:
            if size != 34:
                raise ValueError("bad STREAMINFO size")
            br = _BitReader(body)
            br.read(16)                     # min blocksize
            br.read(16)                     # max blocksize
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bits = br.read(5) + 1
            total = br.read(36)
            md5 = body[18:34]
            streaminfo = (rate, ch, bits, total, md5)
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    rate, ch, bits, total, md5 = streaminfo
    if ch != 1 or bits != 16:
        raise ValueError("demo decoder handles mono 16-bit FLAC")

    br = _BitReader(b, pos)
    chunks = []
    got = 0
    while got < total:
        frame = _decode_frame(br, streaminfo)
        chunks.append(frame)
        got += len(frame)
    if got != total:
        raise ValueError("frame samples exceed STREAMINFO total")
    out = (np.concatenate(chunks) if chunks
           else np.empty(0, dtype=np.int64))
    if (out > 32767).any() or (out < -32768).any():
        raise ValueError("decoded sample out of int16 range")
    samples = out.astype("<i2")
    if hashlib.md5(samples.tobytes()).digest() != md5:
        raise ValueError("decoded-audio MD5 does not match STREAMINFO")
    return rate, ch, bits, samples


# --- the [Q] row --------------------------------------------------------------

_FLAC_FEATURES_SCHEMA = (
    "asset_id long, sample_rate int, n_samples long, n_frames int, "
    "duration_ms double, rms double, zcr double")


def flac_decode_features(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """[Q] encode -> REAL DECODE -> featurize through Arrow kernels:
    the WAV row's generative samples ((byte - 80) * 256) round-tripped
    through genuine FLAC frames. Features come from the DECODED
    samples (plus the MD5 self-check inside parse_flac), so a
    predictor, Rice, CRC or framing defect is a hash mismatch. The
    oracle re-derives every column from the generative formula —
    n_frames = ceil(n / FLAC_BLOCK) gates the framing itself."""
    import numpy as np

    from gcp_datalake_utils_spark.llm.multimodal import (
        _WAV_CENTER,
        binary_assets,
        fan_out,
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) \
            -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, nf, durs, rmss, zcrs = \
                [], [], [], [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = (np.frombuffer(bytes(payload), dtype=np.uint8)
                       .astype(np.int16) - _WAV_CENTER) * 256
                rate, _ch, _bits, s = parse_flac(build_flac(raw))
                n = len(s)
                x = s.astype(np.float64)
                ids.append(aid)
                rates.append(rate)
                ns.append(n)
                nf.append(-(-n // FLAC_BLOCK))
                # raw doubles; rounded JVM-side below (F.round is
                # HALF_UP like DuckDB; Python round() banker's-rounds
                # the zcr ties — the wav row's sf0.1 lesson)
                durs.append(n * 1000.0 / rate)
                rmss.append(float(np.sqrt((x * x).mean()))
                            if n else 0.0)
                nz = ((s[1:] >= 0) != (s[:-1] >= 0)).sum() \
                    if n > 1 else 0
                zcrs.append(float(nz) / (n - 1) if n > 1 else 0.0)
            yield pd.DataFrame({
                "asset_id": ids,
                "sample_rate": pd.Series(rates, dtype="int32"),
                "n_samples": pd.Series(ns, dtype="int64"),
                "n_frames": pd.Series(nf, dtype="int32"),
                "duration_ms": durs, "rms": rmss, "zcr": zcrs})

    out = (fan_out(binary_assets(spark, sf_dir), "asset_id", "payload")
           .mapInPandas(_roundtrip, _FLAC_FEATURES_SCHEMA))
    return out.select(
        "asset_id", "sample_rate", "n_samples", "n_frames",
        F.round("duration_ms", 6).alias("duration_ms"),
        F.round("rms", 6).alias("rms"),
        F.round("zcr", 6).alias("zcr"))


def _flac_oracle() -> str:
    from gcp_datalake_utils_spark.llm.multimodal import _WAV_CENTER
    return f"""
WITH s AS (
  SELECT doc_id AS asset_id,
         list_transform(range(1, length(text) + 1),
           j -> (ascii(substr(text, CAST(j AS INTEGER), 1))
                 - {_WAV_CENTER}) * 256) AS smp
  FROM documents
)
SELECT asset_id,
       {FLAC_SAMPLE_RATE} AS sample_rate,
       CAST(len(smp) AS BIGINT) AS n_samples,
       CAST((len(smp) + {FLAC_BLOCK} - 1) // {FLAC_BLOCK} AS INTEGER)
         AS n_frames,
       round(len(smp) * 1000.0 / {FLAC_SAMPLE_RATE}, 6) AS duration_ms,
       CASE WHEN len(smp) > 0
            THEN round(sqrt(list_sum(list_transform(smp,
                 x -> CAST(x AS DOUBLE) * x)) / len(smp)), 6)
            ELSE 0.0 END AS rms,
       CASE WHEN len(smp) > 1
            THEN round(len(list_filter(range(2, len(smp) + 1),
                 j -> (smp[CAST(j AS INTEGER)] >= 0)
                      <> (smp[CAST(j AS INTEGER) - 1] >= 0)))
                 / CAST(len(smp) - 1 AS DOUBLE), 6)
            ELSE 0.0 END AS zcr
FROM s
"""


FLAC_DECODE_FEATURES_ORACLE = _flac_oracle()
