"""MPEG audio (MP3) frame-stream codec — pure integer header work.

Closes the LAST multimodal stub: what a 100 TB audio-curation pass
reads from an MP3 is the FRAME WALK — per-frame 4-byte headers carry
version/layer/bitrate/samplerate, each frame's byte length is the
closed-form ``144 * bitrate / samplerate + padding`` (MPEG-1 Layer
III), and duration is ``n_frames * 1152 / samplerate``.  That walk is
pure integer arithmetic, implemented here for real:

- ``encode_mp3`` emits a GENUINE MPEG-1 Layer III frame sequence
  (valid sync + header fields from the ISO/IEC 11172-3 tables,
  optional ID3v2.4 prefix with syncsafe size) whose frame bodies are
  declared fill bytes — container-level truth, the level this codec
  claims (psychoacoustic MDCT sample reconstruction genuinely needs a
  DSP library absent from this container).
- ``parse_mp3_meta`` walks it back: skips ID3v2, validates sync /
  version / layer per frame, decodes bitrate & samplerate indices
  through the real tables, advances by each frame's computed length,
  and accumulates frame count + stream bytes.

Reference parity anchor: the reference's 327-line Rust core has no
codec surface; this implements the multimodal mandate of the builder
brief / SURVEY.md §2.5.
"""

from __future__ import annotations

# ISO/IEC 11172-3 Table B.2: MPEG-1 Layer III bitrates (kbps), index
# 1..14 (0 = free, 15 = forbidden).
BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320)
# Sampling-rate index for MPEG-1: 0 -> 44100, 1 -> 48000, 2 -> 32000.
RATES_V1 = (44100, 48000, 32000)
SAMPLES_PER_FRAME_V1L3 = 1152


def frame_length(bitrate_kbps: int, rate: int, padding: int = 0) -> int:
    """MPEG-1 Layer III frame byte length (11172-3 §2.4.3.1)."""
    return (144 * bitrate_kbps * 1000) // rate + padding


def _syncsafe(n: int) -> bytes:
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _unsyncsafe(b: bytes) -> int:
    v = 0
    for x in b:
        v = (v << 7) | (x & 0x7F)
    return v


def encode_mp3(bitrate_idx: int, rate_idx: int, n_frames: int,
               fill: int = 0x55, id3_pad: int = 0) -> bytes:
    """A genuine MPEG-1 Layer III stream: ``n_frames`` frames at the
    table bitrate/samplerate, mono, no CRC, no padding bit — every
    frame is the same ``floor(144 * bitrate / rate)`` bytes, the same
    closed form the parser advances by, so the round trip is exact for
    any table pair.  ``id3_pad > 0`` prefixes an ID3v2.4 tag of
    that many payload bytes (syncsafe-sized), which real streams carry
    and the parser must skip."""
    if not 1 <= bitrate_idx <= 14:
        raise ValueError("bitrate index must be 1..14")
    if not 0 <= rate_idx <= 2:
        raise ValueError("samplerate index must be 0..2")
    bitrate = BITRATES_V1L3[bitrate_idx]
    rate = RATES_V1[rate_idx]
    flen = frame_length(bitrate, rate)
    # header: sync 0xFFE | version 11 (MPEG-1) | layer 01 (III) |
    # no-CRC 1 -> bytes FF FB; byte2 = bitrate_idx<<4 | rate_idx<<2 |
    # padding<<1 | private; byte3 = mono (11<<6) | original (1<<2).
    hdr = bytes((0xFF, 0xFB,
                 (bitrate_idx << 4) | (rate_idx << 2),
                 (0b11 << 6) | (1 << 2)))
    frame = hdr + bytes([fill]) * (flen - 4)
    out = bytearray()
    if id3_pad > 0:
        out += b"ID3" + bytes((4, 0, 0)) + _syncsafe(id3_pad)
        out += bytes(id3_pad)
    out += frame * n_frames
    return bytes(out)


def parse_mp3_meta(payload: bytes) -> dict:
    """Frame-walk metadata: skip any ID3v2 tag, then validate and count
    MPEG-1 Layer III frames.  Returns sample rate, first-frame bitrate
    (kbps), frame count, total frame bytes, total PCM samples, and
    whether an ID3 tag was present.  Raises ValueError on malformed
    streams and NotImplementedError for MPEG-2/2.5 or Layers I/II
    (different side-info/frame-size tables — out of claimed scope)."""
    pos, has_id3 = 0, False
    if payload[:3] == b"ID3":
        has_id3 = True
        pos = 10 + _unsyncsafe(payload[6:10])
        if payload[5] & 0x10:  # footer-present flag
            pos += 10
    rate = bitrate = None
    n_frames = stream_bytes = 0
    while pos + 4 <= len(payload):
        b0, b1, b2, _b3 = payload[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at byte {pos}")
        version = (b1 >> 3) & 0x3
        layer = (b1 >> 1) & 0x3
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG-1 Layer III frame walking is implemented; "
                "other versions/layers use different side-info tables"
            )
        bidx = (b2 >> 4) & 0xF
        ridx = (b2 >> 2) & 0x3
        if bidx in (0, 15) or ridx == 3:
            raise ValueError("free/forbidden bitrate or bad rate index")
        f_rate = RATES_V1[ridx]
        f_bitrate = BITRATES_V1L3[bidx]
        if rate is None:
            rate, bitrate = f_rate, f_bitrate
        flen = frame_length(f_bitrate, f_rate, (b2 >> 1) & 0x1)
        if pos + flen > len(payload):
            raise ValueError("truncated final MP3 frame")
        n_frames += 1
        stream_bytes += flen
        pos += flen
    if rate is None:
        raise ValueError("no MP3 frames found")
    return {
        "sample_rate": rate, "bitrate_kbps": bitrate,
        "n_frames": n_frames, "stream_bytes": stream_bytes,
        "n_samples": n_frames * SAMPLES_PER_FRAME_V1L3,
        "has_id3": has_id3,
    }
