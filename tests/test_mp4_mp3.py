"""Container-level MP4 / MP3 codec conformance (operators/mp4.py,
operators/mp3.py, r7): ISO BMFF box-walk round trips including 64-bit
largesize and version-1 timed headers, MPEG-1 Layer III frame walks
including ID3v2 skip and malformed-stream rejection, plus the
Spark-side media-table closed forms the declared oracles rely on."""

import struct

import pytest

from duckdb_title_mapper_spark.operators.mp3 import (
    BITRATES_V1L3,
    RATES_V1,
    encode_mp3,
    frame_length,
    parse_mp3_meta,
)
from duckdb_title_mapper_spark.operators.mp4 import (
    _boxes,
    encode_mp4,
    parse_mp4_meta,
)

SF = "/root/testdata/sf0.001"


def test_mp4_roundtrip_all_params():
    for w, h, vc, fps, secs, rate in [
        (640, 360, "avc1", 25, 7, 48000),
        (1920, 1080, "hvc1", 30, 1, 44100),
        (16, 16, "avc1", 24, 30, 48000),
    ]:
        m = parse_mp4_meta(encode_mp4(w, h, vc, fps, secs, rate))
        assert m["timescale"] == 1000
        assert m["duration"] == secs * 1000
        assert m["n_tracks"] == 2
        assert (m["video_codec"], m["width"], m["height"]) == (vc, w, h)
        assert m["v_samples"] == secs * fps
        assert m["audio_codec"] == "mp4a"
        assert m["a_samples"] == secs * (rate // 1024)


def test_mp4_chunk_offsets_are_absolute_and_in_mdat():
    payload = encode_mp4(320, 240, "avc1", 24, 3, 48000)
    # locate mdat body and both stco chunk offsets via an independent walk
    mdat_start = mdat_end = None
    stcos = []

    def walk(pos, end):
        for typ, b0, b1 in _boxes(payload, pos, end):
            if typ == b"mdat":
                nonlocal mdat_start, mdat_end
                mdat_start, mdat_end = b0, b1
            elif typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(b0, b1)
            elif typ == b"stco":
                n = struct.unpack_from(">I", payload, b0 + 4)[0]
                assert n == 1
                stcos.append(struct.unpack_from(">I", payload, b0 + 8)[0])

    walk(0, len(payload))
    assert len(stcos) == 2 and mdat_start is not None
    for off in stcos:
        assert mdat_start <= off < mdat_end
    assert stcos[0] < stcos[1]  # video chunk precedes audio chunk


def test_mp4_largesize_and_version1_headers_parse():
    base = encode_mp4(64, 64, "avc1", 25, 2, 48000)
    # rewrite the top-level mdat as a 64-bit largesize box
    boxes = list(_boxes(base, 0, len(base)))
    typ, b0, b1 = boxes[-1]
    assert typ == b"mdat"
    rebuilt = (
        base[: b0 - 8]
        + struct.pack(">I4sQ", 1, b"mdat", 16 + (b1 - b0))
        + base[b0:b1]
    )
    m = parse_mp4_meta(rebuilt)
    assert m["duration"] == 2000 and m["n_tracks"] == 2
    # version-1 mvhd (64-bit times) through the shared timed-header path
    from duckdb_title_mapper_spark.operators.mp4 import _timed_header

    v1 = struct.pack(">B3s", 1, b"\x00\x00\x00") + struct.pack(
        ">QQIQ", 0, 0, 90000, 123456789
    )
    ts, dur, _ = _timed_header(b"\x00" * 4 + v1, 4)
    assert (ts, dur) == (90000, 123456789)


def test_mp4_malformed_rejected():
    with pytest.raises(ValueError):
        parse_mp4_meta(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError):
        parse_mp4_meta(encode_mp4(64, 64, "avc1", 25, 2, 48000)[:40])
    # a valid ftyp with no moov
    ftyp_only = struct.pack(">I4s", 16, b"ftyp") + b"isom\x00\x00\x02\x00"
    with pytest.raises(ValueError):
        parse_mp4_meta(ftyp_only)


def test_mp3_roundtrip_all_table_pairs():
    for bidx in range(1, 15):
        for ridx in range(3):
            p = encode_mp3(bidx, ridx, 6)
            m = parse_mp3_meta(p)
            assert m["sample_rate"] == RATES_V1[ridx]
            assert m["bitrate_kbps"] == BITRATES_V1L3[bidx]
            assert m["n_frames"] == 6
            assert m["n_samples"] == 6 * 1152
            assert m["stream_bytes"] == len(p) == 6 * frame_length(
                BITRATES_V1L3[bidx], RATES_V1[ridx]
            )
            assert not m["has_id3"]


def test_mp3_id3_skip_and_footer():
    p = encode_mp3(9, 1, 11, id3_pad=200)
    m = parse_mp3_meta(p)
    assert m["has_id3"] and m["n_frames"] == 11
    assert m["stream_bytes"] == len(p) - 210
    # syncsafe size uses 7-bit bytes: force a pad > 127 to prove it
    p2 = encode_mp3(3, 2, 4, id3_pad=1000)
    assert parse_mp3_meta(p2)["n_frames"] == 4


def test_mp3_malformed_rejected():
    with pytest.raises(ValueError):
        parse_mp3_meta(b"\x00" * 16)
    good = encode_mp3(9, 1, 3)
    with pytest.raises(ValueError):
        parse_mp3_meta(good[:-10])  # truncated final frame
    with pytest.raises(ValueError):
        parse_mp3_meta(encode_mp3(9, 1, 0) or b"ID3" + bytes(7))
    bad_rate = bytearray(good)
    bad_rate[2] = (9 << 4) | (3 << 2)  # rate index 3 = reserved
    with pytest.raises(ValueError):
        parse_mp3_meta(bytes(bad_rate))


def test_mp3_non_mpeg1_layer3_is_explicit_gap():
    p = bytearray(encode_mp3(9, 1, 2))
    p[1] = 0xF3  # version bits 10 -> MPEG-2
    with pytest.raises(NotImplementedError):
        parse_mp3_meta(bytes(p))


def test_media_tables_closed_form(spark):
    """The Spark-side mp4/mp3 media tables must produce payloads whose
    PARSED metadata equals the declared md5 closed form — the exact
    invariant the DuckDB oracles assert at query level."""
    import hashlib

    from duckdb_title_mapper_spark.operators.multimodal import (
        extract_mp3_meta,
        extract_mp4_meta,
        mp3_media_table,
        mp4_media_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(40)
    texts = {r.doc_id: r.text for r in docs.collect()}

    mp4 = {
        r.media_id: r.asDict()
        for r in extract_mp4_meta(mp4_media_table(spark, SF)).collect()
    }
    mp3 = {
        r.media_id: r.asDict()
        for r in extract_mp3_meta(mp3_media_table(spark, SF)).collect()
    }
    for did, text in texts.items():
        n, h = len(text), hashlib.md5(text.encode()).digest()
        m4 = mp4[did]
        secs = n % 30 + 1
        assert m4["duration_ms"] == secs * 1000
        assert m4["width"] == (h[2] % 64 + 16) * 2
        assert m4["v_samples"] == secs * (24, 25, 30)[h[1] % 3]
        assert m4["video_codec"] == ("avc1" if did % 2 == 0 else "hvc1")
        m3 = mp3[did]
        rate = 48000 if h[2] % 2 == 0 else 32000
        assert m3["n_frames"] == n % 40 + 5
        assert m3["duration_ms"] == (n % 40 + 5) * 1152 * 1000 // rate
        assert m3["has_id3"] == (did % 2 == 1)
