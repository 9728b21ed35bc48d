"""Structural-level H.264 Annex-B / AAC ADTS codec conformance
(operators/h264.py, operators/aac.py, r8): NAL-walk round trips
including both start-code lengths, emulation-prevention insert/strip,
full Exp-Golomb SPS parses across both profile branches and cropping,
ADTS frame walks including ID3v2 skip and malformed-stream rejection,
plus the Spark-side media-table closed forms the declared oracles
rely on."""

import hashlib
import random

import pytest

from duckdb_title_mapper_spark.operators.aac import (
    PROFILES,
    SAMPLE_RATES,
    encode_adts,
    parse_adts_meta,
)
from duckdb_title_mapper_spark.operators.h264 import (
    _escape_rbsp,
    _unescape_rbsp,
    encode_annexb,
    parse_annexb_meta,
    parse_sps,
)

SF = "/root/testdata/sf0.001"


def test_h264_roundtrip_profiles_dims_census():
    uuid = hashlib.md5(b"sei").digest()
    for w in (32, 48, 66, 158, 1920):
        for h in (18, 34, 88, 1080):
            for prof in (66, 100):
                for n_non in (0, 5, 23):
                    for sei in (None, uuid):
                        m = parse_annexb_meta(encode_annexb(
                            w, h, prof, 41, n_non, sei))
                        assert (m["width"], m["height"]) == (w, h)
                        assert m["profile_idc"] == prof
                        assert m["level_idc"] == 41
                        assert m["n_sps"] == m["n_pps"] == m["n_idr"] == 1
                        assert m["n_nonidr"] == n_non
                        assert m["n_sei"] == (0 if sei is None else 1)
                        assert m["n_nals"] == 3 + n_non + (sei is not None)


def test_h264_epb_roundtrip_fuzz():
    rnd = random.Random(8)
    for _ in range(500):
        raw = bytes(rnd.choice((0, 0, 0, 1, 2, 3, 0x80, 0xFF))
                    for _ in range(rnd.randrange(0, 48)))
        esc = _escape_rbsp(raw)
        assert _unescape_rbsp(esc) == raw
        # no start-code emulation survives escaping
        for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert bad not in esc


def test_h264_zero_fill_slices_parse():
    # all-zero slice payloads are the worst case for start-code
    # emulation; the EPB layer must keep the census exact
    m = parse_annexb_meta(encode_annexb(64, 64, 66, 31, 7, None,
                                        slice_len=40, fill=0x00))
    assert m["n_nonidr"] == 7 and m["n_idr"] == 1


def test_h264_sps_poc_type_arms():
    # hand-build SPS variants exercising pic_order_cnt_type 0 and 1
    from duckdb_title_mapper_spark.operators.h264 import _BitWriter

    for poc in (0, 1):
        w = _BitWriter()
        w.u(66, 8)
        w.u(0, 8)
        w.u(30, 8)
        w.ue(0)          # sps id
        w.ue(0)          # log2_max_frame_num_minus4
        w.ue(poc)
        if poc == 0:
            w.ue(4)      # log2_max_pic_order_cnt_lsb_minus4
        else:
            w.u(0, 1)    # delta_pic_order_always_zero_flag
            w.se(-2)     # offset_for_non_ref_pic
            w.se(3)      # offset_for_top_to_bottom_field
            w.ue(2)      # num_ref_frames_in_pic_order_cnt_cycle
            w.se(1)
            w.se(-1)
        w.ue(1)          # max_num_ref_frames
        w.u(0, 1)
        w.ue(7)          # width mbs - 1 -> 128
        w.ue(5)          # height map units - 1 -> 96
        w.u(1, 1)        # frame_mbs_only
        w.u(1, 1)
        w.u(0, 1)        # no cropping
        w.u(0, 1)        # no vui
        w.rbsp_trailing()
        m = parse_sps(w.to_bytes())
        assert (m["width"], m["height"]) == (128, 96)


def test_h264_malformed_rejected():
    with pytest.raises(ValueError):
        parse_annexb_meta(b"\xff" * 32)  # no start codes
    good = encode_annexb(64, 64, 66, 31, 2, None)
    # stream whose SPS was removed: splice PPS..end only
    second = good.index(b"\x00\x00\x00\x01", 4)
    with pytest.raises(ValueError):
        parse_annexb_meta(good[second:])
    bad = bytearray(good)
    bad[4] |= 0x80  # forbidden_zero_bit on the first NAL header
    with pytest.raises(ValueError):
        parse_annexb_meta(bytes(bad))


def test_h264_scaling_matrix_is_explicit_gap():
    from duckdb_title_mapper_spark.operators.h264 import _BitWriter

    w = _BitWriter()
    w.u(100, 8)
    w.u(0, 8)
    w.u(40, 8)
    w.ue(0)
    w.ue(1)      # chroma_format_idc
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(1, 1)    # seq_scaling_matrix_present_flag
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError):
        parse_sps(w.to_bytes())


def test_adts_roundtrip_all_tables():
    for prof in range(4):
        for fi in range(13):
            for ch in (1, 2, 6, 7):
                p = encode_adts(prof, fi, ch, 5, 111)
                m = parse_adts_meta(p)
                assert m["profile"] == PROFILES[prof]
                assert m["sample_rate"] == SAMPLE_RATES[fi]
                assert m["channels"] == ch
                assert m["n_frames"] == 5
                assert m["n_samples"] == 5 * 1024
                assert m["stream_bytes"] == len(p) == 5 * (7 + 111)
                assert not m["has_id3"]


def test_adts_id3_skip():
    p = encode_adts(1, 5, 2, 9, 64, id3_pad=300)
    m = parse_adts_meta(p)
    assert m["has_id3"] and m["n_frames"] == 9
    assert m["stream_bytes"] == len(p) - 310


def test_adts_malformed_rejected():
    with pytest.raises(ValueError):
        parse_adts_meta(b"\x00" * 16)
    good = encode_adts(1, 5, 2, 3, 50)
    with pytest.raises(ValueError):
        parse_adts_meta(good[:-10])  # truncated final frame
    bad = bytearray(good)
    bad[2] = (1 << 6) | (13 << 2)  # reserved frequency index
    with pytest.raises(ValueError):
        parse_adts_meta(bytes(bad))
    crc = bytearray(good)
    crc[1] &= 0xFE  # protection_absent = 0 (CRC frames: explicit gap)
    with pytest.raises(NotImplementedError):
        parse_adts_meta(bytes(crc))


def test_media_tables_closed_form(spark):
    """The Spark-side h264/aac media tables must produce payloads whose
    PARSED metadata equals the declared md5 closed form — the exact
    invariant the DuckDB oracles assert at query level."""
    from duckdb_title_mapper_spark.operators.multimodal import (
        _H264_LEVELS,
        aac_media_table,
        extract_aac_meta,
        extract_h264_meta,
        h264_media_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(40)
    texts = {r.doc_id: r.text for r in docs.collect()}

    h264 = {
        r.media_id: r.asDict()
        for r in extract_h264_meta(h264_media_table(spark, SF)).collect()
    }
    aac = {
        r.media_id: r.asDict()
        for r in extract_aac_meta(aac_media_table(spark, SF)).collect()
    }
    for did, text in texts.items():
        n, h = len(text), hashlib.md5(text.encode()).digest()
        mv = h264[did]
        assert mv["width"] == (h[2] % 64 + 16) * 2
        assert mv["height"] == (h[3] % 36 + 9) * 2
        assert mv["profile_idc"] == (66 if did % 2 == 0 else 100)
        assert mv["level_idc"] == _H264_LEVELS[h[6] % 7]
        assert mv["n_slices"] == 1 + n % 24
        assert mv["n_sei"] == (1 if h[4] % 2 == 0 else 0)
        ma = aac[did]
        rate = 32000 if h[2] % 2 == 0 else 16000
        assert ma["sample_rate"] == rate
        assert ma["profile"] == PROFILES[h[1] % 4]
        assert ma["n_frames"] == n % 50 + 4
        assert ma["duration_ms"] == (n % 50 + 4) * 1024 * 1000 // rate
        assert ma["stream_bytes"] == (n % 50 + 4) * (7 + h[4] % 200 + 30)
        assert ma["has_id3"] == (did % 3 == 0)
