"""PNG codec conformance (operators/png.py, r6b): lossless round trips
across all row filters, palette expansion, CRC verification, honest
rejection of interlace/16-bit, and the media-table closed form."""

import struct
import zlib

import numpy as np
import pytest

from duckdb_title_mapper_spark.operators.png import (
    _SIG,
    _chunk,
    decode_png,
    decode_png_planes,
    encode_png,
)

SF = "/root/testdata/sf0.001"


def test_gray_lossless_roundtrip_all_filters():
    rng = np.random.RandomState(3)
    for shape in [(9, 17), (1, 1), (23, 5), (16, 16), (5, 1)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for cycle in (True, False):
            w, h, s = decode_png_planes(encode_png(img, filter_cycle=cycle))
            assert (w, h) == shape[::-1]
            assert np.array_equal(s[:, :, 0], img)


def test_rgb_lossless_roundtrip():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (13, 21, 3)).astype(np.uint8)
    w, h, s = decode_png_planes(encode_png(img))
    assert (w, h) == (21, 13)
    assert np.array_equal(s, img)


def test_filter_cycle_actually_emits_all_five_filters():
    """The encoder's row-filter cycle is the decoder-coverage device;
    verify the compressed stream really carries filter types 0..4."""
    img = np.random.RandomState(5).randint(0, 256, (10, 8)).astype(np.uint8)
    payload = encode_png(img, filter_cycle=True)
    # extract the IDAT body and inflate
    pos = len(_SIG)
    idat = b""
    while pos < len(payload):
        length, tag = struct.unpack_from(">I4s", payload, pos)
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    rowlen = 8 + 1
    ftypes = {raw[y * rowlen] for y in range(10)}
    assert ftypes == {0, 1, 2, 3, 4}


def test_palette_png_expands_through_plte():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], dtype=np.uint8)
    idx = np.random.RandomState(6).randint(0, 3, (4, 7)).astype(np.uint8)
    stream = bytearray()
    for y in range(4):
        stream.append(0)
        stream += idx[y].tobytes()
    payload = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 4, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )
    w, h, s = decode_png_planes(payload)
    assert (w, h) == (7, 4)
    assert np.array_equal(s, pal[idx])


def test_crc_corruption_raises():
    payload = bytearray(encode_png(np.full((6, 10), 200, np.uint8)))
    payload[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError):
        decode_png_planes(bytes(payload))


def test_adam7_interlace_lossless_roundtrip():
    """Adam7 (r6c): seven independently-filtered sub-images must
    reassemble to the exact input — gray and RGB, including sizes
    where some passes are empty (w or h < pass stride)."""
    rng = np.random.RandomState(9)
    for shape in [(16, 16), (9, 17), (1, 1), (3, 2), (7, 5), (33, 40)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        payload = encode_png(img, interlace=True)
        # the IHDR interlace byte must actually be set
        assert payload[len(_SIG) + 8 + 12] == 1
        w, h, s = decode_png_planes(payload)
        assert (w, h) == shape[::-1]
        assert np.array_equal(s[:, :, 0], img), shape
    rgb = rng.randint(0, 256, (13, 21, 3)).astype(np.uint8)
    w, h, s = decode_png_planes(encode_png(rgb, interlace=True))
    assert np.array_equal(s, rgb)


def test_16bit_raises_not_implemented():
    base = encode_png(np.full((8, 8), 1, np.uint8))
    b = bytearray(base)
    ihdr_off = len(_SIG) + 8
    b[ihdr_off + 8] = 16
    body = bytes(b[ihdr_off : ihdr_off + 13])
    b[ihdr_off + 13 : ihdr_off + 17] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    )
    with pytest.raises(NotImplementedError):
        decode_png_planes(bytes(b))


def test_truncated_payload_raises_value_error():
    payload = encode_png(np.full((6, 10), 9, np.uint8))
    with pytest.raises(ValueError):
        decode_png_planes(payload[:30])
    with pytest.raises(ValueError):
        decode_png_planes(b"\x00" * 16)


def test_png_media_table_closed_form(spark):
    import hashlib

    from duckdb_title_mapper_spark.operators.multimodal import (
        png_media_table,
    )

    rows = png_media_table(spark, SF).limit(10).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:8] == _SIG
        text = docs[r["media_id"]]
        n = len(text)
        d = hashlib.md5(text.encode()).digest()
        w, h = n % 24 + 4, n % 12 + 4
        level = d[0] if r["media_id"] % 2 == 0 else d[0] + d[1] + d[2]
        assert decode_png(payload) == (w, h, w * h, level * w * h)
