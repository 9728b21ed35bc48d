"""GIF/LZW codec conformance (operators/gif.py, r6c): real
variable-width LZW round trips including dictionary overflow and the
KwKwK case, interlace de-scrambling, extension-block handling, and the
media-table closed form."""

import numpy as np
import pytest

from duckdb_title_mapper_spark.operators.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif,
    decode_gif_indices,
    encode_gif,
)

SF = "/root/testdata/sf0.001"


def test_lzw_roundtrip_including_dictionary_overflow():
    rng = np.random.RandomState(11)
    for n, alpha in [(100, 4), (5000, 16), (60000, 256), (100000, 200)]:
        data = bytes(rng.randint(0, alpha, n).astype(np.uint8))
        mcs = max(2, (alpha - 1).bit_length())
        assert _lzw_decompress(_lzw_compress(data, mcs), mcs) == data


def test_lzw_kwkwk_case():
    # 'ababab...' drives the decoder through the code == next_code path
    data = b"abababababababab" * 8
    assert _lzw_decompress(_lzw_compress(data, 8), 8) == data


def test_gif_roundtrip_shapes_palettes_interlace():
    rng = np.random.RandomState(12)
    for shape, ncol, inter in [
        ((7, 9), 4, False), ((33, 17), 256, False), ((16, 16), 2, False),
        ((23, 31), 100, True), ((95, 120), 256, True), ((1, 1), 2, False),
    ]:
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        idx = rng.randint(0, ncol, shape).astype(np.uint8)
        payload = encode_gif(idx, pal, interlace=inter)
        w, h, img, p2 = decode_gif_indices(payload)
        assert (w, h) == shape[::-1]
        assert np.array_equal(img, idx)
        assert np.array_equal(p2[: ncol], pal)
        want = int(pal[idx].astype(np.int64).sum())
        assert decode_gif(payload) == (
            shape[1], shape[0], shape[0] * shape[1], want
        )


def test_gif89a_with_extension_blocks():
    base = encode_gif(
        np.full((5, 6), 1, np.uint8),
        np.array([[0, 0, 0], [10, 20, 30]], np.uint8),
    )
    body = bytearray(base)
    body[:6] = b"GIF89a"
    desc = body.index(0x2C, 13 + 6)  # after header + LSD + 2-color GCT
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    patched = bytes(body[:desc]) + gce + bytes(body[desc:])
    assert decode_gif(patched) == decode_gif(base)


def test_malformed_gif_raises():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF!")
    base = encode_gif(
        np.full((5, 6), 0, np.uint8), np.array([[1, 2, 3], [4, 5, 6]],
                                               np.uint8)
    )
    with pytest.raises(ValueError):
        decode_gif(base[:20])


def test_gif_media_table_closed_form(spark):
    import hashlib

    from duckdb_title_mapper_spark.operators.multimodal import (
        gif_media_table,
    )

    rows = gif_media_table(spark, SF).limit(10).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:6] == b"GIF87a"
        text = docs[r["media_id"]]
        n = len(text)
        d = hashlib.md5(text.encode()).digest()
        w, h = n % 24 + 4, n % 12 + 4
        sums = [d[3 * c] + d[3 * c + 1] + d[3 * c + 2] for c in range(4)]
        want = w * sum(((h + 3 - c) // 4) * sums[c] for c in range(4))
        assert decode_gif(payload) == (w, h, w * h, want)
