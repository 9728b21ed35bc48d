"""Baseline-JPEG codec conformance (operators/jpeg.py, r6).

The decoder is general (any SOF0 stream with DHT-declared tables); the
encoder is a real FDCT->quantize->Huffman pipeline.  Because the codec
is lossy, general-image round-trips are verified against an INDEPENDENT
FDCT->quant->dequant->IDCT reference reconstruction, while the
oracle-facing constant-color path is verified against the closed form
the SQL oracle uses (2*round((v-128)/2) + 128)."""

import numpy as np
import pytest

from duckdb_title_mapper_spark.operators.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _dct_matrix,
    decode_jpeg_baseline,
    decode_jpeg_planes,
    encode_jpeg_color420,
    encode_jpeg_gray,
    upsample_to_frame,
)

SF = "/root/testdata/sf0.001"


def test_constant_gray_exact_closed_form():
    for v, w, h in [(0, 8, 8), (100, 17, 9), (254, 23, 5), (128, 33, 31),
                    (2, 4, 4), (200, 1, 1)]:
        payload = encode_jpeg_gray(np.full((h, w), v, dtype=np.uint8))
        assert decode_jpeg_baseline(payload) == (w, h, w * h, v * w * h)


def test_constant_gray_odd_levels_match_dc_quantization():
    # odd v is NOT fixed-point under the DC-16 quantizer (the DC lands
    # on a .5 quantization boundary where FDCT float drift decides the
    # tie, which is why the ORACLE path uses even v only); the decode
    # must still match the reference reconstruction bit-for-bit, and
    # sit within one DC step (2 levels) of the input
    for v in (1, 77, 101, 255):
        plane = np.full((8, 8), v, dtype=np.uint8)
        payload = encode_jpeg_gray(plane)
        _, _, planes = decode_jpeg_planes(payload)
        assert np.array_equal(planes[0], _reference_reconstruction(plane))
        got = int(planes[0][0, 0])
        assert got == planes[0].min() == planes[0].max()
        assert abs(got - v) <= 2


def _reference_reconstruction(img: np.ndarray) -> np.ndarray:
    """Independent FDCT -> quantize -> dequantize -> IDCT pipeline."""
    a = _dct_matrix()
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw), float)
    padded[:h, :w] = img
    if pw > w:
        padded[:h, w:] = padded[:h, w - 1 : w]
    if ph > h:
        padded[h:, :] = padded[h - 1 : h, :]
    padded -= 128.0
    out = np.zeros((ph, pw))
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.rint((a @ blk @ a.T) / QUANT_LUMA) * QUANT_LUMA
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                a.T @ q @ a + 128.0
            )
    return np.clip(np.rint(out[:h, :w]), 0, 255).astype(np.uint8)


def test_general_gray_roundtrip_matches_reference():
    rng = np.random.RandomState(42)
    for shape in [(21, 30), (8, 8), (64, 48), (5, 13)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        _, _, planes = decode_jpeg_planes(encode_jpeg_gray(img))
        assert np.array_equal(planes[0], _reference_reconstruction(img))


def test_smooth_image_decodes_close_to_original():
    # a smooth gradient (the images JPEG is FOR) must reconstruct tightly
    y, x = np.mgrid[0:32, 0:48]
    img = ((y * 3 + x * 2) % 256).astype(np.uint8)
    _, _, planes = decode_jpeg_planes(encode_jpeg_gray(img))
    err = np.abs(planes[0].astype(int) - img.astype(int))
    assert err.mean() < 12.0


def test_color420_constant_exact_and_subsampled_dims():
    y = np.full((19, 22), 120, np.uint8)
    cb = np.full((10, 11), 60, np.uint8)
    cr = np.full((10, 11), 200, np.uint8)
    payload = encode_jpeg_color420(y, cb, cr)
    w, h, planes = decode_jpeg_planes(payload)
    assert (w, h) == (22, 19)
    assert planes[0].shape == (19, 22)
    assert planes[1].shape == (10, 11) and planes[2].shape == (10, 11)
    assert np.all(planes[0] == 120)
    assert np.all(planes[1] == 60)
    assert np.all(planes[2] == 200)
    assert decode_jpeg_baseline(payload)[3] == (
        120 * 19 * 22 + 60 * 10 * 11 + 200 * 10 * 11
    )
    up = upsample_to_frame(payload)
    assert up.shape == (3, 19, 22)
    assert np.all(up[1] == 60) and np.all(up[2] == 200)


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    base = decode_jpeg_planes(encode_jpeg_gray(img))[2][0]
    for interval in (1, 2, 3, 7):
        payload = encode_jpeg_gray(img, restart_interval=interval)
        assert b"\xff\xdd" in payload  # DRI present
        got = decode_jpeg_planes(payload)[2][0]
        assert np.array_equal(base, got)


def test_progressive_equals_baseline_reconstruction():
    """r6c: full SOF2 support.  The progressive encoder entropy-codes
    the SAME quantized coefficients as baseline, so the progressive
    decode must equal the baseline decode EXACTLY — across noise,
    gradient, and two-region images, with both the default scan script
    and a deep 3-level successive-approximation script."""
    from duckdb_title_mapper_spark.operators.jpeg import (
        encode_jpeg_gray_progressive,
    )

    deep = (
        (0, 0, 0, 2), (1, 2, 0, 2), (3, 9, 0, 2), (10, 63, 0, 2),
        (0, 0, 2, 1), (1, 2, 2, 1), (3, 9, 2, 1), (10, 63, 2, 1),
        (0, 0, 1, 0), (1, 2, 1, 0), (3, 9, 1, 0), (10, 63, 1, 0),
    )
    rng = np.random.RandomState(5)
    for trial in range(12):
        h, w = rng.randint(1, 60), rng.randint(1, 60)
        kind = trial % 3
        if kind == 0:
            img = rng.randint(0, 256, (h, w)).astype(np.uint8)
        elif kind == 1:
            yy, xx = np.mgrid[0:h, 0:w]
            img = ((yy * 2 + xx * 3) % 256).astype(np.uint8)
        else:
            img = np.full((h, w), rng.randint(0, 256), np.uint8)
            img[: h // 2] = rng.randint(0, 256)
        base = decode_jpeg_planes(encode_jpeg_gray(img))[2][0]
        for script in (None, deep):
            payload = (encode_jpeg_gray_progressive(img)
                       if script is None
                       else encode_jpeg_gray_progressive(img, script))
            # the SOF marker must genuinely be SOF2
            assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
            prog = decode_jpeg_planes(payload)[2][0]
            assert np.array_equal(base, prog), (h, w, kind)


def test_progressive_constant_closed_form():
    from duckdb_title_mapper_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_gray_progressive,
    )

    for v, w, h in [(0, 8, 8), (100, 17, 9), (254, 23, 5)]:
        payload = encode_jpeg_gray_progressive(
            np.full((h, w), v, dtype=np.uint8)
        )
        assert decode_jpeg_baseline(payload) == (w, h, w * h, v * w * h)


def test_arithmetic_coded_raises_not_implemented():
    payload = bytearray(encode_jpeg_gray(np.full((8, 8), 100, np.uint8)))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 1] = 0xC9  # SOF9: arithmetic-coded sequential
    with pytest.raises(NotImplementedError):
        decode_jpeg_planes(bytes(payload))


def test_malformed_payloads_raise_value_error():
    with pytest.raises(ValueError):
        decode_jpeg_planes(b"\x00\x01\x02\x03")
    good = encode_jpeg_gray(np.full((8, 8), 100, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg_planes(good[:20])  # truncated before any scan


def test_codec_media_table_jpeg_slice(spark):
    """Every doc_id % 3 == 2 payload is a genuine JPEG whose decode
    matches the md5-derived closed form the SQL oracle uses."""
    import hashlib

    from duckdb_title_mapper_spark.operators.multimodal import (
        codec_media_table,
    )

    rows = (
        codec_media_table(spark, SF)
        .where("media_id % 3 = 2")
        .limit(12)
        .collect()
    )
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .where("doc_id % 3 = 2")
        .collect()
    }
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        text = docs[r["media_id"]]
        n = len(text)
        v = (hashlib.md5(text.encode()).digest()[0] % 128) * 2
        w, h = n % 24 + 4, n % 12 + 4
        assert decode_jpeg_baseline(payload) == (w, h, w * h, v * w * h)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
    # spec spot anchors
    assert ZIGZAG[0] == (0, 0) and ZIGZAG[1] == (0, 1)
    assert ZIGZAG[2] == (1, 0) and ZIGZAG[63] == (7, 7)
