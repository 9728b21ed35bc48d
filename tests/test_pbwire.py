"""Unit tests for the tf.train.Example protobuf wire codec
(operators/pbwire.py) — round-trip on varint width boundaries, bytes
kinds, and malformed-input rejection."""

import pytest

from duckdb_title_mapper_spark.operators.pbwire import (
    _read_varint,
    _varint,
    encode_example,
    parse_example,
)


@pytest.mark.parametrize(
    "n", [0, 1, 127, 128, 300, 16383, 16384, 2097151, 2097152,
          268435455, 268435456, (1 << 63) - 1])
def test_varint_roundtrip_boundaries(n):
    buf = _varint(n)
    # LEB128 width: ceil(bits/7), at least 1
    want = max(1, -(-n.bit_length() // 7))
    assert len(buf) == want
    val, i = _read_varint(buf, 0)
    assert (val, i) == (n, len(buf))


def test_varint_rejects_negative():
    with pytest.raises(ValueError):
        _varint(-1)


def test_example_roundtrip_mixed_kinds():
    feats = {
        "a": 0,
        "b": 16384,
        "empty": b"",
        "blob": bytes(range(256)),
        "k" * 40: 7,  # long key
    }
    parsed = parse_example(encode_example(feats))
    assert parsed == {
        "a": [0], "b": [16384], "empty": [b""],
        "blob": [bytes(range(256))], "k" * 40: [7],
    }


def test_example_rejects_bool_and_float():
    with pytest.raises(TypeError):
        encode_example({"x": True})
    with pytest.raises(TypeError):
        encode_example({"x": 1.5})


def test_parse_rejects_truncated():
    buf = encode_example({"a": 1})
    with pytest.raises(ValueError):
        parse_example(buf[:-1])
    with pytest.raises(ValueError):
        parse_example(b"\x80")  # unterminated varint


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _feature_values = st.one_of(
        st.integers(min_value=0, max_value=(1 << 63) - 1),
        st.binary(max_size=300),
    )

    @given(st.dictionaries(
        st.text(
            alphabet=st.characters(codec="utf-8",
                                   blacklist_categories=("Cs",)),
            min_size=1, max_size=30),
        _feature_values, min_size=0, max_size=12))
    @settings(max_examples=200, deadline=None)
    def test_example_roundtrip_property(feats):
        parsed = parse_example(encode_example(feats))
        assert parsed == {k: [v] for k, v in feats.items()}
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


def test_negative_int64_roundtrip():
    """ADVICE r9: negative int64 features (e.g. -1 labels) are 10-byte
    two's-complement varints per the spec — encode and re-parse them."""
    feats = {"label": -1, "offset": -(1 << 63), "pos": 7}
    buf = encode_example(feats)
    assert parse_example(buf) == {k: [v] for k, v in feats.items()}
    # -1 costs exactly 10 wire bytes for its varint
    assert len(encode_example({"a": -1})) - len(encode_example({"a": 0})) == 9


def test_varint_64bit_bounds():
    """Values outside int64 raise on encode; wire varints >= 2^64 (a
    10-byte varint with any 10th-byte bit above bit 0) raise on decode."""
    with pytest.raises(ValueError):
        encode_example({"a": 1 << 63})
    with pytest.raises(ValueError):
        encode_example({"a": -(1 << 63) - 1})
    # craft a 10-byte varint decoding to 2^64 (10th byte 0x02)
    bad = bytes([0x80] * 9 + [0x02])
    with pytest.raises(ValueError):
        _read_varint(bad, 0)
    # 11-byte varints are always malformed
    with pytest.raises(ValueError):
        _read_varint(bytes([0x80] * 10 + [0x01]), 0)
    # the canonical 10-byte -1 encoding still decodes
    v, i = _read_varint(bytes([0xFF] * 9 + [0x01]), 0)
    assert v == (1 << 64) - 1 and i == 10
