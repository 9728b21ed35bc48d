"""Protobuf WIRE-FORMAT codec for ``tf.train.Example`` payloads.

Implemented from the public protobuf encoding spec
(https://protobuf.dev/programming-guides/encoding/) and the public
``tensorflow/core/example/example.proto`` / ``feature.proto`` schemas:

    Example   { Features features = 1; }
    Features  { map<string, Feature> feature = 1; }
    Feature   { oneof kind { BytesList bytes_list = 1;
                             FloatList float_list = 2;
                             Int64List int64_list = 3; } }
    BytesList { repeated bytes value = 1; }
    Int64List { repeated int64 value = 1 [packed = true]; }

Why hand-rolled: ``google.protobuf`` is absent from the environment
(SCALING.md protobuf notes), and unlike the streaming state-server
protocol (where a hand-rolled runtime was rejected as
exactly-once-critical), an Example payload walk is a pure function of
bytes with an exact SQL oracle — any encoding or parsing error
surfaces as a value mismatch in the t2 gate, the same contract as the
JPEG/PNG/MP4/MP3/H.264/AAC codecs.

This completes the TFRecord story: ``sources/shards.py`` proves the
u64le+CRC32C FRAME layer; this module proves the Example PAYLOAD
layer inside those frames.

No reference-repo counterpart (the reference is a title-standardizing
scalar UDF, src/lib.rs:43-86); this is mandated LLM-pipeline surface.
"""

from __future__ import annotations

_WT_VARINT = 0
_WT_LEN = 2


def _varint(n: int) -> bytes:
    """Unsigned LEB128.  A varint carries at most 64 bits on the wire,
    so values outside [0, 2^64) are an encoder bug, not a payload —
    raise rather than emit bytes no conformant decoder accepts
    (ADVICE r9: encode_example(2**64) used to round-trip)."""
    if n < 0:
        raise ValueError("negative varint not supported in this encoder")
    if n >= 1 << 64:
        raise ValueError("varint exceeds 64 bits")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, _WT_LEN) + _varint(len(payload)) + payload


def encode_example(features: dict[str, "int | bytes"]) -> bytes:
    """Encode a flat feature dict into a genuine tf.train.Example wire
    message.  int values become packed Int64List features, bytes
    values become BytesList features (both single-element, the common
    training-example shape)."""
    entries = bytearray()
    for key, val in features.items():
        if isinstance(val, bool) or not isinstance(val, (int, bytes)):
            raise TypeError(f"unsupported feature type for {key!r}")
        if isinstance(val, int):
            if not -(1 << 63) <= val < 1 << 63:
                raise ValueError(f"int64 feature out of range for {key!r}")
            # negatives go on the wire as 10-byte two's-complement
            # varints, per the spec (ADVICE r9: -1 labels are real)
            inner = _len_delim(1, _varint(val & ((1 << 64) - 1)))
            feature = _len_delim(3, inner)             # Feature.int64_list
        else:
            inner = _len_delim(1, val)                 # BytesList.value
            feature = _len_delim(1, inner)             # Feature.bytes_list
        entry = _len_delim(1, key.encode("utf-8")) + _len_delim(2, feature)
        entries += _len_delim(1, entry)                # Features.feature map
    return _len_delim(1, bytes(entries))               # Example.features


def _to_i64(v: int) -> int:
    """Two's-complement-wrap a decoded 64-bit varint to signed int64 —
    how int64 fields represent negatives on the wire."""
    return v - (1 << 64) if v >= 1 << 63 else v


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    """A varint carries at most 64 bits: a canonical 10-byte varint
    (two's-complement int64 negative) lands its last byte at shift 63
    with only bit 0 usable, so reject both an 11th byte AND any decoded
    value >= 2^64 (ADVICE r9: the old shift-only guard let 10-byte
    varints decode to ints up to 2^70-1)."""
    shift = 0
    val = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            if val >= 1 << 64:
                raise ValueError("varint overflows 64 bits")
            return val, i
        shift += 7
        if shift > 63:
            raise ValueError("varint overflows 64 bits")


def _fields(buf: bytes):
    """Generic wire walk: yield (field_no, wire_type, value) where
    value is an int for VARINT and a memoryview-sliced bytes for LEN.
    I64/I32 (wire types 1/5) are fixed-width skips; groups (3/4) are
    long-deprecated and rejected."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field_no, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            v, i = _read_varint(buf, i)
            yield field_no, wt, v
        elif wt == _WT_LEN:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError("length-delimited field overruns buffer")
            yield field_no, wt, bytes(buf[i:i + ln])
            i += ln
        elif wt == 1:  # fixed64
            yield field_no, wt, bytes(buf[i:i + 8])
            i += 8
        elif wt == 5:  # fixed32
            yield field_no, wt, bytes(buf[i:i + 4])
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def parse_example(buf: bytes) -> dict[str, "list[int] | list[bytes]"]:
    """Walk a tf.train.Example wire message back into a feature dict
    (key -> list of int64s or list of bytes)."""
    out: dict = {}
    for fno, wt, features_msg in _fields(buf):
        if fno != 1 or wt != _WT_LEN:
            raise ValueError("Example: expected features message at field 1")
        for eno, ewt, entry in _fields(features_msg):
            if eno != 1 or ewt != _WT_LEN:
                raise ValueError("Features: expected map entry at field 1")
            key = None
            vals: "list[int] | list[bytes]" = []
            for mno, mwt, mval in _fields(entry):
                if mno == 1 and mwt == _WT_LEN:
                    key = mval.decode("utf-8")
                elif mno == 2 and mwt == _WT_LEN:
                    for kno, kwt, kval in _fields(mval):
                        if kno == 3 and kwt == _WT_LEN:      # Int64List
                            for lno, lwt, lval in _fields(kval):
                                if lno != 1:
                                    raise ValueError("Int64List field")
                                if lwt == _WT_VARINT:
                                    vals.append(_to_i64(lval))
                                else:                         # packed
                                    i = 0
                                    while i < len(lval):
                                        v, i = _read_varint(lval, i)
                                        vals.append(_to_i64(v))
                        elif kno == 1 and kwt == _WT_LEN:    # BytesList
                            for lno, lwt, lval in _fields(kval):
                                if lno != 1 or lwt != _WT_LEN:
                                    raise ValueError("BytesList field")
                                vals.append(lval)
                        else:
                            raise ValueError(
                                f"unsupported Feature kind {kno}")
            if key is None:
                raise ValueError("map entry without key")
            out[key] = vals
    return out
