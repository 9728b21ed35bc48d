"""Apache ORC file walk — the columnar warehouse format, written and
re-read FROM SCRATCH (uncompressed, RLEv1).

Implemented from the public ORC v1 specification
(https://orc.apache.org/specification/ORCv1/) with the repo's own
protobuf wire codec (`operators/pbwire.py` — varint / tag /
length-delimited primitives from the public protobuf encoding spec).
Nothing delegates to an ORC library in the query path; `pyarrow.orc`
appears only in tests as the AUTHORITY check (the Apache ORC C++
reader must parse our bytes).

File layout for the (doc_id bigint, text string) schema, all
validated on read-back:

  "ORC"                                   -- 3-byte header magic
  stripe*:  [long DATA stream : RLEv1 zigzag varints]
            [text LENGTH stream: RLEv1 unsigned varints]
            [text DATA stream  : raw bytes]
            [StripeFooter proto: streams + column encodings]
  Footer proto  (headerLength, contentLength, StripeInformation*,
                 Type tree STRUCT{LONG, STRING}, numberOfRows)
  PostScript proto (footerLength, compression NONE, version [0,12],
                    magic "ORC")
  1 byte: PostScript length

RLEv1: the writer emits literal groups only (control byte = -n as a
signed byte, then n varints; always legal — runs are an optimization),
the reader decodes BOTH literal groups and delta runs (control 0..127
= length+3 run with a signed delta byte and a base varint), so it
parses files from other writers too.

The SQL oracle ladders the DATA-layer byte accounting closed-form:
long stream = ceil(rows/128) control bytes + sum of zigzag varint
lengths, length stream = control bytes + unsigned varint lengths,
text stream = raw byte sum.  (Metadata proto sizes are validated
Spark-side in the walk itself — `read_orc` checks every declared
stream/footer/PostScript length against the actual bytes.)

Reference scope: the reference engine has no container-format surface
(src/lib.rs:1-86); ORC completes the ingestion family's columnar-
warehouse axis beside Arrow IPC (in-memory) and the parquet footer
walk.
"""

from __future__ import annotations

import struct

from ..operators.pbwire import _len_delim, _tag, _varint

MAGIC = b"ORC"
STRIPE_ROWS = 32

# proto enum values from the public orc_proto.proto
_KIND_STRUCT, _KIND_LONG, _KIND_STRING = 12, 4, 7
_STREAM_DATA, _STREAM_LENGTH = 1, 2
_COMPRESSION_NONE = 0


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def rle_v1_literals(values: list[int], signed: bool) -> bytes:
    """RLEv1 literal groups: control byte -n (two's complement),
    then n varints (zigzag when the stream is signed)."""
    out = bytearray()
    for s in range(0, len(values), 128):
        chunk = values[s:s + 128]
        out.append((256 - len(chunk)) & 0xFF)
        for v in chunk:
            out += _varint(_zigzag(v) if signed else v)
    return bytes(out)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated ORC varint")
        b = buf[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, i
        shift += 7
        if shift > 70:
            raise ValueError("ORC varint too long")


def rle_v1_decode(buf: bytes, n: int, signed: bool) -> list[int]:
    """Decode exactly n values; handles literal groups AND delta
    runs (so the reader parses other writers' streams too)."""
    out: list[int] = []
    i = 0
    while len(out) < n:
        if i >= len(buf):
            raise ValueError("RLEv1 stream exhausted early")
        ctrl = buf[i]
        i += 1
        if ctrl < 0x80:  # run: length = ctrl + 3, signed delta, base
            length = ctrl + 3
            delta = struct.unpack_from("<b", buf, i)[0]
            i += 1
            u, i = _read_varint(buf, i)
            base = _unzigzag(u) if signed else u
            out.extend(base + k * delta for k in range(length))
        else:  # literals: 256 - ctrl values
            for _ in range(256 - ctrl):
                u, i = _read_varint(buf, i)
                out.append(_unzigzag(u) if signed else u)
    if i != len(buf):
        raise ValueError("RLEv1 stream has trailing bytes")
    if len(out) != n:
        raise ValueError("RLEv1 run overran the declared row count")
    return out


def _pb_u64(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _stripe_footer(lens: tuple[int, int, int]) -> bytes:
    """StripeFooter{streams[3], columns[3]} — stream order: long DATA
    (col 1), text LENGTH (col 2), text DATA (col 2)."""
    streams = [
        (_STREAM_DATA, 1, lens[0]),
        (_STREAM_LENGTH, 2, lens[1]),
        (_STREAM_DATA, 2, lens[2]),
    ]
    out = bytearray()
    for kind, col, ln in streams:
        out += _len_delim(
            1, _pb_u64(1, kind) + _pb_u64(2, col) + _pb_u64(3, ln))
    for _ in range(3):  # ColumnEncoding{kind DIRECT=0}
        out += _len_delim(2, _pb_u64(1, 0))
    return bytes(out)


def _footer(stripes: list[tuple[int, int, int, int]],
            n_rows: int) -> bytes:
    """Footer{headerLength 3, contentLength, stripes, types, rows,
    rowIndexStride 0}.  Type tree: 0 STRUCT(children 1, 2;
    names doc_id, text), 1 LONG, 2 STRING."""
    out = bytearray()
    out += _pb_u64(1, 3)
    content = 3 + sum(d + f for _o, d, f, _n in stripes)
    out += _pb_u64(2, content)
    for off, data_len, foot_len, nrows in stripes:
        out += _len_delim(
            3,
            _pb_u64(1, off) + _pb_u64(2, 0) + _pb_u64(3, data_len)
            + _pb_u64(4, foot_len) + _pb_u64(5, nrows))
    root = (_pb_u64(1, _KIND_STRUCT)
            + _tag(2, 2) + _varint(2) + _varint(1) + _varint(2)
            + _len_delim(3, b"doc_id") + _len_delim(3, b"text"))
    out += _len_delim(4, root)
    out += _len_delim(4, _pb_u64(1, _KIND_LONG))
    out += _len_delim(4, _pb_u64(1, _KIND_STRING))
    out += _pb_u64(6, n_rows)
    out += _pb_u64(8, 0)
    return bytes(out)


def _postscript(footer_len: int) -> bytes:
    return (_pb_u64(1, footer_len)
            + _pb_u64(2, _COMPRESSION_NONE)
            + _pb_u64(3, 65536)
            + _tag(4, 2) + _varint(2) + _varint(0) + _varint(12)
            + _pb_u64(5, 0)
            + _pb_u64(6, 1)
            + _len_delim(8000, MAGIC))


def build_orc(records: list[tuple[int, str]],
              stripe_rows: int = STRIPE_ROWS) -> bytes:
    out = bytearray(MAGIC)
    stripes = []
    for s in range(0, len(records), stripe_rows):
        chunk = records[s:s + stripe_rows]
        ids = [d for d, _ in chunk]
        texts = [t.encode() for _, t in chunk]
        long_data = rle_v1_literals(ids, signed=True)
        len_data = rle_v1_literals([len(t) for t in texts],
                                   signed=False)
        str_data = b"".join(texts)
        foot = _stripe_footer(
            (len(long_data), len(len_data), len(str_data)))
        off = len(out)
        out += long_data + len_data + str_data + foot
        stripes.append((off,
                        len(long_data) + len(len_data) + len(str_data),
                        len(foot), len(chunk)))
    ftr = _footer(stripes, len(records))
    ps = _postscript(len(ftr))
    if len(ps) > 255:
        raise ValueError("PostScript too long")
    out += ftr + ps + bytes([len(ps)])
    return bytes(out)


# -- minimal protobuf reader (generic field walk) ---------------------


def _pb_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
            yield field, wt, v
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            yield field, wt, buf[i:i + ln]
            i += ln
        else:
            raise ValueError(f"unsupported ORC proto wire type {wt}")


def _pb_dict(buf: bytes) -> dict:
    out: dict = {}
    for field, _wt, v in _pb_fields(buf):
        out.setdefault(field, []).append(v)
    return out


def read_orc(payload: bytes) -> dict:
    """Walk an ORC file, validating header magic, PostScript magic +
    declared footer length, contentLength, every stripe's stream
    lengths against its footer, and per-stripe row counts; returns
    the decoded records plus stream-level byte accounting."""
    if payload[:3] != MAGIC:
        raise ValueError("bad ORC header magic")
    ps_len = payload[-1]
    ps = _pb_dict(payload[len(payload) - 1 - ps_len:len(payload) - 1])
    if ps.get(8000, [b""])[0] != MAGIC:
        raise ValueError("bad ORC PostScript magic")
    if ps.get(2, [0])[0] != _COMPRESSION_NONE:
        raise ValueError("only uncompressed ORC is implemented")
    footer_len = ps[1][0]
    f_end = len(payload) - 1 - ps_len
    ftr = _pb_dict(payload[f_end - footer_len:f_end])
    content_len = ftr[2][0]
    if 3 + sum(
        _pb_dict(s).get(2, [0])[0] + _pb_dict(s)[3][0]
        + _pb_dict(s)[4][0] for s in ftr.get(3, [])
    ) != content_len:
        raise ValueError("ORC contentLength mismatch")
    if content_len + footer_len + ps_len + 1 != len(payload):
        raise ValueError("ORC file length accounting mismatch")
    records: list[tuple[int, str]] = []
    acct = {"long_data_bytes": 0, "len_stream_bytes": 0,
            "str_data_bytes": 0}
    for s in ftr.get(3, []):
        si = _pb_dict(s)
        off, data_len, foot_len, nrows = (si[1][0], si[3][0],
                                          si[4][0], si[5][0])
        off += si.get(2, [0])[0]  # skip any row-index streams
        sf = _pb_dict(payload[off + data_len:off + data_len + foot_len])
        streams = [_pb_dict(st) for st in sf[1]]
        lens = [st.get(3, [0])[0] for st in streams]
        if sum(lens) != data_len:
            raise ValueError("stripe stream lengths != dataLength")
        kinds = [(st.get(1, [0])[0], st.get(2, [0])[0])
                 for st in streams]
        if kinds != [(_STREAM_DATA, 1), (_STREAM_LENGTH, 2),
                     (_STREAM_DATA, 2)]:
            raise ValueError("unexpected stripe stream layout")
        p = off
        long_buf = payload[p:p + lens[0]]
        p += lens[0]
        len_buf = payload[p:p + lens[1]]
        p += lens[1]
        str_buf = payload[p:p + lens[2]]
        ids = rle_v1_decode(long_buf, nrows, signed=True)
        tlens = rle_v1_decode(len_buf, nrows, signed=False)
        if sum(tlens) != lens[2]:
            raise ValueError("string DATA length mismatch")
        pos = 0
        for d, tl in zip(ids, tlens):
            records.append((d, str_buf[pos:pos + tl].decode()))
            pos += tl
        acct["long_data_bytes"] += lens[0]
        acct["len_stream_bytes"] += lens[1]
        acct["str_data_bytes"] += lens[2]
    if ftr[6][0] != len(records):
        raise ValueError("footer numberOfRows mismatch")
    return {"records": records, "n_stripes": len(ftr.get(3, [])),
            "file_bytes": len(payload), **acct}
