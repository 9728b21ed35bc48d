"""MessagePack source walk — build and strictly re-read a genuine
msgpack document container, from first principles.

MessagePack (msgpack.org, public spec) is the compact binary JSON used
by Fluentd/Redis-streams-style log pipelines — a common landing format
for raw training-data feeds.  This module implements exactly the
subset the container needs (nil is never emitted; maps use fixmap;
ints are nonnegative):

- positive fixint        0x00-0x7f            v < 128
- uint8/16/32/64         0xcc/0xcd/0xce/0xcf  big-endian payload
- fixstr                 0xa0|len             len < 32
- str8/16/32             0xd9/0xda/0xdb       big-endian length prefix
- fixarray               0x90|len             len < 16
- array32                0xdd                 explicit 4-byte count
- fixmap                 0x80|len             len < 16

Container layout per source (one file per source, doc_id order):

    fixmap{3}
      "source": str(source)
      "n":      uint(n_records)
      "docs":   array32[ fixarray{2}[ uint(doc_id), str(text) ] ... ]

``array32`` is used for the record list regardless of count so the
header size is count-independent (the closed-form-oracle discipline);
record ints/strs use the minimal encoding, which is what the byte
ladders in the workload oracle reproduce.

No reference file:line to cite: the reference (Rust scalar UDF) has no
container-format surface; this is part of the engine's ingestion
family (Avro/ORC/WARC/TFRecord/... siblings).
"""

from __future__ import annotations

import struct


def _enc_uint(v: int) -> bytes:
    """Minimal MessagePack encoding of a NONNEGATIVE integer."""
    if v < 0:
        raise ValueError("container ints are nonnegative by contract")
    if v < 128:
        return struct.pack("B", v)
    if v < 1 << 8:
        return b"\xcc" + struct.pack("B", v)
    if v < 1 << 16:
        return b"\xcd" + struct.pack(">H", v)
    if v < 1 << 32:
        return b"\xce" + struct.pack(">I", v)
    if v < 1 << 64:
        return b"\xcf" + struct.pack(">Q", v)
    raise ValueError("int too large for msgpack uint64")


def _enc_str(s: str) -> bytes:
    b = s.encode("utf-8")
    n = len(b)
    if n < 32:
        return struct.pack("B", 0xA0 | n) + b
    if n < 1 << 8:
        return b"\xd9" + struct.pack("B", n) + b
    if n < 1 << 16:
        return b"\xda" + struct.pack(">H", n) + b
    if n < 1 << 32:
        return b"\xdb" + struct.pack(">I", n) + b
    raise ValueError("string too large for msgpack str32")


def uint_len(v: int) -> int:
    """Encoded length of a nonnegative int (the oracle ladder)."""
    return len(_enc_uint(v))


def str_len(nbytes: int) -> int:
    """Encoded length of a string of ``nbytes`` UTF-8 bytes."""
    if nbytes < 32:
        return 1 + nbytes
    if nbytes < 1 << 8:
        return 2 + nbytes
    if nbytes < 1 << 16:
        return 3 + nbytes
    return 5 + nbytes


def record_len(doc_id: int, text_bytes: int) -> int:
    """Encoded length of one fixarray{2}[uint(doc_id), str(text)]."""
    return 1 + uint_len(doc_id) + str_len(text_bytes)


def build_msgpack(source: str, recs: list[tuple[int, str]]) -> bytes:
    """Serialize ``recs`` = [(doc_id, text), ...] (caller pre-sorts by
    doc_id) into the container described in the module docstring."""
    out = [struct.pack("B", 0x80 | 3)]
    out.append(_enc_str("source"))
    out.append(_enc_str(source))
    out.append(_enc_str("n"))
    out.append(_enc_uint(len(recs)))
    out.append(_enc_str("docs"))
    out.append(b"\xdd" + struct.pack(">I", len(recs)))
    for doc_id, text in recs:
        out.append(struct.pack("B", 0x90 | 2))
        out.append(_enc_uint(doc_id))
        out.append(_enc_str(text))
    return b"".join(out)


class _Reader:
    def __init__(self, blob: bytes):
        self.b = blob
        self.off = 0

    def _take(self, n: int) -> bytes:
        if self.off + n > len(self.b):
            raise ValueError("msgpack: truncated input")
        chunk = self.b[self.off:self.off + n]
        self.off += n
        return chunk

    def read_uint(self) -> int:
        tag = self._take(1)[0]
        if tag < 0x80:
            return tag
        if tag == 0xCC:
            return self._take(1)[0]
        if tag == 0xCD:
            return struct.unpack(">H", self._take(2))[0]
        if tag == 0xCE:
            return struct.unpack(">I", self._take(4))[0]
        if tag == 0xCF:
            return struct.unpack(">Q", self._take(8))[0]
        raise ValueError(f"msgpack: expected uint, got tag 0x{tag:02x}")

    def read_str(self) -> str:
        tag = self._take(1)[0]
        if 0xA0 <= tag <= 0xBF:
            n = tag & 0x1F
        elif tag == 0xD9:
            n = self._take(1)[0]
        elif tag == 0xDA:
            n = struct.unpack(">H", self._take(2))[0]
        elif tag == 0xDB:
            n = struct.unpack(">I", self._take(4))[0]
        else:
            raise ValueError(
                f"msgpack: expected str, got tag 0x{tag:02x}")
        return self._take(n).decode("utf-8")

    def read_array_header(self) -> int:
        tag = self._take(1)[0]
        if 0x90 <= tag <= 0x9F:
            return tag & 0x0F
        if tag == 0xDC:
            return struct.unpack(">H", self._take(2))[0]
        if tag == 0xDD:
            return struct.unpack(">I", self._take(4))[0]
        raise ValueError(f"msgpack: expected array, got tag 0x{tag:02x}")

    def read_map_header(self) -> int:
        tag = self._take(1)[0]
        if 0x80 <= tag <= 0x8F:
            return tag & 0x0F
        raise ValueError(f"msgpack: expected fixmap, got tag 0x{tag:02x}")


def read_msgpack(blob: bytes) -> dict:
    """Strictly parse a container: validates the three-key map shape,
    key order, monotone doc_ids, declared count, and exact EOF."""
    r = _Reader(blob)
    if r.read_map_header() != 3:
        raise ValueError("msgpack: top-level map must have 3 entries")
    if r.read_str() != "source":
        raise ValueError("msgpack: first key must be 'source'")
    source = r.read_str()
    if r.read_str() != "n":
        raise ValueError("msgpack: second key must be 'n'")
    n = r.read_uint()
    if r.read_str() != "docs":
        raise ValueError("msgpack: third key must be 'docs'")
    cnt = r.read_array_header()
    if cnt != n:
        raise ValueError(f"msgpack: declared n={n} but array has {cnt}")
    recs: list[tuple[int, str]] = []
    prev = -1
    for _ in range(cnt):
        if r.read_array_header() != 2:
            raise ValueError("msgpack: record must be a 2-array")
        doc_id = r.read_uint()
        if doc_id <= prev:
            raise ValueError("msgpack: doc_ids must be strictly rising")
        prev = doc_id
        recs.append((doc_id, r.read_str()))
    if r.off != len(blob):
        raise ValueError("msgpack: trailing bytes after container")
    return {"source": source, "n": n, "records": recs}
