"""Avro Object Container File walk — the Kafka-pipeline batch format.

Implemented exactly from the public Avro 1.11 spec with the standard
library (the ``pbwire.py``/``warc.py`` discipline): longs are
zigzag-encoded LEB128 varints, strings/bytes are length-prefixed,
records concatenate their fields in schema order; the container file
is the 4-byte magic ``Obj\\x01``, a metadata map (``avro.schema``
JSON + ``avro.codec``), a 16-byte sync marker, then data blocks of
``(record count, byte size, records, sync marker)``.

``build_avro_container`` serializes deterministically (canonical
schema JSON, md5-derived sync marker) and ``read_avro_container``
re-walks the file validating the whole framing contract: magic,
map terminator, declared block sizes, per-block sync markers, and
exact EOF.  At 100 TB the reader's unit is the block (sync markers
let a scanner resync mid-file), so ingestion fans out per
(file, block) — the same map-side shape as the WARC and TFRecord
walks.
"""

from __future__ import annotations

import hashlib
import json
import struct

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
    ],
}
SCHEMA_JSON = json.dumps(SCHEMA, separators=(",", ":"))
CODEC = "null"
MAGIC = b"Obj\x01"


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_long(v: int) -> bytes:
    return write_varint(zigzag(v))


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated Avro varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return unzigzag(u), pos
        shift += 7
        if shift > 70:
            raise ValueError("Avro varint too long")


def varint_len_nonneg(v: int) -> int:
    """Encoded length of a NONNEGATIVE long (zigzag doubles it) —
    the closed form the SQL oracle ladders."""
    u = v << 1
    n = 1
    while u >= 0x80:
        u >>= 7
        n += 1
    return n


def _record_bytes(doc_id: int, text: str) -> bytes:
    t = text.encode()
    return write_long(doc_id) + write_long(len(t)) + t


def _header(sync: bytes) -> bytes:
    meta = [("avro.schema", SCHEMA_JSON.encode()),
            ("avro.codec", CODEC.encode())]
    out = bytearray(MAGIC)
    out += write_long(len(meta))
    for k, v in meta:
        kb = k.encode()
        out += write_long(len(kb)) + kb
        out += write_long(len(v)) + v
    out += write_long(0)  # map terminator
    out += sync
    return bytes(out)


HEADER_BYTES = len(_header(b"\x00" * 16))


def build_avro_container(source: str,
                         records: list[tuple[int, str]],
                         block_size: int = 32) -> bytes:
    """One container file: header + ceil(n/block_size) data blocks,
    sync marker = md5(source)."""
    sync = hashlib.md5(source.encode()).digest()
    out = bytearray(_header(sync))
    for s in range(0, len(records), block_size):
        chunk = records[s:s + block_size]
        body = b"".join(_record_bytes(d, t) for d, t in chunk)
        out += write_long(len(chunk))
        out += write_long(len(body))
        out += body
        out += sync
    return bytes(out)


def read_avro_container(payload: bytes) -> dict:
    """Walk a container file back, VALIDATING magic, metadata map
    framing, declared block sizes, per-block sync markers, and exact
    EOF.  Returns {schema, codec, records: [(doc_id, text)],
    n_blocks}."""
    if payload[:4] != MAGIC:
        raise ValueError("bad Avro magic")
    pos = 4
    meta = {}
    n, pos = read_long(payload, pos)
    while n:
        if n < 0:
            raise ValueError("negative Avro map count")
        for _ in range(n):
            kl, pos = read_long(payload, pos)
            k = payload[pos:pos + kl].decode()
            pos += kl
            vl, pos = read_long(payload, pos)
            meta[k] = payload[pos:pos + vl]
            pos += vl
        n, pos = read_long(payload, pos)
    sync = payload[pos:pos + 16]
    pos += 16
    if len(sync) != 16:
        raise ValueError("truncated Avro sync marker")
    if meta.get("avro.codec", b"null") != b"null":
        raise ValueError("only the null codec is implemented")
    records = []
    n_blocks = 0
    while pos < len(payload):
        cnt, pos = read_long(payload, pos)
        size, pos = read_long(payload, pos)
        end = pos + size
        if end + 16 > len(payload):
            raise ValueError("Avro block overruns file")
        for _ in range(cnt):
            did, pos = read_long(payload, pos)
            tl, pos = read_long(payload, pos)
            records.append((did, payload[pos:pos + tl].decode()))
            pos += tl
        if pos != end:
            raise ValueError("Avro block size mismatch")
        if payload[pos:pos + 16] != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
        n_blocks += 1
    return {
        "schema": meta["avro.schema"].decode(),
        "codec": meta.get("avro.codec", b"null").decode(),
        "records": records,
        "n_blocks": n_blocks,
    }
