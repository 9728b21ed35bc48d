"""WARC (ISO 28500) record walk — the CommonCrawl ingestion format.

Large-scale text pipelines start from WARC/WET files: WARC-framed
records (a version line, named header fields, Content-Length byte
framing, a CRLF CRLF trailer), each record individually gzipped and
the members concatenated so readers can seek to any record boundary
without decompressing the whole file.  Both halves are implementable
exactly with the standard library:

- ``build_warc_gz`` serializes records to spec-conformant WARC/1.0
  bytes and gzips each record as its OWN gzip member
  (``zlib.compressobj(..., wbits=31)`` writes MTIME=0/OS=255 headers,
  so identical inputs give identical bytes — the determinism the
  round-trip oracle needs).
- ``read_warc_gz`` splits the multi-member gzip stream back apart
  (``decompressobj.unused_data`` loop), then parses each record
  strictly: version line, header fields up to the blank line,
  EXACTLY Content-Length block bytes, mandatory CRLF CRLF trailer.
  Any framing violation raises — a torn record fails loudly at read
  time, the format's actual contract.

Scale: WARC members are the scheduling unit of a crawl corpus — a
reader fans out per (file, member offset) and each member decodes
map-side from its own gzip header, no cross-record state.  The
declared ``src_warc_roundtrip`` packs per-source WET-style files
(warcinfo + one conversion record per document) inside
``applyInPandas``, re-reads them with full validation, and emits a
byte-accounting manifest whose oracle recomputes the framing
arithmetic closed-form.
"""

from __future__ import annotations

import hashlib
import zlib

WARC_DATE = "2026-01-01T00:00:00Z"
URI_PREFIX = "https://corpus.example/"
WARCINFO_FIELDS = (
    "software: duckdb-title-mapper-spark/0.1\r\n"
    "format: WARC File Format 1.0\r\n"
)


def _record_id(key: str) -> str:
    return f"<urn:md5:{hashlib.md5(key.encode()).hexdigest()}>"


def _record_bytes(rtype: str, rec_id: str, content_type: str,
                  block: bytes, extra_headers: tuple = ()) -> bytes:
    head = [
        "WARC/1.0",
        f"WARC-Type: {rtype}",
        f"WARC-Record-ID: {rec_id}",
        f"WARC-Date: {WARC_DATE}",
        *extra_headers,
        f"Content-Type: {content_type}",
        f"Content-Length: {len(block)}",
    ]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + block + b"\r\n\r\n"


def build_warcinfo(source: str) -> bytes:
    """The per-file warcinfo record a WET file leads with."""
    return _record_bytes(
        "warcinfo", _record_id(source), "application/warc-fields",
        WARCINFO_FIELDS.encode())


def build_conversion(source: str, doc_id: int, text: str) -> bytes:
    """A WET-style conversion record: extracted text as the block,
    target URI derived from (source, doc_id)."""
    return _record_bytes(
        "conversion", _record_id(f"{source}/{doc_id}"), "text/plain",
        text.encode(),
        (f"WARC-Target-URI: {URI_PREFIX}{source}/{doc_id}",))


def gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member (MTIME=0, OS=255 — what
    wbits=31 compressobj writes)."""
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    return co.compress(raw) + co.flush()


def build_warc_gz(records: list[bytes]) -> bytes:
    """Concatenate per-record gzip members — the CommonCrawl layout
    (readers seek to member offsets and decompress one record)."""
    return b"".join(gzip_member(r) for r in records)


def split_gzip_members(payload: bytes) -> list[bytes]:
    """Split a multi-member gzip stream into the decompressed bytes of
    each member.  Raises ValueError on trailing garbage or a torn
    member."""
    out = []
    buf = payload
    while buf:
        d = zlib.decompressobj(31)
        try:
            raw = d.decompress(buf)
        except zlib.error as exc:
            raise ValueError(f"bad gzip member: {exc}")
        if not d.eof:
            raise ValueError("torn gzip member (stream ended mid-record)")
        out.append(raw + d.flush())
        buf = d.unused_data
    return out


def parse_warc_record(raw: bytes) -> dict:
    """Strictly parse one WARC/1.0 record: returns {type, id, date,
    uri, content_type, block}.  Raises ValueError on any framing or
    mandatory-header violation (ISO 28500 §4: version line, named
    fields, Content-Length block framing, CRLF CRLF trailer)."""
    sep = raw.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("WARC record missing header terminator")
    head_lines = raw[:sep].decode("utf-8").split("\r\n")
    if head_lines[0] != "WARC/1.0":
        raise ValueError(f"bad WARC version line {head_lines[0]!r}")
    fields = {}
    for line in head_lines[1:]:
        k, _, v = line.partition(": ")
        if not _:
            raise ValueError(f"malformed WARC header line {line!r}")
        fields[k] = v
    for req in ("WARC-Type", "WARC-Record-ID", "WARC-Date",
                "Content-Length"):
        if req not in fields:
            raise ValueError(f"WARC record missing {req}")
    n = int(fields["Content-Length"])
    block_start = sep + 4
    block = raw[block_start:block_start + n]
    if len(block) != n:
        raise ValueError("WARC block shorter than Content-Length")
    if raw[block_start + n:] != b"\r\n\r\n":
        raise ValueError("WARC record missing CRLF CRLF trailer")
    return {
        "type": fields["WARC-Type"],
        "id": fields["WARC-Record-ID"],
        "date": fields["WARC-Date"],
        "uri": fields.get("WARC-Target-URI"),
        "content_type": fields.get("Content-Type"),
        "block": block,
    }


def read_warc_gz(payload: bytes) -> list[dict]:
    """Walk a gzipped WARC file back into parsed records (one gzip
    member per record, every record strictly validated)."""
    return [parse_warc_record(m) for m in split_gzip_members(payload)]


# Closed-form per-record serialized sizes (the oracle recomputes these
# in SQL, so the constants are shared from here):
#   fixed parts of a conversion record = every byte except
#   len(source) + len(str(doc_id)) [twice: record-id key is hashed to
#   a fixed 32-hex id, but the URI carries source/doc_id verbatim],
#   len(str(content_length)) and the block itself.
_FIXED_CONV = len(_record_bytes(
    "conversion", _record_id("k"), "text/plain", b"",
    (f"WARC-Target-URI: {URI_PREFIX}/",))) - len("0")
# ^ built with empty source/doc_id strings and an empty block; the
#   Content-Length digits for an empty block are "0" (1 char), which
#   the closed form counts separately, hence the - len("0").
# warcinfo size is CONSTANT: the source appears only through the
# fixed-32-hex md5 record id, and the block is the fixed
# WARCINFO_FIELDS text.
_FIXED_INFO = len(build_warcinfo("any"))

CONV_FIXED_BYTES = _FIXED_CONV
INFO_BYTES = _FIXED_INFO
