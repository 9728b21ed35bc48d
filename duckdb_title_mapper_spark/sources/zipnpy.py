"""ZIP archive + NumPy ``.npy`` member walk — the archival container
(model checkpoints as ``.npz``, office payloads, dataset bundles),
written and re-read FROM SCRATCH.

Implemented from the public PKWARE APPNOTE (ZIP file format
specification) and the public NumPy ``.npy`` format spec (v1.0) with
the standard library only: STORED (uncompressed) members with real
CRC-32 (``zlib.crc32``), local file headers, the central directory,
and the end-of-central-directory record, all cross-validated on
read-back; the ``.npy`` member carries a genuine little-endian int64
array with the spec's 64-byte-aligned header.  ``zipfile`` and
``numpy`` appear only in tests as the AUTHORITY check (both must
parse our bytes).

Byte accounting is closed-form — what the SQL oracle ladders:

  local header   = 30 + len(name) + len(data)
  central entry  = 46 + len(name)
  EOCD           = 22
  npy data       = 10 + header_len + 8 * n,  header_len the smallest
                   value making (10 + header_len) % 64 == 0 with room
                   for the dict text + newline

Fixed DOS timestamp (2020-01-01 00:00:00) keeps the builder
deterministic.

Reference scope: the reference engine has no container-format surface
(src/lib.rs:1-86); ZIP completes the ingestion family's archive axis
beside the tar-based WebDataset shards.
"""

from __future__ import annotations

import struct
import zlib

# DOS date/time for 2020-01-01 00:00:00: yyyyyyym mmmddddd / hhhhhmmm mmmsssss
_DOS_DATE = ((2020 - 1980) << 9) | (1 << 5) | 1
_DOS_TIME = 0
NPY_NAME = "doc_ids.npy"


def npy_int64(values: list[int]) -> bytes:
    """NumPy .npy v1.0: magic, uint16 header length, dict header
    padded with spaces + newline to 64-byte alignment, raw LE int64."""
    head = ("{'descr': '<i8', 'fortran_order': False, "
            f"'shape': ({len(values)},), }}")
    hl = ((10 + len(head) + 1 + 63) // 64) * 64 - 10
    head = head + " " * (hl - len(head) - 1) + "\n"
    return (b"\x93NUMPY\x01\x00" + struct.pack("<H", hl)
            + head.encode("latin-1")
            + struct.pack(f"<{len(values)}q", *values))


NPY_HEAD_BASE = len("{'descr': '<i8', 'fortran_order': False, "
                    "'shape': (,), }")


def npy_bytes_closed_form(n: int, n_digits: int) -> int:
    """Total .npy size for an n-element array whose length prints
    with ``n_digits`` digits — the identity the SQL oracle ladders."""
    hl = ((10 + NPY_HEAD_BASE + n_digits + 1 + 63) // 64) * 64 - 10
    return 10 + hl + 8 * n


def _local_header(name: bytes, data: bytes) -> bytes:
    return struct.pack(
        "<4sHHHHHIIIHH", b"PK\x03\x04", 20, 0, 0,
        _DOS_TIME, _DOS_DATE, zlib.crc32(data),
        len(data), len(data), len(name), 0) + name


def _central_entry(name: bytes, data: bytes, offset: int) -> bytes:
    return struct.pack(
        "<4sHHHHHHIIIHHHHHII", b"PK\x01\x02", 20, 20, 0, 0,
        _DOS_TIME, _DOS_DATE, zlib.crc32(data),
        len(data), len(data), len(name), 0, 0, 0, 0, 0, offset) + name


def build_zip(members: list[tuple[str, bytes]]) -> bytes:
    if len(members) > 0xFFFF:
        raise ValueError(
            f"ZIP64 not implemented: {len(members)} members exceeds the "
            "classic EOCD's 16-bit count")
    out = bytearray()
    entries = bytearray()
    for name_s, data in members:
        name = name_s.encode("latin-1")
        entries += _central_entry(name, data, len(out))
        out += _local_header(name, data) + data
    cd_off = len(out)
    if cd_off > 0xFFFFFFFF:
        raise ValueError(
            "ZIP64 not implemented: central-directory offset "
            f"{cd_off} exceeds the classic EOCD's 32-bit field")
    out += entries
    out += struct.pack(
        "<4sHHHHIIH", b"PK\x05\x06", 0, 0, len(members), len(members),
        len(entries), cd_off, 0)
    return bytes(out)


def read_zip(payload: bytes) -> dict:
    """Walk the archive, validating local-header signatures, STORED
    method, CRC-32 of every member, the central directory's agreement
    with each local header (name, crc, sizes, offset), and the EOCD
    counts/size/offset; returns the members plus byte accounting."""
    eocd = payload[-22:]
    if eocd[:4] != b"PK\x05\x06":
        raise ValueError("bad ZIP end-of-central-directory signature")
    (_sig, _d0, _d1, n_here, n_total, cd_size, cd_off,
     clen) = struct.unpack("<4sHHHHIIH", eocd)
    if clen != 0 or n_here != n_total:
        raise ValueError("unexpected ZIP EOCD fields")
    if cd_off + cd_size + 22 != len(payload):
        raise ValueError("ZIP length accounting mismatch")
    # walk the central directory
    central = []
    p = cd_off
    for _ in range(n_total):
        sig = payload[p:p + 4]
        if sig != b"PK\x01\x02":
            raise ValueError("bad ZIP central-entry signature")
        (crc, csize, usize, nlen, elen, comlen) = struct.unpack(
            "<IIIHHH", payload[p + 16:p + 34])
        off = struct.unpack("<I", payload[p + 42:p + 46])[0]
        name = payload[p + 46:p + 46 + nlen].decode("latin-1")
        central.append((name, crc, csize, usize, off))
        p += 46 + nlen + elen + comlen
    if p != cd_off + cd_size:
        raise ValueError("ZIP central-directory size mismatch")
    members = []
    member_bytes = 0
    for name, crc, csize, usize, off in central:
        if payload[off:off + 4] != b"PK\x03\x04":
            raise ValueError("bad ZIP local-header signature")
        (method,) = struct.unpack("<H", payload[off + 8:off + 10])
        if method != 0:
            raise ValueError("only STORED members are implemented")
        (lcrc, lcs, lus, nlen, elen) = struct.unpack(
            "<IIIHH", payload[off + 14:off + 30])
        lname = payload[off + 30:off + 30 + nlen].decode("latin-1")
        if (lname, lcrc, lcs, lus) != (name, crc, csize, usize):
            raise ValueError("central/local header disagreement")
        data = payload[off + 30 + nlen:off + 30 + nlen + csize]
        if zlib.crc32(data) != crc:
            raise ValueError("ZIP member CRC mismatch")
        members.append((name, data))
        member_bytes += len(data)
    return {"members": members, "n_members": n_total,
            "member_bytes": member_bytes, "file_bytes": len(payload)}


def read_npy_int64(data: bytes) -> list[int]:
    if data[:8] != b"\x93NUMPY\x01\x00":
        raise ValueError("bad .npy magic/version")
    hl = struct.unpack("<H", data[8:10])[0]
    if (10 + hl) % 64 != 0:
        raise ValueError(".npy header not 64-byte aligned")
    head = data[10:10 + hl].decode("latin-1")
    if "'descr': '<i8'" not in head:
        raise ValueError("only <i8 .npy payloads are implemented")
    n = (len(data) - 10 - hl) // 8
    return list(struct.unpack(f"<{n}q", data[10 + hl:]))
