"""Training-data shard container formats: WebDataset tar and TFRecord.

The two container formats large training pipelines actually ship
samples in, both implementable exactly with the standard library:

- **WebDataset** (tar shards): samples are adjacent tar members sharing
  a basename stem (``000017.txt``, ``000017.json``, ...); a dataloader
  streams members sequentially.  ``build_tar_shard`` packs documents
  into genuine POSIX tar bytes (stdlib ``tarfile``) and
  ``read_tar_shard`` walks them back — the shard bytes are a normal
  ``binary`` column, so sharding composes with every operator here
  (the manifest queries, the dedup family, the codec decoders).
- **TFRecord**: length-framed records with MASKED CRC32C integrity
  checksums.  CRC32C (Castagnoli) is not ``zlib.crc32`` — the
  polynomial differs — so ``_crc32c`` implements it from the
  0x82F63B78 table and applies TensorFlow's rotation mask.  Encode and
  decode verify every length and data checksum, which is the actual
  contract of the format (a flipped bit fails loudly at read time, not
  at training time).

Scale: shards are the I/O unit of a 100 TB corpus — pack ~10k docs per
shard, store shard bytes (or files) and schedule mapInPandas readers
per shard; both builders/readers here are map-side-only over Arrow
binary batches, no shuffle.
"""

from __future__ import annotations

import io
import struct
import tarfile


def build_tar_shard(members: list[tuple[str, bytes]]) -> bytes:
    """Pack (name, payload) members into genuine uncompressed POSIX tar
    bytes — a WebDataset shard any tar tool opens.  Deterministic:
    fixed mtime/uid/gid so identical inputs give identical bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def read_tar_shard(shard: bytes) -> list[tuple[str, bytes]]:
    """Walk a tar shard back into (name, payload) members in archive
    order.  Raises ValueError on malformed archives."""
    try:
        with tarfile.open(fileobj=io.BytesIO(shard), mode="r:") as tf:
            out = []
            for info in tf:
                if not info.isfile():
                    continue
                f = tf.extractfile(info)
                out.append((info.name, f.read() if f else b""))
            return out
    except tarfile.TarError as exc:
        raise ValueError(f"malformed tar shard: {exc}")


_CRC32C_TABLE = None


def _crc32c_table():
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            table.append(c)
        _CRC32C_TABLE = table
    return _CRC32C_TABLE


def _crc32c(data: bytes) -> int:
    """CRC32C (Castagnoli, polynomial 0x1EDC6F41 reflected to
    0x82F63B78) — the checksum TFRecord requires; NOT zlib.crc32."""
    table = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    """TensorFlow's masked CRC: rotate right 15 and add a constant."""
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecords(records: list[bytes]) -> bytes:
    """Length-framed TFRecord stream: per record, u64le length +
    masked-CRC32C(length) + data + masked-CRC32C(data)."""
    out = bytearray()
    for rec in records:
        length = struct.pack("<Q", len(rec))
        out += length
        out += struct.pack("<I", _masked_crc(length))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return bytes(out)


def read_tfrecords(payload: bytes) -> list[bytes]:
    """Parse a TFRecord stream, VERIFYING both checksums per record —
    the format's integrity contract.  Raises ValueError on any
    mismatch or truncation."""
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        if pos + 12 > n:
            raise ValueError("truncated TFRecord length frame")
        length_bytes = payload[pos : pos + 8]
        (length,) = struct.unpack("<Q", length_bytes)
        (lcrc,) = struct.unpack_from("<I", payload, pos + 8)
        if _masked_crc(length_bytes) != lcrc:
            raise ValueError("TFRecord length checksum mismatch")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError("truncated TFRecord data frame")
        data = payload[pos : pos + length]
        (dcrc,) = struct.unpack_from("<I", payload, pos + length)
        if _masked_crc(data) != dcrc:
            raise ValueError("TFRecord data checksum mismatch")
        out.append(data)
        pos += length + 4
    return out
