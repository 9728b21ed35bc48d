"""Shard container formats (sources/shards.py, r6d): WebDataset tar
and TFRecord — known-vector CRC32C, deterministic bytes, round trips,
and loud corruption/truncation failures."""

import io
import struct
import tarfile

import pytest

from duckdb_title_mapper_spark.sources.shards import (
    _crc32c,
    _masked_crc,
    build_tar_shard,
    read_tar_shard,
    read_tfrecords,
    write_tfrecords,
)


def test_crc32c_known_vectors():
    # the canonical Castagnoli check value (RFC 3720 appendix / iSCSI)
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    # 32 zero bytes — another published vector
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    # and it must NOT be plain CRC32
    import zlib

    assert _crc32c(b"123456789") != zlib.crc32(b"123456789")


def test_masked_crc_is_involution_free_rotation():
    # mask formula: ((crc >> 15) | (crc << 17)) + 0xA282EAD8 (mod 2^32)
    crc = _crc32c(b"data")
    want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b"data") == want


def test_tar_shard_roundtrip_and_determinism():
    members = [
        ("000017.txt", b"hello world"),
        ("000017.json", b'{"label": 3}'),
        ("000018.txt", b"x" * 513),
        ("000019.txt", b""),
    ]
    shard = build_tar_shard(members)
    assert read_tar_shard(shard) == members
    assert build_tar_shard(members) == shard  # byte-deterministic
    # stdlib tarfile itself (an independent reader path) agrees
    with tarfile.open(fileobj=io.BytesIO(shard)) as tf:
        assert tf.getnames() == [n for n, _p in members]


def test_tar_shard_malformed_raises():
    with pytest.raises(ValueError):
        read_tar_shard(b"\x01" * 1024)


def test_tfrecord_roundtrip_and_framing_arithmetic():
    recs = [b"abc", b"", b"z" * 1000, bytes(range(256))]
    stream = write_tfrecords(recs)
    assert read_tfrecords(stream) == recs
    # framing contract the SQL oracle uses: 16 bytes per record
    assert len(stream) == sum(len(r) for r in recs) + 16 * len(recs)


def test_tfrecord_corruption_detected():
    stream = bytearray(write_tfrecords([b"hello", b"world"]))
    # flip a payload bit -> data CRC must catch it
    stream[13] ^= 0x01
    with pytest.raises(ValueError):
        read_tfrecords(bytes(stream))
    # corrupt a length frame -> length CRC must catch it
    stream2 = bytearray(write_tfrecords([b"hello"]))
    stream2[0] ^= 0x01
    with pytest.raises(ValueError):
        read_tfrecords(bytes(stream2))
    # truncation
    good = write_tfrecords([b"hello"])
    with pytest.raises(ValueError):
        read_tfrecords(good[:-2])


def test_tfrecord_length_frame_layout():
    stream = write_tfrecords([b"abcd"])
    (length,) = struct.unpack_from("<Q", stream, 0)
    assert length == 4
    assert stream[12:16] == b"abcd"
