"""Arrow IPC *file* format (Feather V2) walk — the in-memory-analytics
interchange format, written and re-read FROM SCRATCH.

Implemented from the public Arrow columnar spec (format/Message.fbs,
format/Schema.fbs, format/File.fbs and the "IPC File Format" document)
with the standard library only — including the flatbuffer layer itself
(`_FB` builder / `_fb_*` readers below implement the flatbuffers wire
format: root uoffset, vtable-prefixed tables, length-prefixed vectors,
inline structs).  Nothing is delegated to the `pyarrow` library in the
query path; pyarrow appears only in tests as the AUTHORITY check (it
must parse our bytes, we must parse its).

File layout (all validated on read-back):

  "ARROW1\\0\\0"                                    -- magic + pad
  <Schema message>                                  -- encapsulated
  <RecordBatch message + body> x n_batches
  0xFFFFFFFF 0x00000000                             -- end-of-stream
  <Footer flatbuffer> <int32 footer len> "ARROW1"

Each encapsulated message = 0xFFFFFFFF continuation + int32 metadata
length + flatbuffer (padded to 8).  A record-batch body is the buffer
concatenation, each 8-aligned: for the (doc_id int64, text utf8)
schema that is [empty validity][id data][empty validity][int32
offsets][utf8 data] — byte accounting is closed-form, which is what
the SQL oracle ladders (`pad8(8n) + pad8(4(n+1)) + pad8(text_bytes)`).

The flatbuffer builder is deterministic (fields laid out by descending
size then id, vtables never deduped), so the schema/batch metadata
lengths and the footer length are exact compile-time constants of this
module — computed once at import by building probes, the same pattern
as avro.HEADER_BYTES.

Reference scope: the reference engine has no container-format surface
(src/lib.rs:1-86); this completes the ingestion-format family
(WARC / safetensors / Avro OCF / TFRecord / protobuf / WebDataset /
parquet-footer) with the one mainstream interchange format it lacked
(VERDICT r11 #6).
"""

from __future__ import annotations

import struct

MAGIC = b"ARROW1"
BATCH_ROWS = 32
# enum values from the public .fbs definitions
_V5 = 4                      # MetadataVersion.V5
_HDR_SCHEMA, _HDR_BATCH = 1, 3   # MessageHeader union
_TYPE_INT, _TYPE_UTF8 = 2, 5     # Type union


def _pad8(n: int) -> int:
    return (n + 7) - ((n + 7) % 8)


# ---------------------------------------------------------------------
# minimal flatbuffer BUILDER (back-to-front, offsets measured from the
# buffer end so addresses resolve without knowing the final size;
# final buffer is 8-aligned, every table/struct-vector element lands
# 8-aligned, strings/offset-vectors 4-aligned)
# ---------------------------------------------------------------------

_SIZES = {"u8": 1, "bool": 1, "i16": 2, "i32": 4, "u32": 4,
          "i64": 8, "off": 4}
_FMTS = {"u8": "<B", "bool": "<B", "i16": "<h", "i32": "<i",
         "u32": "<I", "i64": "<q", "off": "<I"}


class _FB:
    def __init__(self):
        self.chunks: list[bytes] = []  # reverse emission order
        self.size = 0

    def _prepend(self, b: bytes):
        self.chunks.append(bytes(b))
        self.size += len(b)

    def _emit(self, payload: bytes, residue: int, align: int) -> int:
        """Prepend payload padded so its start position-from-end is
        ``residue`` mod ``align``; returns that position."""
        pad = (residue - (self.size + len(payload))) % align
        if pad:
            self._prepend(b"\x00" * pad)
        self._prepend(payload)
        return self.size

    def string(self, s: str) -> int:
        b = s.encode()
        return self._emit(struct.pack("<I", len(b)) + b + b"\x00", 0, 4)

    def vector_structs(self, packed: bytes, count: int) -> int:
        # elements 8-aligned => the u32 length prefix sits at 4 mod 8
        return self._emit(struct.pack("<I", count) + packed, 4, 8)

    def vector_offsets(self, targets: list[int]) -> int:
        n = len(targets)
        payload = bytearray(struct.pack("<I", n)) + b"\x00" * (4 * n)
        pad = (0 - (self.size + len(payload))) % 4
        pos = self.size + pad + len(payload)
        for i, tgt in enumerate(targets):
            elem_pos = pos - 4 - 4 * i
            struct.pack_into("<I", payload, 4 + 4 * i, elem_pos - tgt)
        if pad:
            self._prepend(b"\x00" * pad)
        self._prepend(bytes(payload))
        return self.size

    def table(self, fields: list[tuple[int, str, int]]) -> int:
        """fields = [(slot id, kind, value)]; kind "off" values are
        positions returned by earlier emits.  Layout: descending size
        then id (deterministic); vtable immediately below the table."""
        order = sorted(fields, key=lambda f: (-_SIZES[f[1]], f[0]))
        max_id = max((f[0] for f in fields), default=-1)
        cur, offs = 4, {}
        for fid, kind, _val in order:
            sz = _SIZES[kind]
            cur = (cur + sz - 1) // sz * sz
            offs[fid] = cur
            cur += sz
        tbl_size = cur
        vt = struct.pack("<HH", 4 + 2 * (max_id + 1), tbl_size)
        vt += b"".join(struct.pack("<H", offs.get(i, 0))
                       for i in range(max_id + 1))
        tbl = bytearray(tbl_size)
        struct.pack_into("<i", tbl, 0, len(vt))  # soffset to the vtable
        # table start must be 8-aligned: its pos-from-end is
        # (blob pos) - len(vt)
        pad = (0 - (self.size + tbl_size)) % 8
        tbl_pos = self.size + pad + tbl_size
        for fid, kind, val in fields:
            o = offs[fid]
            if kind == "off":
                val = (tbl_pos - o) - val  # uoffset to an earlier emit
            struct.pack_into(_FMTS[kind], tbl, o, val)
        if pad:
            self._prepend(b"\x00" * pad)
        self._prepend(vt + bytes(tbl))
        return tbl_pos

    def finish(self, root_pos: int) -> bytes:
        pad = (0 - (self.size + 4)) % 8  # total must stay 8-aligned
        if pad:
            self._prepend(b"\x00" * pad)
        root_field_pos = self.size + 4
        self._prepend(struct.pack("<I", root_field_pos - root_pos))
        return b"".join(reversed(self.chunks))


# ---------------------------------------------------------------------
# Arrow metadata builders (Message.fbs / Schema.fbs / File.fbs tables)
# ---------------------------------------------------------------------


def _schema_pos(fb: _FB) -> int:
    int64 = fb.table([(0, "i32", 64), (1, "bool", 1)])  # Int{64,signed}
    name = fb.string("doc_id")
    f_id = fb.table([(0, "off", name), (1, "bool", 1),
                     (2, "u8", _TYPE_INT), (3, "off", int64)])
    utf8 = fb.table([])
    name = fb.string("text")
    f_tx = fb.table([(0, "off", name), (1, "bool", 1),
                     (2, "u8", _TYPE_UTF8), (3, "off", utf8)])
    fields = fb.vector_offsets([f_id, f_tx])
    return fb.table([(0, "i16", 0), (1, "off", fields)])


def schema_message() -> bytes:
    fb = _FB()
    sch = _schema_pos(fb)
    msg = fb.table([(0, "i16", _V5), (1, "u8", _HDR_SCHEMA),
                    (2, "off", sch), (3, "i64", 0)])
    return fb.finish(msg)


def batch_message(n: int, body_len: int,
                  buffers: list[tuple[int, int]]) -> bytes:
    fb = _FB()
    nodes = fb.vector_structs(struct.pack("<qq", n, 0) * 2, 2)
    bufs = fb.vector_structs(
        b"".join(struct.pack("<qq", o, ln) for o, ln in buffers),
        len(buffers))
    rb = fb.table([(0, "i64", n), (1, "off", nodes), (2, "off", bufs)])
    msg = fb.table([(0, "i16", _V5), (1, "u8", _HDR_BATCH),
                    (2, "off", rb), (3, "i64", body_len)])
    return fb.finish(msg)


def footer_bytes(blocks: list[tuple[int, int, int]]) -> bytes:
    """Footer{version, schema, dictionaries[], recordBatches[Block]};
    Block struct = (offset i64, metaDataLength i32, 4 pad, body i64)."""
    fb = _FB()
    sch = _schema_pos(fb)
    dicts = fb.vector_structs(b"", 0)
    rbs = fb.vector_structs(
        b"".join(struct.pack("<qi4xq", o, m, b) for o, m, b in blocks),
        len(blocks))
    ftr = fb.table([(0, "i16", _V5), (1, "off", sch),
                    (2, "off", dicts), (3, "off", rbs)])
    return fb.finish(ftr)


def _encap(meta: bytes) -> bytes:
    assert len(meta) % 8 == 0
    return b"\xff\xff\xff\xff" + struct.pack("<i", len(meta)) + meta


def _batch_body(ids: list[int], texts: list[bytes]):
    n = len(ids)
    idbuf = struct.pack(f"<{n}q", *ids)
    offs, cum = [0], 0
    for t in texts:
        cum += len(t)
        offs.append(cum)
    offbuf = struct.pack(f"<{n + 1}i", *offs)
    databuf = b"".join(texts)
    body = bytearray()
    buffers = [(0, 0)]  # id validity: empty (null count 0)
    for raw in (idbuf, offbuf, databuf):
        if raw is offbuf:
            buffers.append((len(body), 0))  # text validity: empty
        buffers.append((len(body), len(raw)))
        body += raw + b"\x00" * ((-len(raw)) % 8)
    return bytes(body), buffers


# metadata sizes are deterministic constants of this builder (the
# avro.HEADER_BYTES pattern); footer length is affine in block count
SCHEMA_META = len(schema_message())
BATCH_META = len(batch_message(1, 0, [(0, 0)] * 5))
FOOTER_BASE = len(footer_bytes([]))
BLOCK_BYTES = 24


def build_arrow_ipc(records: list[tuple[int, str]],
                    batch_rows: int = BATCH_ROWS) -> bytes:
    out = bytearray(MAGIC + b"\x00\x00")
    out += _encap(schema_message())
    blocks = []
    for s in range(0, len(records), batch_rows):
        chunk = records[s:s + batch_rows]
        body, buffers = _batch_body(
            [d for d, _ in chunk], [t.encode() for _, t in chunk])
        meta = batch_message(len(chunk), len(body), buffers)
        blocks.append((len(out), 8 + len(meta), len(body)))
        out += _encap(meta) + body
    out += b"\xff\xff\xff\xff\x00\x00\x00\x00"  # end-of-stream
    ftr = footer_bytes(blocks)
    out += ftr + struct.pack("<i", len(ftr)) + MAGIC
    return bytes(out)


# ---------------------------------------------------------------------
# minimal flatbuffer READER (generic: follows vtables, so it parses
# pyarrow-written metadata too, not just our own)
# ---------------------------------------------------------------------


def _fb_root(buf: bytes) -> int:
    return struct.unpack_from("<I", buf, 0)[0]


def _fb_field(buf: bytes, tbl: int, fid: int) -> int | None:
    soff = struct.unpack_from("<i", buf, tbl)[0]
    vt = tbl - soff
    vt_size = struct.unpack_from("<H", buf, vt)[0]
    if 4 + 2 * fid >= vt_size:
        return None
    o = struct.unpack_from("<H", buf, vt + 4 + 2 * fid)[0]
    return tbl + o if o else None


def _fb_scalar(buf: bytes, tbl: int, fid: int, fmt: str, default=0):
    p = _fb_field(buf, tbl, fid)
    return default if p is None else struct.unpack_from(fmt, buf, p)[0]


def _fb_offset(buf: bytes, tbl: int, fid: int) -> int | None:
    p = _fb_field(buf, tbl, fid)
    if p is None:
        return None
    return p + struct.unpack_from("<I", buf, p)[0]


def _fb_vector(buf: bytes, tbl: int, fid: int) -> tuple[int, int]:
    v = _fb_offset(buf, tbl, fid)
    if v is None:
        return 0, 0
    return struct.unpack_from("<I", buf, v)[0], v + 4


def read_arrow_ipc(payload: bytes) -> dict:
    """Walk an Arrow IPC FILE, validating both magics, the footer
    length, every block's continuation + metadata length + declared
    bodyLength, the end-of-stream marker, and per-batch node/buffer
    counts; returns the decoded records plus byte accounting."""
    if payload[:8] != MAGIC + b"\x00\x00":
        raise ValueError("bad Arrow file head magic")
    if payload[-6:] != MAGIC:
        raise ValueError("bad Arrow file tail magic")
    ftr_len = struct.unpack_from("<i", payload, len(payload) - 10)[0]
    ftr_start = len(payload) - 10 - ftr_len
    if ftr_start < 8:
        raise ValueError("Arrow footer overruns file")
    ftr = payload[ftr_start:len(payload) - 10]
    f_tbl = _fb_root(ftr)
    n_blocks, bpos = _fb_vector(ftr, f_tbl, 3)
    # schema message must open the stream
    if payload[8:12] != b"\xff\xff\xff\xff":
        raise ValueError("missing continuation before schema message")
    smeta_len = struct.unpack_from("<i", payload, 12)[0]
    smeta = payload[16:16 + smeta_len]
    if _fb_scalar(smeta, _fb_root(smeta), 1, "<B") != _HDR_SCHEMA:
        raise ValueError("first message is not a Schema")
    records: list[tuple[int, str]] = []
    body_bytes = 0
    end_of_batches = 16 + smeta_len
    for b in range(n_blocks):
        off, mlen, blen = struct.unpack_from("<qi4xq", ftr,
                                             bpos + BLOCK_BYTES * b)
        if payload[off:off + 4] != b"\xff\xff\xff\xff":
            raise ValueError("missing continuation at block offset")
        meta_len = struct.unpack_from("<i", payload, off + 4)[0]
        if 8 + meta_len != mlen:
            raise ValueError("footer metaDataLength mismatch")
        meta = payload[off + 8:off + 8 + meta_len]
        m_tbl = _fb_root(meta)
        if _fb_scalar(meta, m_tbl, 1, "<B") != _HDR_BATCH:
            raise ValueError("block does not hold a RecordBatch")
        if _fb_scalar(meta, m_tbl, 3, "<q") != blen:
            raise ValueError("message bodyLength != footer bodyLength")
        rb = _fb_offset(meta, m_tbl, 2)
        n = _fb_scalar(meta, rb, 0, "<q")
        n_nodes, _ = _fb_vector(meta, rb, 1)
        n_bufs, vpos = _fb_vector(meta, rb, 2)
        if n_nodes != 2 or n_bufs != 5:
            raise ValueError("unexpected node/buffer layout")
        body = payload[off + mlen:off + mlen + blen]
        bufs = [struct.unpack_from("<qq", meta, vpos + 16 * i)
                for i in range(n_bufs)]
        ids = struct.unpack_from(f"<{n}q", body, bufs[1][0])
        offs = struct.unpack_from(f"<{n + 1}i", body, bufs[3][0])
        dstart = bufs[4][0]
        for i in range(n):
            records.append((
                ids[i],
                body[dstart + offs[i]:dstart + offs[i + 1]].decode(),
            ))
        body_bytes += blen
        end_of_batches = off + mlen + blen
    if payload[end_of_batches:end_of_batches + 8] != (
            b"\xff\xff\xff\xff\x00\x00\x00\x00"):
        raise ValueError("missing end-of-stream marker")
    if end_of_batches + 8 != ftr_start:
        raise ValueError("stray bytes between EOS and footer")
    return {"records": records, "n_batches": n_blocks,
            "body_bytes": body_bytes, "file_bytes": len(payload)}
