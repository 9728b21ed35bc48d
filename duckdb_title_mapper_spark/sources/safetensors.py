"""safetensors checkpoint-shard walk (the Hugging Face format).

The format LLM checkpoints actually ship in, implementable exactly
with the standard library (public spec,
huggingface/safetensors README): an 8-byte little-endian u64 header
length, a JSON header mapping tensor name -> {"dtype", "shape",
"data_offsets": [begin, end]} (offsets relative to the byte buffer
that follows the header), then the raw little-endian tensor bytes.
The format's integrity contract is offset arithmetic: every tensor's
byte span must equal prod(shape) * dtype_size, spans must be
non-overlapping and contiguous starting at 0, and the buffer must end
exactly at the last span.

``build_safetensors`` serializes deterministically (keys in insertion
order, canonical JSON separators, no header padding beyond the
spec-allowed trailing spaces — we emit none, so identical inputs give
identical bytes) and ``read_safetensors`` re-walks the file
validating every framing rule.  At 100 TB scale this is the
map-side discipline of a checkpoint-audit pass: shard files stream
through workers, each header parsed once, offset arithmetic checked
without touching tensor payloads beyond length accounting.
"""

from __future__ import annotations

import json
import struct

DTYPE_SIZES = {
    "F64": 8, "F32": 4, "F16": 2, "BF16": 2,
    "I64": 8, "I32": 4, "I16": 2, "I8": 1, "U8": 1, "BOOL": 1,
}


def build_safetensors(tensors: list[tuple[str, str, tuple, bytes]]) -> bytes:
    """Serialize (name, dtype, shape, raw_bytes) tensors into a
    spec-conformant safetensors file.  Validates that each payload's
    length equals prod(shape) * dtype_size before framing."""
    header = {}
    offset = 0
    blobs = []
    for name, dtype, shape, raw in tensors:
        size = DTYPE_SIZES[dtype]
        n = 1
        for d in shape:
            n *= d
        if len(raw) != n * size:
            raise ValueError(
                f"tensor {name!r}: payload {len(raw)} bytes != "
                f"prod{tuple(shape)} * {size}")
        header[name] = {
            "dtype": dtype,
            "shape": list(shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        offset += len(raw)
        blobs.append(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    return struct.pack("<Q", len(hjson)) + hjson + b"".join(blobs)


# Closed-form header arithmetic shared with the SQL oracle: one JSON
# entry `"<name>":{"dtype":"F32","shape":[r,c],"data_offsets":[b,e]}`
# costs ENTRY_FIXED bytes plus the name length plus the decimal digit
# counts of r, c, b, e; the header adds 2 braces and n-1 commas.
_probe = json.dumps(
    {"": {"dtype": "F32", "shape": [0, 0], "data_offsets": [0, 0]}},
    separators=(",", ":"))
ENTRY_FIXED = len(_probe) - 2 - 4  # minus outer braces, minus 4 digits


def read_safetensors(payload: bytes) -> list[dict]:
    """Walk a safetensors file back into
    [{name, dtype, shape, n_elements, n_bytes}] in offset order,
    VALIDATING the format's whole integrity contract: u64 header
    framing, JSON header shape, dtype legality, span arithmetic
    (end - begin == prod(shape) * dtype_size), zero-based contiguous
    non-overlapping spans, and exact buffer length."""
    if len(payload) < 8:
        raise ValueError("truncated safetensors header length")
    (hlen,) = struct.unpack_from("<Q", payload, 0)
    if 8 + hlen > len(payload):
        raise ValueError("safetensors header overruns file")
    try:
        header = json.loads(payload[8:8 + hlen].decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as exc:
        raise ValueError(f"bad safetensors header JSON: {exc}")
    if not isinstance(header, dict):
        raise ValueError("safetensors header is not an object")
    buf_len = len(payload) - 8 - hlen
    out = []
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dtype = meta.get("dtype")
        if dtype not in DTYPE_SIZES:
            raise ValueError(f"tensor {name!r}: unknown dtype {dtype!r}")
        shape = meta.get("shape")
        begin, end = meta.get("data_offsets", (None, None))
        if not isinstance(shape, list) or begin is None:
            raise ValueError(f"tensor {name!r}: malformed header entry")
        n = 1
        for d in shape:
            if not isinstance(d, int) or d < 0:
                raise ValueError(f"tensor {name!r}: bad dim {d!r}")
            n *= d
        if end - begin != n * DTYPE_SIZES[dtype]:
            raise ValueError(
                f"tensor {name!r}: span {end - begin} != "
                f"prod(shape) * dtype_size {n * DTYPE_SIZES[dtype]}")
        if begin < 0 or end > buf_len:
            raise ValueError(f"tensor {name!r}: span outside buffer")
        out.append({
            "name": name, "dtype": dtype, "shape": tuple(shape),
            "n_elements": n, "n_bytes": end - begin,
            "begin": begin, "end": end,
        })
    out.sort(key=lambda t: t["begin"])
    pos = 0
    for t in out:
        if t["begin"] != pos:
            raise ValueError(
                f"tensor {t['name']!r}: span not contiguous "
                f"(begin {t['begin']}, expected {pos})")
        pos = t["end"]
    if pos != buf_len:
        raise ValueError(
            f"buffer length {buf_len} != last tensor end {pos}")
    return out
