"""PNG codec in pure Python/numpy + stdlib zlib — no external library.

Closes another r5 "compressed codecs are env-stubbed" branch the same
way r6 closed baseline JPEG: the r5 assumption was that PNG needs a
codec library, but CPython ships the DEFLATE half (``zlib``) in the
standard library, and everything else in PNG (RFC 2083 / ISO 15948) is
chunk walking, CRC32, and per-row prediction filters — implementable
exactly:

- ``decode_png``: GENERAL decoder for 8-bit color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA): signature + chunk
  walk with CRC verification, multi-IDAT concatenation, zlib inflate,
  full de-filtering of all five row filters (None/Sub/Up/Average/
  Paeth — the exact integer recurrences from the spec), and Adam7
  interlace (seven independently-filtered sub-images reassembled on
  the pixel grid).  Bit depths != 8 raise ``NotImplementedError``.
- ``encode_png``: REAL encoder for gray/RGB with a deterministic
  per-row filter cycle (row % 5 → filter type), so generated payloads
  exercise every de-filter path; PNG is lossless, so decode(encode(x))
  == x EXACTLY — which is what makes the decode SQL-oracle-checkable
  with no quantization closed-form at all (simpler than JPEG's).

MP3/MP4 remain honest stubs: perceptual audio/video need MDCT psycho-
acoustics / motion compensation — genuinely codec-library territory.

Reference parity: the reference engine (Rust, src/lib.rs) has no media
surface; this serves the builder mandate's multimodal family
(SURVEY §2.5).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type (8-bit only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to a raw row (uint8) for encoding."""
    n = len(row)
    out = np.empty(n, dtype=np.uint8)
    if ftype == 0:
        return row.copy()
    if ftype == 1:  # Sub
        out[:bpp] = row[:bpp]
        out[bpp:] = row[bpp:] - row[:-bpp]
        return out
    if ftype == 2:  # Up
        return row - prev
    if ftype == 3:  # Average
        for i in range(n):
            a = int(row[i - bpp]) if i >= bpp else 0
            out[i] = (int(row[i]) - (a + int(prev[i])) // 2) % 256
        return out
    if ftype == 4:  # Paeth
        for i in range(n):
            a = int(row[i - bpp]) if i >= bpp else 0
            c = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(row[i]) - _paeth(a, int(prev[i]), c)) % 256
        return out
    raise ValueError(f"bad filter type {ftype}")


def _unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Invert filter ``ftype`` in place semantics (returns raw row)."""
    n = len(cur)
    out = np.empty(n, dtype=np.uint8)
    if ftype == 0:
        return cur.copy()
    if ftype == 1:  # Sub: raw[i] = cur[i] + raw[i-bpp]
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(cur[i]) + a) % 256
        return out
    if ftype == 2:  # Up
        return cur + prev
    if ftype == 3:  # Average
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(cur[i]) + (a + int(prev[i])) // 2) % 256
        return out
    if ftype == 4:  # Paeth
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            c = int(prev[i - bpp]) if i >= bpp else 0
            out[i] = (int(cur[i]) + _paeth(a, int(prev[i]), c)) % 256
        return out
    raise ValueError(f"invalid PNG filter type {ftype}")


# Adam7: per-pass (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_pass(raw: np.ndarray, bpp: int, filter_cycle: bool) -> bytes:
    """Filter one (sub-)image's scanlines: each pass of an interlaced
    PNG filters against the previous scanline OF THE SAME PASS."""
    stream = bytearray()
    prev = np.zeros(raw.shape[1], dtype=np.uint8)
    for y in range(raw.shape[0]):
        ftype = (y % 5) if filter_cycle else 0
        stream.append(ftype)
        stream += _filter_row(ftype, raw[y], prev, bpp).tobytes()
        prev = raw[y]
    return bytes(stream)


def encode_png(img: np.ndarray, filter_cycle: bool = True,
               interlace: bool = False) -> bytes:
    """REAL PNG encoder for 8-bit grayscale (h, w) or RGB (h, w, 3)
    arrays.  ``filter_cycle=True`` assigns row filters round-robin
    (row % 5), exercising every de-filter path in any decoder;
    ``interlace=True`` emits the Adam7 seven-pass layout (each pass an
    independently filtered sub-image).  PNG is lossless so neither
    choice ever changes pixels."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, h, w = 0, *img.shape
        samples = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype = 2
        h, w = img.shape[:2]
        samples = img
    else:
        raise ValueError("encode_png takes (h,w) gray or (h,w,3) RGB uint8")
    bpp = _CHANNELS[ctype]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0,
                       1 if interlace else 0)
    if interlace:
        stream = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue  # empty pass for small images
            raw = sub.reshape(sub.shape[0], sub.shape[1] * bpp)
            stream += _filter_pass(raw, bpp, filter_cycle)
        stream = bytes(stream)
    else:
        raw = samples.reshape(h, w * bpp)
        stream = _filter_pass(raw, bpp, filter_cycle)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(stream, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_planes(payload: bytes) -> tuple[int, int, np.ndarray]:
    """GENERAL PNG decode to (width, height, samples[h, w, channels])
    for 8-bit color types 0/2/3/4/6, Adam7-interlaced or not.  Chunk
    CRCs are verified; palette images are expanded through PLTE.
    Raises NotImplementedError for non-8-bit streams, ValueError for
    malformed data."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    try:
        while pos < len(payload):
            length, tag = struct.unpack_from(">I4s", payload, pos)
            body = payload[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if interlace not in (0, 1):
                    raise ValueError("bad PNG interlace method")
                if depth != 8 or ctype not in _CHANNELS:
                    raise NotImplementedError(
                        f"PNG bit depth {depth} / color type {ctype} "
                        "not supported (8-bit 0/2/3/4/6 only)"
                    )
                if comp != 0 or filt != 0:
                    raise ValueError("non-standard compression/filter")
                ihdr = (w, h, ctype, interlace)
            elif tag == b"PLTE":
                plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + length
    except struct.error as exc:
        raise ValueError(f"truncated PNG stream: {exc}")
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, ctype, interlace = ihdr
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))

    def unfilter(buf: bytes, rows: int, rowlen: int,
                 offset: int) -> tuple[np.ndarray, int]:
        out = np.zeros((rows, rowlen), dtype=np.uint8)
        prev = np.zeros(rowlen, dtype=np.uint8)
        for y in range(rows):
            if offset + 1 + rowlen > len(buf):
                raise ValueError("PNG pixel stream truncated")
            ftype = buf[offset]
            cur = np.frombuffer(buf, np.uint8, count=rowlen,
                                offset=offset + 1)
            prev = _unfilter_row(ftype, cur, prev, ch)
            out[y] = prev
            offset += 1 + rowlen
        return out, offset

    if interlace:  # Adam7: seven independently-filtered sub-images
        full = np.zeros((h, w * ch), dtype=np.uint8)
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            rows = len(range(y0, h, dy))
            cols = len(range(x0, w, dx))
            if rows == 0 or cols == 0:
                continue
            sub, offset = unfilter(raw, rows, cols * ch, offset)
            sub3 = sub.reshape(rows, cols, ch)
            grid = full.reshape(h, w, ch)
            grid[y0::dy, x0::dx] = sub3
        if offset != len(raw):
            raise ValueError("PNG pixel stream length mismatch")
        out = full
    else:
        rowlen = w * ch
        if len(raw) != h * (rowlen + 1):
            raise ValueError("PNG pixel stream length mismatch")
        out, _ = unfilter(raw, h, rowlen, 0)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        return w, h, plte[out.reshape(h, w)]
    return w, h, out.reshape(h, w, ch)


def decode_png(payload: bytes) -> tuple[int, int, int, int]:
    """Decode-and-summarize for the multimodal pipeline: (width, height,
    n_pixels, level_sum) with level_sum = sum of ALL decoded samples
    (post-palette-expansion) — lossless, so for encoder-generated
    payloads this equals the input sum exactly."""
    w, h, samples = decode_png_planes(payload)
    return w, h, w * h, int(samples.astype(np.int64).sum())
