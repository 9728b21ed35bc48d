"""GIF codec in pure Python/numpy — real LZW, no external library.

The third compressed format the multimodal family decodes for real
(after r6's baseline JPEG and stdlib-zlib PNG): GIF's compression is
LZW with variable-width codes — pure integer dictionary work, so both
halves are implementable exactly with no codec library at all:

- ``decode_gif``: GENERAL decoder for GIF87a/GIF89a: header + logical
  screen descriptor, global/local color tables, extension-block
  skipping (GCE/comment/application), image descriptor, INTERLACED row
  de-scrambling (the 8/8/4/2 four-pass scheme), and a full variable-
  code-width LZW decompressor (clear/EOI codes, dictionary growth to
  12 bits, the KwKwK self-referential case).  Multi-frame GIFs decode
  frame 1 (the still-image contract of this pipeline; animation is a
  timing layer, not a compression one).
- ``encode_gif``: REAL encoder for an 8-bit palette-indexed image:
  emits a spec-conformant GIF87a stream with a genuine LZW compressor
  (dictionary growth + clear-code reset at 4096), optional interlace.
  GIF is lossless over palette indices, so decode(encode(x)) == x
  exactly — the same oracle-verbatim property PNG has.

Remaining honest stubs after this: progressive JPEG, MP3, MP4 (DSP
pipelines, genuinely codec-library territory).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """Variable-width LZW as GIF requires: codes start at
    min_code_size+1 bits, dictionary seeded with 2^min_code_size roots
    plus CLEAR and EOI, grows to 12 bits, CLEAR resets."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    prefix = b""
    for b in data:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        if next_code < (1 << 12):
            table[cand] = next_code
            next_code += 1
            # width grows when the just-assigned code needs one more
            # bit; the decoder lags one entry, so its mirror condition
            # is next_code == 2^width (standard non-deferred GIF LZW)
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:  # table full: clear and restart (never assign code 4096)
            put(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = cand[-1:]
    if prefix:
        put(table[prefix], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = min_code_size + 1
    next_code = eoi + 1
    reset()
    prev: bytes | None = None
    while True:
        code = get(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or code > eoi):
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < (1 << 12):
            # cap at 4096: a deferred-clear encoder keeps emitting from
            # a full table, and growing past it would desynchronize
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False) -> bytes:
    """REAL GIF87a encoder: (h, w) uint8 palette indices + (n, 3)
    palette.  Genuine variable-width LZW; optional interlaced row
    order to exercise the decoder's four-pass de-scramble."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must hold 2..256 colors")
    depth = max(1, int(n - 1).bit_length())
    table_size = 1 << depth
    pal = np.zeros((table_size, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4)
                       | (depth - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0x00)
    if interlace:
        rows = [indices[y] for start, step in _INTERLACE_PASSES
                for y in range(start, h, step)]
        stream = np.concatenate(rows).tobytes()
    else:
        stream = indices.tobytes()
    min_code = max(2, depth)
    out.append(min_code)
    lzw = _lzw_compress(stream, min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_indices(payload: bytes):
    """GENERAL GIF decode of the first image: returns (width, height,
    indices[h, w], palette[n, 3]).  Handles 87a/89a, global and local
    color tables, extension blocks, interlace, and full LZW."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        palette = None
        if flags & 0x80:
            size = 2 << (flags & 0x07)
            palette = np.frombuffer(
                payload, np.uint8, count=3 * size, offset=pos
            ).reshape(size, 3)
            pos += 3 * size
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos += 2
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if b != 0x2C:
                raise ValueError(f"unexpected GIF block 0x{b:02x}")
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", payload,
                                                      pos + 1)
            pos += 10
            if iflags & 0x80:  # local color table wins
                size = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    payload, np.uint8, count=3 * size, offset=pos
                ).reshape(size, 3)
                pos += 3 * size
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            raw = _lzw_decompress(bytes(lzw), min_code)
            if len(raw) < w * h:
                raise ValueError("GIF pixel stream shorter than w*h")
            flat = np.frombuffer(raw, np.uint8, count=w * h)
            if iflags & 0x40:  # de-interlace the four passes
                img = np.zeros((h, w), dtype=np.uint8)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, h, step):
                        img[y] = flat[src * w : (src + 1) * w]
                        src += 1
            else:
                img = flat.reshape(h, w)
            if palette is None:
                raise ValueError("GIF image without any color table")
            return w, h, img, palette
        raise ValueError("GIF contains no image block")
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or malformed GIF stream: {exc}")


def decode_gif(payload: bytes) -> tuple[int, int, int, int]:
    """Decode-and-summarize for the multimodal pipeline: (width,
    height, n_pixels, level_sum) with level_sum = sum of the
    palette-expanded RGB samples — lossless over indices, so for
    encoder-generated payloads the value is the input's exactly."""
    w, h, img, palette = decode_gif_indices(payload)
    rgb = palette[img]
    return w, h, w * h, int(rgb.astype(np.int64).sum())
