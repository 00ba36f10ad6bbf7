"""Pure stdlib+numpy PNG codec (RFC 2083 / ISO 15948).

PNG needs only zlib (stdlib) plus the per-scanline unfiltering math, so
— unlike JPEG — the whole format decodes for real with no external
libraries and NO loss: decode(encode(x)) == x bit-for-bit for every
image, which makes certification trivial (any deterministic integer
pattern is its own oracle; no constant-block trick required).

Supported: 8-bit greyscale (color type 0), truecolor RGB (2) and RGBA
(6, alpha dropped on decode to match the (h, w, 3) contract of the
other decoders), non-interlaced, all five scanline filters (None, Sub,
Up, Average, Paeth). Adam7 interlacing, palettes and 16-bit depth stay
an honest ``NotImplementedError`` seam.

Reference analog: the reference ships no codecs (media is out of scope
for picsure-dictionary-etl); this backs the LLM-pipeline multimodal
operators the brief adds on top.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG payload to an (h, w, 3) uint8 array (greyscale
    replicated, RGBA alpha dropped). Raises ``ValueError`` on malformed
    data and ``NotImplementedError`` on unsupported legal variants."""
    if data is None or not data.startswith(_SIG):
        raise ValueError("not a PNG payload (missing signature)")
    i = len(_SIG)
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(data):
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        chunk = data[i + 8 : i + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            try:
                ihdr = struct.unpack(">IIBBBBB", chunk)
            except struct.error as e:
                raise ValueError(f"malformed IHDR chunk: {e}") from None
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped; CRCs are not
        # re-verified (zlib's adler32 already covers the pixel data)
        i += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if interlace == 1:
        raise NotImplementedError("Adam7 interlaced PNG unsupported")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} unsupported (8 only)")
    channels = {0: 1, 2: 3, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"color type {color} unsupported (0/2/6 only)")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = cur
        prev = cur.astype(np.int32)

    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()  # RGBA: drop alpha


def encode_png(arr: np.ndarray) -> bytes:
    """Write a non-interlaced 8-bit PNG from an (h, w) greyscale or
    (h, w, 3) RGB uint8 array, filter type None per scanline (lossless
    regardless — PNG filters only change compression, never pixels)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, channels = 0, 1
        flat = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, channels = 2, 3
        flat = a
    else:
        raise ValueError("expected (h, w) grey or (h, w, 3) RGB uint8")
    h, w = a.shape[0], a.shape[1]
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter: None
        raw += flat[y].tobytes()

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    out = bytearray(_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    out += chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += chunk(b"IEND", b"")
    return bytes(out)
