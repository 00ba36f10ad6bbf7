"""Pure stdlib+numpy PNG codec (RFC 2083 / ISO 15948).

PNG needs only zlib (stdlib) plus the per-scanline unfiltering math, so
— unlike JPEG — the whole format decodes for real with no external
libraries and NO loss: decode(encode(x)) == x bit-for-bit for every
image, which makes certification trivial (any deterministic integer
pattern is its own oracle; no constant-block trick required).

Supported (round 6 closes the round-5 seams):

- color types 0 (greyscale), 2 (truecolor RGB), 3 (palette),
  4 (grey+alpha) and 6 (RGBA); alpha is dropped on decode to match the
  (h, w, 3) contract of the other decoders.
- bit depths 1/2/4/8/16 wherever the spec allows them (sub-byte depths
  for grey and palette images, 16-bit for grey/RGB/grey-alpha/RGBA).
  16-bit samples reduce to 8-bit by the high byte (`v >> 8`) — exact
  for any sample of the form ``s * 257``, which is what the encoder's
  16-bit certification payloads use.
- both interlace methods: 0 (none) and 1 (Adam7, all seven passes,
  each pass filtered independently per the spec).
- all five scanline filters (None, Sub, Up, Average, Paeth); Sub is
  unfiltered vectorized (uint8 cumsum wraps mod 256 natively), Up is a
  vectorized add, Average/Paeth keep the spec's sequential recurrence.

Reference analog: the reference ships no codecs (media is out of scope
for picsure-dictionary-etl); this backs the LLM-pipeline multimodal
operators the brief adds on top.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per color type; None = invalid color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths per color type (PNG spec table 11.1)
_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass grid: (x_start, y_start, x_step, y_step), spec order
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, offset: int, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters of one (sub)image: ``h`` lines
    of ``1 + stride`` bytes starting at ``offset``. Returns the
    reconstructed (h, stride) uint8 byte grid."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1)
        if ftype == 0:  # None
            cur = line.astype(np.int32)
        elif ftype == 1:  # Sub: cumsum per byte lane, uint8 wraps mod 256
            cur8 = line.copy()
            for r in range(bpp):
                np.cumsum(cur8[r::bpp], dtype=np.uint8, out=cur8[r::bpp])
            cur = cur8.astype(np.int32)
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev) & 0xFF
        elif ftype == 3:  # Average (sequential recurrence on left)
            cur = line.astype(np.int32)
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth (sequential recurrence on left)
            cur = line.astype(np.int32)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = cur
        prev = cur
    return out


def _decode_samples(
    raw: bytes, offset: int, w: int, h: int, channels: int, depth: int
) -> tuple[np.ndarray, int]:
    """Decode one (sub)image's scanlines into an (h, w, channels) uint8
    sample array (16-bit reduced to the high byte; sub-byte samples NOT
    yet scaled — palette indices must stay raw). Returns the array and
    the new offset past the consumed bytes."""
    bits_pp = channels * depth
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("decompressed size mismatch")
    grid = _unfilter(raw, offset, h, stride, bpp)
    offset += need
    if depth == 8:
        return grid.reshape(h, w, channels), offset
    if depth == 16:
        # big-endian sample pairs; reduce to 8-bit via the high byte
        return grid.reshape(h, w, channels, 2)[..., 0].copy(), offset
    # depth 1/2/4: single-channel only (grey or palette indices),
    # samples packed MSB-first within each scanline byte
    bits = np.unpackbits(grid, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(h, w, depth) * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :, None], offset


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG payload to an (h, w, 3) uint8 array (greyscale
    replicated, palette looked up, alpha dropped, 16-bit reduced to the
    high byte). Raises ``ValueError`` on malformed data."""
    if data is None or not data.startswith(_SIG):
        raise ValueError("not a PNG payload (missing signature)")
    i = len(_SIG)
    ihdr = None
    plte = None
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
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("malformed PLTE chunk (length not 3n)")
            plte = bytes(chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, tRNS, ...) are skipped; CRCs are
        # not re-verified (zlib's adler32 already covers the pixel data)
        i += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    channels = _CHANNELS.get(color)
    if channels is None:
        raise ValueError(f"invalid color type {color}")
    if depth not in _DEPTHS[color]:
        raise ValueError(f"bit depth {depth} illegal for color type {color}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from None

    if interlace == 0:
        samples, off = _decode_samples(raw, 0, w, h, channels, depth)
    else:  # Adam7: seven independently filtered sub-images, spec order
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue  # empty pass contributes no scanlines at all
            sub, off = _decode_samples(raw, off, pw, ph, channels, depth)
            samples[y0::ys, x0::xs] = sub
    if off != len(raw):
        raise ValueError("decompressed size mismatch")

    if color == 3:
        if plte is None:
            raise ValueError("palette image missing PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        return pal[idx]
    if color == 0 and depth < 8:
        # scale sub-byte grey to full range: max value divides 255
        # exactly for depths 1/2/4 (255, 85*3, 17*15)
        samples = (samples.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    if channels == 1:
        return np.repeat(samples, 3, axis=2)
    if channels == 2:  # grey + alpha: replicate grey, drop alpha
        return np.repeat(samples[:, :, :1], 3, axis=2)
    return samples[:, :, :3].copy()  # RGB(A): drop alpha if present


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def _pack_rows(sub: np.ndarray, depth: int) -> bytes:
    """Serialize one (ph, pw, channels) integer sample sub-image as
    filter-type-None scanlines at the given bit depth (PNG filters only
    change compression, never pixels — lossless regardless)."""
    out = bytearray()
    for y in range(sub.shape[0]):
        flat = sub[y].reshape(-1)
        out.append(0)  # filter: None
        if depth == 8:
            out += flat.astype(np.uint8).tobytes()
        elif depth == 16:
            out += flat.astype(">u2").tobytes()
        else:  # 1/2/4-bit: pack samples MSB-first, zero-pad to the byte
            bits = (
                (flat.astype(np.uint8)[:, None] >> np.arange(depth - 1, -1, -1)) & 1
            ).astype(np.uint8)
            out += np.packbits(bits.reshape(-1)).tobytes()
    return bytes(out)


def _emit(
    w: int,
    h: int,
    depth: int,
    color: int,
    samples: np.ndarray,
    interlace: bool,
    plte: bytes | None = None,
) -> bytes:
    raw = bytearray()
    if not interlace:
        raw += _pack_rows(samples, depth)
    else:
        for x0, y0, xs, ys in _ADAM7:
            sub = samples[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                raw += _pack_rows(sub, depth)
    out = bytearray(_SIG)
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, int(interlace))
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Write an 8-bit PNG from an (h, w) greyscale or (h, w, 3) RGB
    uint8 array, optionally Adam7-interlaced; filter None per scanline."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color = 0
        samples = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color = 2
        samples = a
    else:
        raise ValueError("expected (h, w) grey or (h, w, 3) RGB uint8")
    return _emit(a.shape[1], a.shape[0], 8, color, samples, interlace)


def encode_png16(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Write a 16-bit PNG from an (h, w) grey or (h, w, 3) RGB uint16
    array. ``decode_png`` reduces 16-bit to the high byte, so samples of
    the form ``s * 257`` round-trip to ``s`` exactly."""
    a = np.asarray(arr, dtype=np.uint16)
    if a.ndim == 2:
        color = 0
        samples = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color = 2
        samples = a
    else:
        raise ValueError("expected (h, w) grey or (h, w, 3) RGB uint16")
    return _emit(a.shape[1], a.shape[0], 16, color, samples, interlace)


def encode_png_palette(
    indices: np.ndarray, palette: np.ndarray, depth: int = 8, interlace: bool = False
) -> bytes:
    """Write a palette (color type 3) PNG from an (h, w) index array and
    an (n, 3) uint8 palette, at bit depth 1/2/4/8."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("expected (h, w) indices and (n, 3) palette")
    if depth not in _DEPTHS[3]:
        raise ValueError(f"bit depth {depth} illegal for palette images")
    if int(idx.max(initial=0)) >= min(len(pal), 1 << depth):
        raise ValueError("palette index out of range for depth/palette")
    return _emit(
        idx.shape[1], idx.shape[0], depth, 3, idx[:, :, None], interlace, pal.tobytes()
    )


def encode_png_grey_alpha(
    grey: np.ndarray, alpha: np.ndarray, interlace: bool = False
) -> bytes:
    """Write an 8-bit grey+alpha (color type 4) PNG; ``decode_png``
    drops the alpha plane and replicates grey to (h, w, 3)."""
    g = np.asarray(grey, dtype=np.uint8)
    a = np.asarray(alpha, dtype=np.uint8)
    if g.ndim != 2 or g.shape != a.shape:
        raise ValueError("expected matching (h, w) grey and alpha uint8")
    samples = np.stack([g, a], axis=-1)
    return _emit(g.shape[1], g.shape[0], 8, 4, samples, interlace)
