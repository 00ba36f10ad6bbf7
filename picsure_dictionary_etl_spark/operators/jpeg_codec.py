"""Pure-numpy baseline JPEG (JFIF / ITU T.81) codec.

The container has no imaging libraries, so real JPEG coverage is built
from the public spec: a baseline **sequential** decoder (8-bit, huffman
entropy coding, 1- or 3-component, interleaved scans with ANY dividing
sampling factors — 4:4:4, 4:2:2 and the ubiquitous 4:2:0 included) and
a minimal writer used to mint deterministic certification payloads
(4:4:4 or subsampled). Progressive scans (SOF2), arithmetic coding,
12-bit precision and non-interleaved multi-scan files stay an honest
``NotImplementedError`` seam — exactly like the PPM/WAV split in
``operators/multimodal.py``.

Subsampled chroma upsamples by pixel replication (JFIF allows any
upsampling filter; replication is the exact inverse of box-average
downsampling on *constant* chroma, which is what the certification
payloads use — see below).

Certification trick (same pattern as the PPM integer oracle): images
built from CONSTANT 8x8 blocks encoded with an all-ones quantization
table round-trip **bit-exactly** — a constant block's DCT has a single
integer DC coefficient (``8 * (v - 128)``) and zero ACs, so nothing is
lost to quantization and the decoder's float IDCT lands within 1e-13 of
the integer before the final round. An independent engine (DuckDB) can
therefore recompute the decoded channel sums with pure integer
arithmetic. The same trick certifies 4:2:0: a chroma plane that is
CONSTANT over each MCU survives box-average downsampling and
replication upsampling bit-exactly. The decoder itself is general: it
huffman-decodes, applies DC prediction/restart-marker resets,
dequantizes, inverse-zigzags, IDCTs, upsamples and color-converts any
baseline interleaved stream.

Reference analog: the reference ships no codecs at all (media is out of
scope for picsure-dictionary-etl); this module backs the LLM-pipeline
multimodal operators the brief adds on top.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU T.81 Annex K — public)
# ---------------------------------------------------------------------------


def _zigzag_order() -> list[int]:
    """Raster index of each of the 64 zigzag positions, generated from
    the diagonal-walk definition instead of transcribed (typo-proof)."""
    out = []
    for s in range(15):
        diag = [(s - j, j) for j in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 1:
            diag = diag[::-1]
        out.extend(r * 8 + c for r, c in diag)
    return out


ZIGZAG = _zigzag_order()

# Annex K luminance huffman spec: (bits[1..16], values). The writer maps
# every component to these; the decoder reads whatever DHT declares.
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) under JPEG's canonical code assignment."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the bit-serial decoder."""
    return {(ln, c): v for v, (c, ln) in _canonical_codes(bits, vals).items()}


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward ``T @ B @ T.T``,
    inverse ``T.T @ F @ T`` — this normalization IS the T.81 scaling
    (a constant block c yields DC = 8c)."""
    k = np.arange(8)
    t = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    t[0, :] /= np.sqrt(2.0)
    return t


_T = _dct_matrix()


def _extend(v: int, s: int) -> int:
    """T.81 F.12 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing.
    Stops (flags ``hit_marker``) at any real marker; RSTn is consumed by
    ``restart()`` at the MCU loop's request, never mid-symbol."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.buf = 0
        self.n = 0
        self.hit_marker = False

    def _fill(self) -> None:
        if self.i >= len(self.d):
            self.hit_marker = True  # truncated stream: surface as marker
            raise ValueError("unexpected end of entropy-coded data")
        b = self.d[self.i]
        if b == 0xFF:
            nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else 0xD9
            if nxt == 0x00:
                self.i += 2
            else:  # RSTn / EOI / next segment: not data
                self.hit_marker = True
                raise ValueError("marker inside entropy data")
        else:
            self.i += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.buf >> self.n) & ((1 << k) - 1)
        self.buf &= (1 << self.n) - 1  # keep the accumulator bounded
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.bits(1)
            ln += 1
            v = table.get((ln, code))
            if v is not None:
                return v
        raise ValueError("invalid huffman code in entropy data")

    def restart(self) -> None:
        """Byte-align and consume an expected RSTn marker."""
        self.n = 0  # drop pad bits
        if self.i + 1 < len(self.d) and self.d[self.i] == 0xFF and (
            0xD0 <= self.d[self.i + 1] <= 0xD7
        ):
            self.i += 2
        # a missing RST is tolerated (some writers omit the final one)


def decode_jpeg(b: bytes) -> np.ndarray:
    """Decode a baseline sequential JFIF payload to an (h, w, 3) uint8
    array (grayscale replicated across channels). Raises ``ValueError``
    on malformed data and ``NotImplementedError`` on legal-but-unsupported
    variants (progressive, subsampled chroma, 12-bit)."""
    if b is None or len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG payload (missing SOI)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(comp_id, tq)])
    dri = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i + 1 < len(b) and b[i + 1] == 0xFF:
            i += 1  # T.81 B.1.1.2: fill bytes before a marker
        if i + 4 > len(b):
            raise ValueError("truncated JPEG: fill bytes run to end of data")
        marker = b[i + 1]
        if marker == 0xD9:  # EOI before SOS: no image
            raise ValueError("EOI before scan data")
        seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j : j + 128], dtype=">u2")
                    j += 128
                qt[tid] = tbl.astype(np.int32)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            kind = "progressive" if marker == 0xC2 else f"SOF{marker - 0xC0}"
            raise NotImplementedError(
                f"only baseline sequential JPEG (SOF0) is supported, got {kind}"
            )
        elif marker == 0xC0:  # SOF0
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"illegal sampling factors {hs}x{vs}")
                comps.append((cid, (hs, vs), tq))
            if ncomp == 1:
                # T.81 A.2.2: a single-component scan is one data unit
                # per MCU regardless of declared factors
                comps = [(comps[0][0], (1, 1), comps[0][2])]
            hmax = max(hs for _, (hs, _), _ in comps)
            vmax = max(vs for _, (_, vs), _ in comps)
            if any(hmax % hs or vmax % vs for _, (hs, vs), _ in comps):
                raise NotImplementedError(
                    f"non-dividing sampling factors unsupported: "
                    f"{[(hs, vs) for _, (hs, vs), _ in comps]}"
                )
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nv])
                (huff_ac if cls else huff_dc)[tid] = _decode_table(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            if ns != len(frame[2]):
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline JPEG unsupported"
                )
            scan_tables = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                b, i + 2 + seg_len, frame, qt, huff_dc, huff_ac, scan_tables, dri
            )
        # APPn / COM / others: skip
        i += 2 + seg_len
    raise ValueError("no scan (SOS) found")


def _decode_one_block(reader, huff_dc, huff_ac, td, ta, pred, ci, q):
    """One 8x8 data unit: huffman + DC prediction -> dequant ->
    inverse zigzag -> IDCT -> level-shifted clipped pixels."""
    coef = np.zeros(64, dtype=np.int32)
    s = reader.huff(huff_dc[td])
    diff = _extend(reader.bits(s), s) if s else 0
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        sym = reader.huff(huff_ac[ta])
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL: 16 zeros
            k += 16
            continue
        k += sym >> 4
        size = sym & 0x0F
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        coef[k] = _extend(reader.bits(size), size)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = coef * q
    spatial = _T.T @ block.reshape(8, 8) @ _T
    return np.clip(np.round(spatial + 128.0), 0, 255)


def _decode_scan(b, pos, frame, qt, huff_dc, huff_ac, scan_tables, dri):
    h, w, comps = frame
    hmax = max(hs for _, (hs, _), _ in comps)
    vmax = max(vs for _, (_, vs), _ in comps)
    mcw, mch = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    planes = [
        np.zeros((mch * vs * 8, mcw * hs * 8), dtype=np.int32)
        for _, (hs, vs), _ in comps
    ]
    reader = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mch):
        for mx in range(mcw):
            if dri and mcu and mcu % dri == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, (cid, (hs, vs), tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                # hs*vs data units per MCU, raster order (T.81 A.2.3)
                for vy in range(vs):
                    for vx in range(hs):
                        px = _decode_one_block(
                            reader, huff_dc, huff_ac, td, ta, pred, ci, qt[tq]
                        )
                        r0, c0 = (my * vs + vy) * 8, (mx * hs + vx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = px
            mcu += 1
    # upsample subsampled components by replication, then crop
    full = []
    for ci, (cid, (hs, vs), tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p)
    planes = [p[:h, :w] for p in full]
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, bl)], axis=-1
    )


# ---------------------------------------------------------------------------
# writer (certification payloads; general over any uint8 planes)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill final byte (T.81 F.1.2.3)
        return bytes(self.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(planes, qtable=None, sampling=None) -> bytes:
    """Write a baseline sequential JFIF from 1 (grayscale) or 3 (YCbCr)
    uint8 planes of identical full-resolution shape. ``sampling=(H,V)``
    sets the LUMA sampling factors — chroma planes are box-average
    downsampled by (H,V) and declared 1x1, so ``(2,2)`` emits 4:2:0,
    ``(2,1)`` 4:2:2, and the default ``(1,1)`` 4:4:4. All components
    share the Annex K luminance huffman tables and one quantization
    table (default all-ones — lossless for integer-DCT inputs such as
    constant blocks; with MCU-constant chroma the subsampled pipeline
    is lossless too, the certification contract)."""
    planes = [np.asarray(p, dtype=np.uint8) for p in planes]
    if len(planes) not in (1, 3):
        raise ValueError("1 or 3 planes required")
    h, w = planes[0].shape
    if any(p.shape != (h, w) for p in planes):
        raise ValueError("planes must share one full-resolution shape")
    hs, vs = sampling or (1, 1)
    if len(planes) == 1:
        hs, vs = 1, 1
    if not (1 <= hs <= 4 and 1 <= vs <= 4):
        raise ValueError(f"illegal sampling factors {hs}x{vs}")
    q = (
        np.ones(64, dtype=np.int32)
        if qtable is None
        else np.asarray(qtable, dtype=np.int32).reshape(64)
    )
    dc_codes = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(planes)])
    for ci in range(len(planes)):
        hv = (hs << 4) | vs if ci == 0 else 0x11
        sof += bytes([ci + 1, hv, 0])
    out += _seg(0xC0, sof)
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
        + bytes([0x10]) + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS),
    )
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    mcw, mch = -(-w // (8 * hs)), -(-h // (8 * vs))
    ph, pw = mch * vs * 8, mcw * hs * 8  # full-res padded dims
    padded = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    # chroma: box-average downsample by (vs, hs) -> (mch*8, mcw*8)
    comp_planes = [padded[0]]
    for p in padded[1:]:
        if hs == 1 and vs == 1:
            comp_planes.append(p)
        else:
            sub = p.astype(np.float64).reshape(
                ph // vs, vs, pw // hs, hs
            ).mean(axis=(1, 3))
            comp_planes.append(
                np.clip(np.round(sub), 0, 255).astype(np.uint8)
            )
    factors = [(hs, vs)] + [(1, 1)] * (len(planes) - 1)
    wtr = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mch):
        for mx in range(mcw):
            for ci, p in enumerate(comp_planes):
                fh, fv = factors[ci]
                for vy in range(fv):
                    for vx in range(fh):
                        r0, c0 = (my * fv + vy) * 8, (mx * fh + vx) * 8
                        blk = p[r0 : r0 + 8, c0 : c0 + 8].astype(np.float64)
                        f = _T @ (blk - 128.0) @ _T.T
                        zz = np.round(f.reshape(64)[ZIGZAG] / q).astype(np.int64)
                        _encode_block(wtr, zz, pred, ci, dc_codes, ac_codes)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block(wtr, zz, pred, ci, dc_codes, ac_codes):
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    s = int(diff).bit_length() if diff else 0
    code, ln = dc_codes[s]
    wtr.put(code, ln)
    if s:
        wtr.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        wtr.put(code, ln)
