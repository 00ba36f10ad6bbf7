"""From-scratch ISO BMFF (MP4/QuickTime) demuxer + writer — pure
stdlib ``struct`` + numpy, no media library.

This closes the last multimodal container seam (``decode_real`` listed
MP4 as a stub since round 3).  The design mirrors the JPEG/PNG/WAV
certifications: a spec-driven writer produces deterministic payloads
whose decoded content is a pure integer function of the generator
inputs, and the demuxer is additionally pinned in tests against a
HAND-BUILT byte blob (explicit struct.pack with literal offsets,
independent of the writer) so writer↔parser round trips can't be
self-consistently wrong.

Built from public specs only:

- ISO/IEC 14496-12 (box structure; ``stts``/``stsc``/``stsz``/
  ``stco``/``co64`` sample tables; ``mvhd``/``tkhd``/``mdhd`` v0/v1).
- QuickTime File Format spec: the ``'raw '`` uncompressed 24-bit RGB
  video sample entry and the ``'twos'``/``'sowt'`` big/little-endian
  PCM audio sample entries.

Scope (honest seams, typed errors):

- DEMUX works for any sane MP4 — progressive (``stbl`` sample tables)
  AND fragmented (``moof``/``tfhd``/``tfdt``/``trun`` per ISO 14496-12
  §8.8, with ``trex`` defaults; base-data-offset and
  default-base-is-moof addressing).  The sample-entry codec is opaque
  to the sample-table math, so byte-range extraction works for
  avc1/hev1/… too.  Pixel DECODE is only real for ``'raw '`` video and
  ``'twos'``/``'sowt'`` PCM audio (no entropy-coded codecs in this
  container, same rule as the JPEG/PNG split).
- Composition offsets are REAL (late r6): ``ctts`` (v0 unsigned / v1
  signed) and per-sample ``trun`` cts expand to a per-sample ``pts``
  array; edit lists (``elst``) in the standard shape — optional
  leading empty edit (presentation delay) + one rate-1.0 forward edit
  (media-time shift; trimmed pre-roll shows as negative pts) — shift
  the presentation timeline, and frame sampling runs on PTS order
  (what a viewer sees), not decode order.  Multi-segment / repeating /
  rate-warped edits and implicit previous-traf base offsets (neither
  tfhd base-data-offset nor default-base-is-moof) stay typed seams.

Scale notes: sample-table expansion (stts/stsc run-length → per-sample
offset/size/dts arrays) is fully vectorized numpy — a multi-million
sample table costs a handful of array ops, never a Python loop.  The
Spark surface in :mod:`~.multimodal` runs this inside ``mapInPandas``
so each executor demuxes its own payload batch.

Reference parity: the reference pipeline has no media decode at all
(it ships opaque blobs; see reference README.md) — this module is part
of the training-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"udta"}

_PCM_CODECS = (b"twos", b"sowt")  # big-endian / little-endian 16-bit PCM


class Mp4Error(ValueError):
    """Malformed or truncated MP4 payload."""


# ---------------------------------------------------------------------------
# box plumbing
# ---------------------------------------------------------------------------


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each box in [start, end).

    Handles 64-bit ``largesize`` (size == 1) and to-end boxes
    (size == 0) per ISO 14496-12 §4.2.
    """
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4Error(f"truncated box header at offset {off}")
        size, btype = struct.unpack_from(">I4s", data, off)
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise Mp4Error("truncated largesize header")
            (size,) = struct.unpack_from(">Q", data, off + 8)
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise Mp4Error(f"box {btype!r} size {size} overruns container")
        yield btype, off + hdr, off + size
        off += size


def _find(data: bytes, start: int, end: int, btype: bytes) -> Optional[Tuple[int, int]]:
    for t, b, e in _iter_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


def _full(data: bytes, off: int) -> Tuple[int, int]:
    """(version, flags) of a FullBox body starting at off."""
    (vf,) = struct.unpack_from(">I", data, off)
    return vf >> 24, vf & 0xFFFFFF


# ---------------------------------------------------------------------------
# parsed model
# ---------------------------------------------------------------------------


@dataclass
class Mp4Track:
    track_id: int
    handler: str            # 'vide' | 'soun' | other fourccs
    codec: str              # sample-entry fourcc, e.g. 'raw ', 'sowt'
    timescale: int
    duration: int           # in track timescale units
    width: int = 0          # video only
    height: int = 0
    depth: int = 0
    channels: int = 0       # audio only
    sample_bits: int = 0
    sample_rate: int = 0
    # per-sample arrays (vectorized expansion of the stbl tables)
    offsets: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    sizes: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    dts: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    durations: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    # presentation times: dts + ctts/trun composition offsets, shifted
    # by the edit list (negative = trimmed pre-roll before the edit's
    # media_time). == dts when the stream has no reordering.
    pts: np.ndarray = field(default_factory=lambda: np.empty(0, np.int64))
    # raw elst entries (seg_dur_movie_ts, media_time, rate) — applied
    # by parse_mp4 once the MOVIE timescale is known
    elst: list = field(default_factory=list)

    @property
    def n_samples(self) -> int:
        return int(self.sizes.shape[0])

    def duration_ms(self) -> int:
        if not self.timescale:
            return 0
        return int(self.duration * 1000 // self.timescale)


@dataclass
class Mp4Info:
    major_brand: str
    timescale: int          # mvhd
    duration: int           # mvhd units
    tracks: List[Mp4Track]

    def duration_ms(self) -> int:
        if not self.timescale:
            return 0
        return int(self.duration * 1000 // self.timescale)

    def video(self) -> Optional[Mp4Track]:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None

    def audio(self) -> Optional[Mp4Track]:
        for t in self.tracks:
            if t.handler == "soun":
                return t
        return None


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------


def parse_mp4(data: bytes) -> Mp4Info:
    """Parse an MP4/QuickTime file — progressive (``stbl``) or
    fragmented (``moof``/``trun``) — into per-track sample tables.
    Raises :class:`Mp4Error` on malformed input and
    ``NotImplementedError`` on the documented seams (non-standard edit
    list shapes, implicit previous-traf base offsets)."""
    if data is None or len(data) < 16:
        raise Mp4Error("payload too short for an MP4")
    major = b"????"
    moov: Optional[Tuple[int, int]] = None
    moofs: List[Tuple[int, int, int]] = []  # (moof_start, body_start, end)
    for t, b, e in _iter_boxes(data, 0, len(data)):
        if t == b"ftyp":
            major = data[b : b + 4]
        elif t == b"moov":
            moov = (b, e)
        elif t == b"moof":
            moofs.append((b - 8, b, e))
    if moov is None:
        raise Mp4Error("no moov box")
    ms, me = moov
    mvhd = _find(data, ms, me, b"mvhd")
    if mvhd is None:
        raise Mp4Error("no mvhd box")
    ver, _ = _full(data, mvhd[0])
    if ver == 1:
        # v1: creation(8) modification(8) precede timescale(4)/duration(8)
        ts, dur = struct.unpack_from(">IQ", data, mvhd[0] + 4 + 16)
    else:
        _, _, ts, dur = struct.unpack_from(">IIII", data, mvhd[0] + 4)
    tracks = []
    for t, b, e in _iter_boxes(data, ms, me):
        if t == b"trak":
            tracks.append(_parse_trak(data, b, e))
    if moofs:
        trex = {}
        mvex = _find(data, ms, me, b"mvex")
        if mvex is not None:
            trex = _parse_mvex(data, mvex[0], mvex[1])
        _apply_fragments(data, moofs, tracks, trex)
    for tr in tracks:  # edit lists shift pts once the movie ts is known
        _apply_elst(tr, ts)
    info = Mp4Info(major_brand=major.decode("latin1"), timescale=ts,
                   duration=dur, tracks=tracks)
    return info


# ---------------------------------------------------------------------------
# fragmented layout (moof/traf/trun, ISO 14496-12 §8.8)
# ---------------------------------------------------------------------------

_TFHD_BASE_OFFSET = 0x000001
_TFHD_SAMPLE_DESC = 0x000002
_TFHD_DEF_DURATION = 0x000008
_TFHD_DEF_SIZE = 0x000010
_TFHD_DEF_FLAGS = 0x000020
_TFHD_BASE_IS_MOOF = 0x020000

_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_SAMPLE_DURATION = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTS = 0x000800


def _parse_mvex(data: bytes, start: int, end: int) -> dict:
    """trex boxes → per-track (default_sample_duration, default_sample_size)."""
    out = {}
    for t, b, e in _iter_boxes(data, start, end):
        if t == b"trex":
            tid, _desc, ddur, dsize, _dflags = struct.unpack_from(">IIIII", data, b + 4)
            out[tid] = (ddur, dsize)
    return out


def _apply_fragments(data: bytes, moofs: List[Tuple[int, int, int]],
                     tracks: List[Mp4Track], trex: dict) -> None:
    """Walk every moof/traf/trun, expand per-sample offset/size/duration
    arrays (vectorized per trun) and append them to the moov tracks."""
    by_id = {tr.track_id: tr for tr in tracks}
    acc = {tid: {"off": [], "size": [], "dur": [], "dts": [], "cts": [],
                 "next_dts": 0}
           for tid in by_id}
    for moof_start, body, end in moofs:
        for t, b, e in _iter_boxes(data, body, end):
            if t == b"traf":
                _parse_traf(data, b, e, moof_start, by_id, trex, acc)
    for tid, tr in by_id.items():
        a = acc[tid]
        if not a["off"]:
            continue
        off = np.concatenate(a["off"])
        size = np.concatenate(a["size"])
        dur = np.concatenate(a["dur"])
        dts = np.concatenate(a["dts"])
        cts = np.concatenate(a["cts"])
        if size.size and int((off + size).max()) > len(data):
            raise Mp4Error("fragment sample byte range overruns the file")
        tr.offsets = np.concatenate([tr.offsets, off])
        tr.sizes = np.concatenate([tr.sizes, size])
        tr.durations = np.concatenate([tr.durations, dur])
        tr.dts = np.concatenate([tr.dts, dts])
        tr.pts = np.concatenate([tr.pts, dts + cts])
        total = int(tr.dts[-1] + tr.durations[-1]) if tr.dts.size else 0
        tr.duration = max(tr.duration, total)


def _parse_traf(data: bytes, start: int, end: int, moof_start: int,
                by_id: dict, trex: dict, acc: dict) -> None:
    tfhd = _find(data, start, end, b"tfhd")
    if tfhd is None:
        raise Mp4Error("traf without tfhd")
    _, flags = _full(data, tfhd[0])
    off = tfhd[0] + 4
    (tid,) = struct.unpack_from(">I", data, off)
    off += 4
    if tid not in by_id:
        raise Mp4Error(f"traf references unknown track {tid}")
    base: Optional[int] = None
    if flags & _TFHD_BASE_OFFSET:
        (base,) = struct.unpack_from(">Q", data, off)
        off += 8
    if flags & _TFHD_SAMPLE_DESC:
        off += 4
    def_dur, def_size = trex.get(tid, (0, 0))
    if flags & _TFHD_DEF_DURATION:
        (def_dur,) = struct.unpack_from(">I", data, off)
        off += 4
    if flags & _TFHD_DEF_SIZE:
        (def_size,) = struct.unpack_from(">I", data, off)
        off += 4
    if base is None:
        if flags & _TFHD_BASE_IS_MOOF:
            base = moof_start
        else:
            raise NotImplementedError(
                "tfhd without base-data-offset or default-base-is-moof "
                "(implicit previous-traf chaining) is not supported"
            )
    a = acc[tid]
    tfdt = _find(data, start, end, b"tfdt")
    if tfdt is not None:
        ver, _ = _full(data, tfdt[0])
        if ver == 1:
            (a["next_dts"],) = struct.unpack_from(">Q", data, tfdt[0] + 4)
        else:
            (a["next_dts"],) = struct.unpack_from(">I", data, tfdt[0] + 4)
    cursor: Optional[int] = None  # byte position after the previous trun
    for t, b, e in _iter_boxes(data, start, end):
        if t != b"trun":
            continue
        cursor = _parse_trun(data, b, base, cursor, def_dur, def_size, a)


def _parse_trun(data: bytes, body: int, base: int, cursor: Optional[int],
                def_dur: int, def_size: int, acc_entry: dict) -> int:
    ver, flags = _full(data, body)
    (n,) = struct.unpack_from(">I", data, body + 4)
    off = body + 8
    if flags & _TRUN_DATA_OFFSET:
        (doff,) = struct.unpack_from(">i", data, off)
        off += 4
        start = base + doff
    elif cursor is not None:
        start = cursor
    else:
        raise Mp4Error("first trun of a traf lacks data_offset")
    if flags & _TRUN_FIRST_FLAGS:
        off += 4
    fields = [f for f, present in (
        ("dur", flags & _TRUN_SAMPLE_DURATION),
        ("size", flags & _TRUN_SAMPLE_SIZE),
        ("flg", flags & _TRUN_SAMPLE_FLAGS),
        ("cts", flags & _TRUN_SAMPLE_CTS),
    ) if present]
    if fields:
        rec = np.frombuffer(
            data, dtype=np.dtype({"names": fields,
                                  "formats": [">u4"] * len(fields),
                                  "itemsize": 4 * len(fields)}),
            count=n, offset=off)
    else:
        rec = None
    if rec is not None and "cts" in fields:
        cts = rec["cts"].astype(np.int64)
        if ver >= 1:  # trun v1: signed composition offsets
            cts = np.where(cts >= 2**31, cts - 2**32, cts)
    else:
        cts = np.zeros(n, dtype=np.int64)
    if rec is not None and "dur" in fields:
        durs = rec["dur"].astype(np.int64)
    else:
        if not def_dur and n:
            raise Mp4Error("trun samples have no duration (no default either)")
        durs = np.full(n, def_dur, dtype=np.int64)
    if rec is not None and "size" in fields:
        sizes = rec["size"].astype(np.int64)
    else:
        if not def_size and n:
            raise Mp4Error("trun samples have no size (no default either)")
        sizes = np.full(n, def_size, dtype=np.int64)
    offs = start + np.concatenate(([0], np.cumsum(sizes)[:-1])) if n else \
        np.empty(0, np.int64)
    dts0 = acc_entry["next_dts"]
    dts = dts0 + np.concatenate(([0], np.cumsum(durs)[:-1])) if n else \
        np.empty(0, np.int64)
    acc_entry["next_dts"] = int(dts0 + durs.sum())
    acc_entry["off"].append(offs)
    acc_entry["size"].append(sizes)
    acc_entry["dur"].append(durs)
    acc_entry["dts"].append(dts)
    acc_entry["cts"].append(cts)
    return int(start + sizes.sum())


def _parse_trak(data: bytes, start: int, end: int) -> Mp4Track:
    tkhd = _find(data, start, end, b"tkhd")
    if tkhd is None:
        raise Mp4Error("trak without tkhd")
    ver, _ = _full(data, tkhd[0])
    if ver == 1:
        track_id = struct.unpack_from(">I", data, tkhd[0] + 4 + 16)[0]
    else:
        track_id = struct.unpack_from(">I", data, tkhd[0] + 4 + 8)[0]
    elst_entries: list = []
    edts = _find(data, start, end, b"edts")
    if edts is not None:
        elst = _find(data, edts[0], edts[1], b"elst")
        if elst is not None:
            ver, _ = _full(data, elst[0])
            (n_ent,) = struct.unpack_from(">I", data, elst[0] + 4)
            off = elst[0] + 8
            for _i in range(n_ent):
                if ver == 1:
                    seg_dur, media_t = struct.unpack_from(">Qq", data, off)
                    off += 16
                else:
                    seg_dur, media_t = struct.unpack_from(">Ii", data, off)
                    off += 8
                rate_i, rate_f = struct.unpack_from(">hH", data, off)
                off += 4
                elst_entries.append(
                    (int(seg_dur), int(media_t), rate_i + rate_f / 65536.0)
                )
    mdia = _find(data, start, end, b"mdia")
    if mdia is None:
        raise Mp4Error("trak without mdia")
    mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
    hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
    minf = _find(data, mdia[0], mdia[1], b"minf")
    if mdhd is None or hdlr is None or minf is None:
        raise Mp4Error("mdia missing mdhd/hdlr/minf")
    ver, _ = _full(data, mdhd[0])
    if ver == 1:
        ts, dur = struct.unpack_from(">IQ", data, mdhd[0] + 4 + 16)
    else:
        _, _, ts, dur = struct.unpack_from(">IIII", data, mdhd[0] + 4)
    handler = data[hdlr[0] + 8 : hdlr[0] + 12].decode("latin1")
    stbl = _find(data, minf[0], minf[1], b"stbl")
    if stbl is None:
        raise Mp4Error("minf without stbl")
    tr = _parse_stbl(data, stbl[0], stbl[1], track_id, handler, ts, dur)
    tr.elst = elst_entries
    return tr


def _apply_elst(tr: Mp4Track, movie_ts: int) -> None:
    """Apply the edit list to the track's presentation times. Supported
    shape: an optional leading EMPTY edit (media_time == -1, a
    presentation delay in MOVIE timescale) followed by exactly one
    rate-1.0 forward edit whose media_time shifts the media timeline
    (samples composed before it get negative pts = trimmed pre-roll,
    the standard start_time convention). Repeating / multi-segment /
    rate-warped edits stay a typed seam."""
    if not tr.elst:
        return
    ents = list(tr.elst)
    shift = 0
    if ents and ents[0][1] == -1:  # empty edit: delay, movie timescale
        if movie_ts <= 0:
            raise Mp4Error("empty edit with zero movie timescale")
        shift = int(round(ents[0][0] * tr.timescale / movie_ts))
        ents = ents[1:]
    if len(ents) != 1 or ents[0][2] != 1.0 or ents[0][1] < 0:
        raise NotImplementedError(
            "unsupported edit list shape: only [optional empty edit] + "
            "one rate-1.0 forward edit is supported "
            f"(entries={tr.elst!r})"
        )
    tr.pts = tr.pts - int(ents[0][1]) + shift


def _parse_stbl(data: bytes, start: int, end: int, track_id: int,
                handler: str, timescale: int, duration: int) -> Mp4Track:
    boxes = {}
    for t, b, e in _iter_boxes(data, start, end):
        boxes[t] = (b, e)
    for req in (b"stsd", b"stts", b"stsc", b"stsz"):
        if req not in boxes:
            raise Mp4Error(f"stbl missing {req.decode('latin1')}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise Mp4Error("stbl missing stco/co64")

    tr = Mp4Track(track_id=track_id, handler=handler, codec="",
                  timescale=timescale, duration=duration)
    _parse_stsd(data, boxes[b"stsd"][0], handler, tr)

    # ---- stts: run-length (count, delta) -> per-sample dts/duration
    b0 = boxes[b"stts"][0]
    (n_runs,) = struct.unpack_from(">I", data, b0 + 4)
    stts = np.frombuffer(data, dtype=">u4", count=2 * n_runs, offset=b0 + 8)
    counts = stts[0::2].astype(np.int64)
    deltas = stts[1::2].astype(np.int64)
    durations = np.repeat(deltas, counts)
    dts = np.concatenate(([0], np.cumsum(durations)[:-1])) if durations.size else durations

    # ---- stsz: uniform or per-sample sizes
    b0 = boxes[b"stsz"][0]
    uniform, n_samples = struct.unpack_from(">II", data, b0 + 4)
    if uniform:
        sizes = np.full(n_samples, uniform, dtype=np.int64)
    else:
        sizes = np.frombuffer(
            data, dtype=">u4", count=n_samples, offset=b0 + 12
        ).astype(np.int64)
    if durations.shape[0] != n_samples:
        raise Mp4Error(
            f"stts covers {durations.shape[0]} samples but stsz declares {n_samples}"
        )

    # ---- chunk offsets
    if b"stco" in boxes:
        b0 = boxes[b"stco"][0]
        (n_chunks,) = struct.unpack_from(">I", data, b0 + 4)
        chunk_off = np.frombuffer(
            data, dtype=">u4", count=n_chunks, offset=b0 + 8
        ).astype(np.int64)
    else:
        b0 = boxes[b"co64"][0]
        (n_chunks,) = struct.unpack_from(">I", data, b0 + 4)
        chunk_off = np.frombuffer(
            data, dtype=">u8", count=n_chunks, offset=b0 + 8
        ).astype(np.int64)

    # ---- stsc: (first_chunk, samples_per_chunk) runs -> per-sample chunk
    b0 = boxes[b"stsc"][0]
    (n_runs,) = struct.unpack_from(">I", data, b0 + 4)
    stsc = np.frombuffer(data, dtype=">u4", count=3 * n_runs, offset=b0 + 8)
    first_chunk = stsc[0::3].astype(np.int64)  # 1-based
    spc_runs = stsc[1::3].astype(np.int64)
    if n_runs:
        if first_chunk[0] != 1 or np.any(np.diff(first_chunk) <= 0):
            raise Mp4Error("stsc first_chunk runs not strictly increasing from 1")
        run_len = np.diff(np.append(first_chunk, n_chunks + 1))
        spc = np.repeat(spc_runs, run_len)          # samples per chunk, len n_chunks
    else:
        spc = np.empty(0, np.int64)
    declared = int(spc.sum())
    if declared < n_samples:
        raise Mp4Error(f"stsc maps only {declared} of {n_samples} samples to chunks")
    chunk_idx = np.repeat(np.arange(n_chunks, dtype=np.int64), spc)[:n_samples]
    # offset within chunk = running size sum since the chunk's first sample
    csum = np.cumsum(sizes) - sizes                 # bytes before each sample
    chunk_first = np.concatenate(([0], np.cumsum(spc)[:-1])) if n_chunks else spc
    first_sample_of_chunk = np.minimum(chunk_first, max(n_samples - 1, 0))
    base_csum = csum[first_sample_of_chunk][chunk_idx] if n_samples else csum
    offsets = chunk_off[chunk_idx] + (csum - base_csum)

    file_end = len(data)
    if n_samples and int((offsets + sizes).max()) > file_end:
        raise Mp4Error("sample byte range overruns the file")

    # ---- ctts: run-length (count, offset) composition offsets.
    # v0 offsets are unsigned, v1 signed (ISO 14496-12 §8.6.1.3);
    # pts = dts + offset — the B-frame reorder map.
    if b"ctts" in boxes:
        b0 = boxes[b"ctts"][0]
        ver, _ = _full(data, b0)
        (n_runs,) = struct.unpack_from(">I", data, b0 + 4)
        raw = np.frombuffer(data, dtype=">u4", count=2 * n_runs, offset=b0 + 8)
        counts = raw[0::2].astype(np.int64)
        offs = raw[1::2].astype(np.int64)
        if ver == 1:  # reinterpret as signed 32-bit
            offs = np.where(offs >= 2**31, offs - 2**32, offs)
        cts_off = np.repeat(offs, counts)
        if cts_off.shape[0] != n_samples:
            raise Mp4Error(
                f"ctts covers {cts_off.shape[0]} samples, stsz declares "
                f"{n_samples}"
            )
        pts = dts + cts_off
    else:
        pts = dts.copy()

    tr.offsets, tr.sizes, tr.dts, tr.durations = offsets, sizes, dts, durations
    tr.pts = pts
    return tr


def _parse_stsd(data: bytes, body: int, handler: str, tr: Mp4Track) -> None:
    (entry_count,) = struct.unpack_from(">I", data, body + 4)
    if entry_count < 1:
        raise Mp4Error("stsd with no entries")
    entry = body + 8
    size, fourcc = struct.unpack_from(">I4s", data, entry)
    tr.codec = fourcc.decode("latin1")
    # SampleEntry: 6 reserved bytes + data_reference_index
    se = entry + 8 + 6 + 2
    if handler == "vide":
        # VisualSampleEntry: pre_defined(2) reserved(2) pre_defined(12)
        # width(2) height(2) hres(4) vres(4) reserved(4) frame_count(2)
        # compressorname(32) depth(2) pre_defined(2)
        tr.width, tr.height = struct.unpack_from(">HH", data, se + 16)
        (tr.depth,) = struct.unpack_from(">H", data, se + 16 + 4 + 4 + 4 + 4 + 2 + 32)
    elif handler == "soun":
        # AudioSampleEntry (v0): version(2) revision(2) vendor(4)
        # channels(2) samplesize(2) compression_id(2) packet_size(2)
        # samplerate(4, 16.16 fixed)
        tr.channels, tr.sample_bits = struct.unpack_from(">HH", data, se + 8)
        (rate_fx,) = struct.unpack_from(">I", data, se + 16)
        tr.sample_rate = rate_fx >> 16


# ---------------------------------------------------------------------------
# sample extraction / real decode
# ---------------------------------------------------------------------------


def extract_samples(data: bytes, track: Mp4Track,
                    indices: Optional[Sequence[int]] = None) -> List[bytes]:
    """Byte-range demux: the raw sample payloads (codec-agnostic)."""
    idx = range(track.n_samples) if indices is None else indices
    out = []
    for i in idx:
        o, s = int(track.offsets[i]), int(track.sizes[i])
        out.append(data[o : o + s])
    return out


def decode_raw_frames(data: bytes, track: Mp4Track,
                      indices: Optional[Sequence[int]] = None) -> List[np.ndarray]:
    """Decode ``'raw '`` uncompressed 24-bit RGB video samples to
    (h, w, 3) uint8 arrays.  Typed seam for entropy-coded codecs."""
    if track.codec != "raw ":
        raise NotImplementedError(
            f"pixel decode for codec {track.codec!r} is not available; "
            "only the QuickTime 'raw ' uncompressed RGB entry decodes "
            "(byte-range demux via extract_samples works for any codec)"
        )
    if track.depth not in (0, 24):
        raise Mp4Error(f"'raw ' depth {track.depth} unsupported (24-bit only)")
    w, h = track.width, track.height
    frames = []
    for b in extract_samples(data, track, indices):
        if len(b) != w * h * 3:
            raise Mp4Error(f"raw frame is {len(b)} bytes, expected {w * h * 3}")
        frames.append(np.frombuffer(b, dtype=np.uint8).reshape(h, w, 3))
    return frames


def decode_pcm_audio(data: bytes, track: Mp4Track) -> np.ndarray:
    """Decode ``'twos'``/``'sowt'`` 16-bit PCM to an int64 sample
    array (interleaved channels, matching the WAV certification)."""
    if track.codec not in ("twos", "sowt"):
        raise NotImplementedError(
            f"audio decode for codec {track.codec!r} is not available; "
            "only 'twos'/'sowt' 16-bit PCM decodes"
        )
    if track.sample_bits != 16:
        raise Mp4Error(f"{track.sample_bits}-bit PCM unsupported (16-bit only)")
    raw = b"".join(extract_samples(data, track))
    dt = ">i2" if track.codec == "twos" else "<i2"
    return np.frombuffer(raw, dtype=dt).astype(np.int64)


def presentation_order(track: Mp4Track) -> np.ndarray:
    """Stored-sample indices in PRESENTATION (pts) order — identity
    when the stream has no reordering (pts == dts)."""
    if track.pts.shape[0] != track.n_samples:
        return np.arange(track.n_samples, dtype=np.int64)
    return np.argsort(track.pts, kind="stable").astype(np.int64)


def frame_indices_at_fps(track: Mp4Track, fps: float) -> np.ndarray:
    """Real frame sampling on the PRESENTATION timeline: for each tick
    k/fps, the stored index of the sample presented at the tick (last
    pts <= tick) — the container-backed version of the synthetic
    frame_sample grid. With no ctts/elst, pts == dts and this is the
    decode-time grid it always was; reordered or edit-shifted streams
    sample what a viewer would SEE at the tick. Pre-roll samples
    (negative pts after an edit trim) are never selected unless
    nothing has been presented yet."""
    if fps <= 0:
        raise ValueError("fps must be positive")
    if track.n_samples == 0:
        return np.empty(0, np.int64)
    pts = (track.pts if track.pts.shape[0] == track.n_samples else track.dts)
    order = np.argsort(pts, kind="stable").astype(np.int64)
    sorted_pts = pts[order]
    end_ts = int(sorted_pts[-1]) + int(track.durations[order[-1]])
    end = end_ts / track.timescale if track.timescale else 0.0
    n_ticks = max(int(np.ceil(end * fps)), 1)
    ticks = (np.arange(n_ticks) / fps * track.timescale).astype(np.int64)
    idx = np.searchsorted(sorted_pts, ticks, side="right") - 1
    return order[np.clip(idx, 0, track.n_samples - 1)]


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _fullbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def _chunks_of(n_samples: int, samples_per_chunk: int) -> List[int]:
    """Chunk sizes for n samples at the given nominal chunk size."""
    if n_samples == 0:
        return []
    full, rem = divmod(n_samples, samples_per_chunk)
    out = [samples_per_chunk] * full
    if rem:
        out.append(rem)
    return out


def _stsc(chunk_sizes: List[int]) -> bytes:
    """Collapse per-chunk sample counts into stsc runs."""
    runs = []  # (first_chunk_1based, samples_per_chunk, desc_idx)
    for i, c in enumerate(chunk_sizes):
        if not runs or runs[-1][1] != c:
            runs.append((i + 1, c, 1))
    body = struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">III", *r) for r in runs
    )
    return _fullbox(b"stsc", 0, 0, body)


def _stts(durations: Sequence[int]) -> bytes:
    runs = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1][0] += 1
        else:
            runs.append([1, int(d)])
    body = struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">II", c, d) for c, d in runs
    )
    return _fullbox(b"stts", 0, 0, body)


def _ctts(offsets: Sequence[int]) -> bytes:
    """Run-length ctts, version 1 (signed offsets)."""
    runs: List[List[int]] = []
    for o in offsets:
        if runs and runs[-1][1] == int(o):
            runs[-1][0] += 1
        else:
            runs.append([1, int(o)])
    body = struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">Ii", c, o) for c, o in runs
    )
    return _fullbox(b"ctts", 1, 0, body)


def _edts(empty_dur_movie: int, media_time: int, seg_dur_movie: int) -> bytes:
    """edts/elst (version 0): optional empty edit (presentation delay)
    + one rate-1.0 forward edit at ``media_time``."""
    entries = []
    if empty_dur_movie:
        entries.append(struct.pack(">IiHH", empty_dur_movie, -1, 1, 0))
    entries.append(struct.pack(">IiHH", seg_dur_movie, media_time, 1, 0))
    body = struct.pack(">I", len(entries)) + b"".join(entries)
    return _box(b"edts", _fullbox(b"elst", 0, 0, body))


@dataclass
class _TrackPlan:
    handler: bytes
    codec: bytes
    timescale: int
    sample_payloads: List[bytes]
    sample_durations: List[int]
    samples_per_chunk: int
    width: int = 0
    height: int = 0
    channels: int = 0
    sample_rate: int = 0
    chunk_sizes: List[int] = field(default_factory=list)
    chunk_byte_lens: List[int] = field(default_factory=list)
    chunk_offsets: List[int] = field(default_factory=list)
    # fragmented layout: moov tables are empty; total duration comes
    # from the fragments instead of sample_durations
    frag_total_dur: int = 0
    # composition offsets (ctts, media ts units; None = no reordering)
    cts_offsets: Optional[List[int]] = None
    # (empty_edit_dur_movie_ts, media_time) elst; None = no edit list
    edit: Optional[Tuple[int, int]] = None

    def plan_chunks(self) -> None:
        self.chunk_sizes = _chunks_of(len(self.sample_payloads), self.samples_per_chunk)
        self.chunk_byte_lens = []
        i = 0
        for c in self.chunk_sizes:
            self.chunk_byte_lens.append(sum(len(p) for p in self.sample_payloads[i : i + c]))
            i += c


def encode_mp4(frames: Sequence[np.ndarray], fps: int = 30, *,
               audio: Optional[np.ndarray] = None, sample_rate: int = 8000,
               samples_per_chunk: int = 3, audio_samples_per_chunk: int = 1024,
               use_co64: bool = False, mdat_first: bool = True,
               timescale: int = 600,
               cts_offsets: Optional[Sequence[int]] = None,
               edit_media_time: int = 0,
               edit_empty_dur: int = 0) -> bytes:
    """Write a progressive MP4: one ``'raw '`` RGB24 video track from
    (h, w, 3) uint8 frames, optionally one ``'sowt'`` 16-bit PCM mono
    audio track.  ``samples_per_chunk``/``use_co64``/``mdat_first``
    vary the physical layout so tests can exercise every parser path.
    ``cts_offsets`` (per frame, media-ts units, may be negative) writes
    a v1 ``ctts`` box — frames are stored in the given (decode) order
    and PRESENTED at dts+offset; ``edit_media_time`` /
    ``edit_empty_dur`` (movie-ts units) write an ``edts/elst``
    (media-time shift / leading empty-edit delay).
    """
    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) or f.dtype != np.uint8 for f in frames):
        raise ValueError("all frames must be uint8 (h, w, 3)")
    if timescale % fps:
        raise ValueError("timescale must be a multiple of fps for exact durations")
    dur_per_frame = timescale // fps
    if cts_offsets is not None and len(cts_offsets) != len(frames):
        raise ValueError("cts_offsets must have one entry per frame")

    plans = [
        _TrackPlan(
            handler=b"vide", codec=b"raw ", timescale=timescale,
            sample_payloads=[f.tobytes() for f in frames],
            sample_durations=[dur_per_frame] * len(frames),
            samples_per_chunk=samples_per_chunk, width=w, height=h,
            cts_offsets=(list(cts_offsets) if cts_offsets is not None
                         else None),
            edit=((edit_empty_dur, edit_media_time)
                  if (edit_media_time or edit_empty_dur) else None),
        )
    ]
    if audio is not None:
        pcm = np.asarray(audio, dtype=np.int16)
        plans.append(
            _TrackPlan(
                handler=b"soun", codec=b"sowt", timescale=sample_rate,
                sample_payloads=[struct.pack("<h", int(v)) for v in pcm],
                sample_durations=[1] * len(pcm),
                samples_per_chunk=audio_samples_per_chunk,
                channels=1, sample_rate=sample_rate,
            )
        )
    for p in plans:
        p.plan_chunks()

    # interleave chunks round-robin across tracks inside one mdat
    order: List[Tuple[int, int]] = []  # (track_idx, chunk_idx)
    maxc = max(len(p.chunk_sizes) for p in plans)
    for c in range(maxc):
        for ti, p in enumerate(plans):
            if c < len(p.chunk_sizes):
                order.append((ti, c))
    mdat_payload_len = sum(p.chunk_byte_lens[c] for (ti, c) in order for p in [plans[ti]])

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp42")

    def layout(mdat_data_start: int) -> None:
        off = mdat_data_start
        for p in plans:
            p.chunk_offsets = [0] * len(p.chunk_sizes)
        for ti, c in order:
            plans[ti].chunk_offsets[c] = off
            off += plans[ti].chunk_byte_lens[c]

    if mdat_first:
        layout(len(ftyp) + 8)
        moov = _moov(plans, timescale, use_co64)
    else:
        # moov precedes mdat: moov length is layout-independent (stco
        # entry WIDTH is fixed by use_co64), so one dry pass sizes it
        layout(0)
        moov_len = len(_moov(plans, timescale, use_co64))
        layout(len(ftyp) + moov_len + 8)
        moov = _moov(plans, timescale, use_co64)

    mdat_body = bytearray()
    for ti, c in order:
        p = plans[ti]
        i = sum(p.chunk_sizes[:c])
        for payload in p.sample_payloads[i : i + p.chunk_sizes[c]]:
            mdat_body += payload
    assert len(mdat_body) == mdat_payload_len
    mdat = _box(b"mdat", bytes(mdat_body))

    return ftyp + (mdat + moov if mdat_first else moov + mdat)


def encode_mp4_fragmented(frames: Sequence[np.ndarray], fps: int = 30, *,
                          audio: Optional[np.ndarray] = None,
                          sample_rate: int = 8000,
                          frames_per_fragment: int = 4,
                          per_sample_fields: bool = False,
                          timescale: int = 600,
                          cts_offsets: Optional[Sequence[int]] = None) -> bytes:
    """Write a FRAGMENTED MP4 (CMAF-style): ``ftyp | moov(mvex/trex) |
    [moof mdat]*`` with one ``'raw '`` video traf (and optionally one
    PCM audio traf) per fragment.  ``per_sample_fields=True`` writes
    explicit per-sample duration+size arrays in each ``trun`` instead
    of tfhd defaults, exercising the structured-dtype parse path.
    Addressing uses default-base-is-moof + trun data_offset."""
    frames = list(frames)
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) or f.dtype != np.uint8 for f in frames):
        raise ValueError("all frames must be uint8 (h, w, 3)")
    if timescale % fps:
        raise ValueError("timescale must be a multiple of fps for exact durations")
    if frames_per_fragment < 1:
        raise ValueError("frames_per_fragment must be >= 1")
    if cts_offsets is not None and len(cts_offsets) != len(frames):
        raise ValueError("cts_offsets must have one entry per frame")
    dur = timescale // fps
    payload_v = [f.tobytes() for f in frames]
    vsize = w * h * 3

    plans = [
        _TrackPlan(handler=b"vide", codec=b"raw ", timescale=timescale,
                   sample_payloads=[], sample_durations=[],
                   samples_per_chunk=1, width=w, height=h,
                   frag_total_dur=dur * len(frames))
    ]
    trex = [(1, dur, vsize)]
    pcm = None
    if audio is not None:
        pcm = np.asarray(audio, dtype=np.int16)
        plans.append(
            _TrackPlan(handler=b"soun", codec=b"sowt", timescale=sample_rate,
                       sample_payloads=[], sample_durations=[],
                       samples_per_chunk=1, channels=1,
                       sample_rate=sample_rate, frag_total_dur=len(pcm))
        )
        trex.append((2, 1, 2))
    for p in plans:
        p.plan_chunks()

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"mp42")
    moov = _moov(plans, timescale, False, trex_defaults=trex)
    out = [ftyp, moov]

    n_frags = -(-len(frames) // frames_per_fragment)
    apf = -(-len(pcm) // n_frags) if pcm is not None else 0
    vdts = adts = 0
    for k in range(n_frags):
        vs = payload_v[k * frames_per_fragment : (k + 1) * frames_per_fragment]
        asamp = (pcm[k * apf : (k + 1) * apf] if pcm is not None
                 else np.empty(0, np.int16))

        cs = (list(cts_offsets[k * frames_per_fragment
                               : (k + 1) * frames_per_fragment])
              if cts_offsets is not None else None)

        def traf(tid: int, n: int, dts0: int, ddur: int, dsize: int,
                 sizes: List[int], doff: int,
                 cts: Optional[List[int]] = None) -> bytes:
            if per_sample_fields:
                tfhd = _fullbox(b"tfhd", 0, _TFHD_BASE_IS_MOOF,
                                struct.pack(">I", tid))
                trun_flags = (_TRUN_DATA_OFFSET | _TRUN_SAMPLE_DURATION
                              | _TRUN_SAMPLE_SIZE)
                if cts is not None:
                    trun_flags |= _TRUN_SAMPLE_CTS
                    body = struct.pack(">Ii", n, doff) + b"".join(
                        struct.pack(">IIi", ddur, s, c)
                        for s, c in zip(sizes, cts))
                else:
                    body = struct.pack(">Ii", n, doff) + b"".join(
                        struct.pack(">II", ddur, s) for s in sizes)
            else:
                tfhd = _fullbox(
                    b"tfhd", 0,
                    _TFHD_BASE_IS_MOOF | _TFHD_DEF_DURATION | _TFHD_DEF_SIZE,
                    struct.pack(">III", tid, ddur, dsize))
                trun_flags = _TRUN_DATA_OFFSET
                if cts is not None:
                    trun_flags |= _TRUN_SAMPLE_CTS
                    body = struct.pack(">Ii", n, doff) + b"".join(
                        struct.pack(">i", c) for c in cts)
                else:
                    body = struct.pack(">Ii", n, doff)
            tfdt = _fullbox(b"tfdt", 1, 0, struct.pack(">Q", dts0))
            # trun v1 = signed composition offsets
            trun = _fullbox(b"trun", 1 if cts is not None else 0,
                            trun_flags, body)
            return _box(b"traf", tfhd + tfdt + trun)

        def moof_bytes(doff_v: int, doff_a: int) -> bytes:
            mfhd = _fullbox(b"mfhd", 0, 0, struct.pack(">I", k + 1))
            trafs = traf(1, len(vs), vdts, dur, vsize,
                         [len(b) for b in vs], doff_v, cts=cs)
            if pcm is not None and asamp.size:
                trafs += traf(2, int(asamp.size), adts, 1, 2,
                              [2] * int(asamp.size), doff_a)
            return _box(b"moof", mfhd + trafs)

        # two-pass: moof size is independent of the offset VALUES
        probe = moof_bytes(0, 0)
        video_bytes = sum(len(b) for b in vs)
        moof = moof_bytes(len(probe) + 8, len(probe) + 8 + video_bytes)
        assert len(moof) == len(probe)
        mdat = _box(b"mdat",
                    b"".join(vs) + asamp.astype("<i2").tobytes())
        out.append(moof + mdat)
        vdts += dur * len(vs)
        adts += int(asamp.size)
    return b"".join(out)


def _moov(plans: List[_TrackPlan], movie_timescale: int, use_co64: bool,
          trex_defaults: Optional[List[Tuple[int, int, int]]] = None) -> bytes:
    movie_dur = 0
    for p in plans:
        tdur = sum(p.sample_durations) or p.frag_total_dur
        movie_dur = max(movie_dur, tdur * movie_timescale // p.timescale)
    mvhd = _fullbox(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0)                 # creation, modification
        + struct.pack(">II", movie_timescale, movie_dur)
        + struct.pack(">I", 0x00010000)          # rate 1.0
        + struct.pack(">H", 0x0100)              # volume 1.0
        + b"\x00" * 10
        + _unit_matrix()
        + b"\x00" * 24                           # pre_defined
        + struct.pack(">I", len(plans) + 1),     # next_track_ID
    )
    traks = b"".join(
        _trak(p, ti + 1, movie_timescale, use_co64) for ti, p in enumerate(plans)
    )
    mvex = b""
    if trex_defaults is not None:
        mvex = _box(b"mvex", b"".join(
            _fullbox(b"trex", 0, 0,
                     struct.pack(">IIIII", tid, 1, ddur, dsize, 0))
            for tid, ddur, dsize in trex_defaults
        ))
    return _box(b"moov", mvhd + traks + mvex)


def _unit_matrix() -> bytes:
    return struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def _trak(p: _TrackPlan, track_id: int, movie_timescale: int, use_co64: bool) -> bytes:
    tdur = sum(p.sample_durations) or p.frag_total_dur
    tkhd = _fullbox(
        b"tkhd", 0, 7,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", track_id, 0)
        + struct.pack(">I", tdur * movie_timescale // p.timescale)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100 if p.handler == b"soun" else 0, 0)
        + _unit_matrix()
        + struct.pack(">II", p.width << 16, p.height << 16),
    )
    mdhd = _fullbox(
        b"mdhd", 0, 0,
        struct.pack(">II", 0, 0)
        + struct.pack(">II", p.timescale, tdur)
        + struct.pack(">HH", 0x55C4, 0),         # language 'und'
    )
    hdlr = _fullbox(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + p.handler + b"\x00" * 12 + b"\x00",
    )
    if p.handler == b"vide":
        mhd = _fullbox(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        entry = _sample_entry_video(p)
    else:
        mhd = _fullbox(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
        entry = _sample_entry_audio(p)
    dinf = _box(b"dinf", _fullbox(
        b"dref", 0, 0, struct.pack(">I", 1) + _fullbox(b"url ", 0, 1, b"")
    ))
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _stts(p.sample_durations)
    stsc = _stsc(p.chunk_sizes)
    sizes = [len(b) for b in p.sample_payloads]
    if len(set(sizes)) == 1:
        stsz = _fullbox(b"stsz", 0, 0, struct.pack(">II", sizes[0], len(sizes)))
    else:
        stsz = _fullbox(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
    if use_co64:
        co = _fullbox(
            b"co64", 0, 0,
            struct.pack(">I", len(p.chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in p.chunk_offsets),
        )
    else:
        co = _fullbox(
            b"stco", 0, 0,
            struct.pack(">I", len(p.chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in p.chunk_offsets),
        )
    ctts = _ctts(p.cts_offsets) if p.cts_offsets is not None else b""
    stbl = _box(b"stbl", stsd + stts + ctts + stsc + stsz + co)
    minf = _box(b"minf", mhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    edts = b""
    if p.edit is not None:
        empty_dur, media_time = p.edit
        edts = _edts(empty_dur, media_time,
                     tdur * movie_timescale // p.timescale)
    return _box(b"trak", tkhd + edts + mdia)


def _sample_entry_video(p: _TrackPlan) -> bytes:
    return _box(
        p.codec,
        b"\x00" * 6 + struct.pack(">H", 1)       # data_reference_index
        + b"\x00" * 16                           # pre_defined/reserved
        + struct.pack(">HH", p.width, p.height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                   # frame_count
        + b"\x00" * 32                           # compressorname
        + struct.pack(">Hh", 24, -1),            # depth, pre_defined
    )


def _sample_entry_audio(p: _TrackPlan) -> bytes:
    return _box(
        p.codec,
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0)               # version, revision
        + struct.pack(">I", 0)                   # vendor
        + struct.pack(">HH", p.channels, 16)     # channels, sample size
        + struct.pack(">HH", 0, 0)               # compression id, packet size
        + struct.pack(">I", p.sample_rate << 16),
    )
