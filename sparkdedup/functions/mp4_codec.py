"""Minimal ISO BMFF (MP4) writer + parser in pure stdlib/numpy.

MP4 is a BOX-STRUCTURED container (ISO/IEC 14496-12): the tree of
length-prefixed boxes — ftyp / moov / mvhd / trak / mdhd / hdlr / stbl
(stsd stts stsc stsz stco) / mdat — is plain struct data, no entropy
coding. Parsing it yields every piece of metadata a curation pipeline
filters on (duration, track count, codec fourcc, sample count/sizes,
video dimensions) AND the exact coded-sample byte stream via the
stco/stsc/stsz walk, whose md5 is a container-independent content
identity: the same samples re-muxed with different box order or chunk
layout hash equal. Only the CODED FRAME decode (H.264/AAC entropy
decoding) needs external libraries — that single step remains the
documented stub in operators/multimodal.py.

The writer builds a self-consistent single-track file (two-pass: mdat
offset depends on moov size) so tests can round-trip metadata and prove
the chunk-layout-invariance of the sample hash without any external
media fixture.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_FULL = ("mvhd", "tkhd", "mdhd", "hdlr", "smhd", "vmhd",
         "stsd", "stts", "stsc", "stsz", "stco")


def _box(tag: str, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag.encode("ascii") + body


def _full(tag: str, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(tag, struct.pack(">B3s", version,
                                 flags.to_bytes(3, "big")) + body)


def encode_mp4(samples: list[bytes], timescale: int = 1000,
               sample_delta: int = 40, handler: str = "vide",
               codec: str = "avc1", width: int = 0, height: int = 0,
               chunks: list[int] | None = None) -> bytes:
    """One-track MP4 holding `samples` as coded frames.

    chunks: samples per chunk (default: all in one chunk) — exposed so
    tests can re-mux the SAME samples into different chunk layouts and
    assert the parser's sample-stream hash is invariant."""
    n = len(samples)
    if chunks is None:
        chunks = [n] if n else []
    if sum(chunks) != n:
        raise ValueError("chunks must partition the samples")
    duration = n * sample_delta

    mvhd = _full("mvhd", struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _full("tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16), flags=3)
    mdhd = _full("mdhd", struct.pack(
        ">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0))
    hdlr = _full("hdlr", struct.pack(">I", 0) + handler.encode("ascii")
                 + b"\x00" * 12 + b"sparkdedup\x00")
    # sample description: one entry, standard 8+6+2 header then an
    # opaque codec-specific body (enough for fourcc identification)
    entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16)
    stsd = _full("stsd", struct.pack(">I", 1) + entry)
    stts = _full("stts", struct.pack(">III", 1, n, sample_delta) if n
                 else struct.pack(">I", 0))
    # stsc runs: (first_chunk, samples_per_chunk, desc_id), merged runs
    runs: list[tuple[int, int]] = []
    for i, spc in enumerate(chunks):
        if not runs or runs[-1][1] != spc:
            runs.append((i + 1, spc))
    stsc = _full("stsc", struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">III", fc, spc, 1) for fc, spc in runs))
    sizes = [len(s) for s in samples]
    uniform = n > 0 and len(set(sizes)) == 1
    stsz = _full("stsz", struct.pack(">II", sizes[0] if uniform else 0, n)
                 + (b"" if uniform else b"".join(
                     struct.pack(">I", s) for s in sizes)))
    # chunk offsets are absolute: two-pass (assemble with zeros, patch)
    stco_body_at = [0]  # filled below

    def assemble(offsets: list[int]) -> bytes:
        stco = _full("stco", struct.pack(">I", len(offsets)) + b"".join(
            struct.pack(">I", o) for o in offsets))
        stbl = _box("stbl", stsd + stts + stsc + stsz + stco)
        media_hdr = (_full("smhd", struct.pack(">HH", 0, 0))
                     if handler == "soun" else
                     _full("vmhd", struct.pack(">HHHH", 0, 0, 0, 0),
                           flags=1))
        dref = _full("dref", struct.pack(">I", 1)
                     + _full("url ", b"", flags=1))
        minf = _box("minf", media_hdr + _box("dinf", dref) + stbl)
        mdia = _box("mdia", mdhd + hdlr + minf)
        trak = _box("trak", tkhd + mdia)
        moov = _box("moov", mvhd + trak)
        ftyp = _box("ftyp", b"isom" + struct.pack(">I", 0x200)
                    + b"isom" + b"iso2")
        mdat = _box("mdat", b"".join(samples))
        return ftyp + moov + mdat

    blank = assemble([0] * len(chunks))
    mdat_payload_at = len(blank) - sum(sizes)
    offs, pos, si = [], mdat_payload_at, 0
    for spc in chunks:
        offs.append(pos)
        pos += sum(sizes[si: si + spc])
        si += spc
    return assemble(offs)


@dataclass
class Mp4Track:
    handler: str = ""
    codec: str = ""
    timescale: int = 0
    duration: float = 0.0
    n_samples: int = 0
    width: int = 0
    height: int = 0
    sample_sizes: np.ndarray = field(
        default_factory=lambda: np.empty(0, np.int64))
    sample_bytes: bytes = b""


@dataclass
class Mp4Info:
    major_brand: str = ""
    timescale: int = 0
    duration: float = 0.0
    tracks: list[Mp4Track] = field(default_factory=list)


def _walk(buf: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for sibling boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        tag = buf[pos + 4: pos + 8].decode("latin-1")
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("box overruns container")
        yield tag, pos + hdr, pos + size
        pos += size
    if pos != end:
        # fewer than 8 bytes left that are not a box: a truncated box
        # header (real files pad with proper 'free' boxes, never raw tails)
        raise ValueError("trailing bytes are not a box")


def _full_body(buf: bytes, s: int) -> tuple[int, int]:
    """(version, body_start_after_version_flags)."""
    return buf[s], s + 4


def parse_mp4(payload: bytes) -> Mp4Info:
    """Box-tree parse -> container metadata + per-track coded samples.

    Raises ValueError on malformed/truncated structure (callers treat
    that as 'corrupt', same contract as the other codecs)."""
    buf = payload
    info = Mp4Info()
    for tag, s, e in _walk(buf, 0, len(buf)):
        if tag == "ftyp":
            info.major_brand = buf[s: s + 4].decode("latin-1")
        elif tag == "moov":
            _parse_moov(buf, s, e, info)
    if not info.major_brand:
        raise ValueError("no ftyp box")
    return info


def _parse_moov(buf: bytes, start: int, end: int, info: Mp4Info) -> None:
    for tag, s, e in _walk(buf, start, end):
        if tag == "mvhd":
            v, b = _full_body(buf, s)
            if v == 1:
                ts, dur = struct.unpack_from(">IQ", buf, b + 16)
            else:
                ts, dur = struct.unpack_from(">II", buf, b + 8)
            info.timescale = ts
            info.duration = dur / ts if ts else 0.0
        elif tag == "trak":
            info.tracks.append(_parse_trak(buf, s, e))


def _parse_trak(buf: bytes, start: int, end: int) -> Mp4Track:
    t = Mp4Track()
    for tag, s, e in _walk(buf, start, end):
        if tag == "tkhd":
            v, b = _full_body(buf, s)
            base = b + (32 if v == 1 else 20)
            w, h = struct.unpack_from(">II", buf, base + 52)
            t.width, t.height = w >> 16, h >> 16
        elif tag == "mdia":
            _parse_mdia(buf, s, e, t)
    return t


def _parse_mdia(buf: bytes, start: int, end: int, t: Mp4Track) -> None:
    for tag, s, e in _walk(buf, start, end):
        if tag == "mdhd":
            v, b = _full_body(buf, s)
            if v == 1:
                ts, dur = struct.unpack_from(">IQ", buf, b + 16)
            else:
                ts, dur = struct.unpack_from(">II", buf, b + 8)
            t.timescale = ts
            t.duration = dur / ts if ts else 0.0
        elif tag == "hdlr":
            t.handler = buf[s + 8: s + 12].decode("latin-1")
        elif tag == "minf":
            for tag2, s2, e2 in _walk(buf, s, e):
                if tag2 == "stbl":
                    _parse_stbl(buf, s2, e2, t)


def _parse_stbl(buf: bytes, start: int, end: int, t: Mp4Track) -> None:
    stco: np.ndarray | None = None
    stsc: list[tuple[int, int]] = []
    for tag, s, e in _walk(buf, start, end):
        if tag == "stsd":
            _v, b = _full_body(buf, s)
            n_entries = struct.unpack_from(">I", buf, b)[0]
            if n_entries:
                t.codec = buf[b + 8: b + 12].decode("latin-1")
        elif tag == "stsz":
            _v, b = _full_body(buf, s)
            uniform, n = struct.unpack_from(">II", buf, b)
            t.n_samples = n
            if uniform:
                t.sample_sizes = np.full(n, uniform, np.int64)
            else:
                t.sample_sizes = np.frombuffer(
                    buf, ">u4", n, b + 8).astype(np.int64)
        elif tag == "stco":
            _v, b = _full_body(buf, s)
            n = struct.unpack_from(">I", buf, b)[0]
            stco = np.frombuffer(buf, ">u4", n, b + 4).astype(np.int64)
        elif tag == "stsc":
            _v, b = _full_body(buf, s)
            n = struct.unpack_from(">I", buf, b)[0]
            for i in range(n):
                fc, spc, _d = struct.unpack_from(">III", buf, b + 4 + 12 * i)
                stsc.append((fc, spc))
    # sample byte stream via the chunk walk (stsc runs expand to a
    # samples-per-chunk list over the stco chunk table)
    if stco is not None and len(stsc) and t.n_samples:
        # np.full(-1), not np.empty: a malformed stsc (first_chunk gap or
        # out-of-range run) must fail deterministically, not read
        # uninitialized memory
        spc_per_chunk = np.full(len(stco), -1, np.int64)
        for i, (fc, spc) in enumerate(stsc):
            last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(stco)
            spc_per_chunk[fc - 1: last] = spc
        if (spc_per_chunk < 0).any():
            raise ValueError("stsc runs leave chunks uncovered")
        parts, si = [], 0
        for ci, off in enumerate(stco):
            k = int(spc_per_chunk[ci])
            sz = int(t.sample_sizes[si: si + k].sum())
            if off + sz > len(buf):
                raise ValueError("chunk overruns file")
            parts.append(buf[off: off + sz])
            si += k
        t.sample_bytes = b"".join(parts)
        if si != t.n_samples:
            raise ValueError("stsc/stco walk disagrees with stsz count")
