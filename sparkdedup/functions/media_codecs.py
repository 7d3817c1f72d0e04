"""Pure-numpy media codecs: BMP (24-bit), WAV (PCM16), PNG (8-bit RGB/A).

No external imaging/audio libraries exist in this environment, but these
three formats are fully decodable with numpy + the stdlib (`zlib` for
PNG), which makes the multimodal decode path REAL rather than stubbed:
parse the container, produce the pixel/sample array, derive features.
Encoders exist so tests and fixtures can generate deterministic payloads.

Formats outside this set (JPEG, MP4, ...) still route to the documented
deterministic stub in operators/multimodal.py — entropy-coded codecs
genuinely need external decoders.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# BMP: uncompressed 24-bit bottom-up (the classic BITMAPINFOHEADER layout)
# --------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP core header")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=row_size * h, offset=data_off)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# --------------------------------------------------------------------------
# WAV: RIFF/WAVE with PCM 16-bit data
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) int16 mono samples -> WAV bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV -> ((n,) int16 mono-mixed samples, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, n = 12, len(payload)
    sample_rate, n_channels, bits = None, 1, 16
    samples = None
    while pos + 8 <= n:
        cid = payload[pos: pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if sample_rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    if n_channels > 1:
        samples = (samples.reshape(-1, n_channels)
                   .mean(axis=1).astype(np.int16))
    return samples, sample_rate


# --------------------------------------------------------------------------
# PNG: 8-bit RGB / RGBA, zlib scanlines with filters 0-4
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> PNG bytes (filter 0 scanlines)."""
    h, w, ch = pixels.shape
    ctype = 2 if ch == 3 else 6

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * ch)],
        axis=1).tobytes()
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit RGB/RGBA PNG -> (h, w, ch) uint8 (defilters types 0-4)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, []
    w = h = ctype = None
    while pos + 8 <= len(payload):
        ln = struct.unpack_from(">I", payload, pos)[0]
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or ctype not in (2, 6) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, ctype={ctype})")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = 3 if ctype == 2 else 4
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):  # rows are sequential (filters reference the row above)
        f, cur = int(filters[y]), lines[y].copy()
        prev = out[y - 1].astype(np.int16) if y else np.zeros(stride, np.int16)
        if f == 0:
            out[y] = cur.astype(np.uint8)
        elif f == 2:  # Up
            out[y] = ((cur + prev) & 0xFF).astype(np.uint8)
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left-neighbor scan
            row = np.zeros(stride, dtype=np.int16)
            for x in range(stride):
                a = row[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                row[x] = (cur[x] + pred) & 0xFF
            out[y] = row.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, ch)


# --------------------------------------------------------------------------
# feature derivation (the decode -> resize / frame-sample steps)
# --------------------------------------------------------------------------

def image_features(pixels: np.ndarray, thumb: int = 3) -> np.ndarray:
    """(h,w,ch) -> float32 features: dims, per-channel mean/std, and a
    thumb x thumb block-mean grayscale thumbnail (the 'resize' op)."""
    h, w = pixels.shape[:2]
    rgb = pixels[:, :, :3].astype(np.float32)
    gray = rgb.mean(axis=2)
    ys = np.linspace(0, h, thumb + 1).astype(int)
    xs = np.linspace(0, w, thumb + 1).astype(int)
    tiles = [gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean() / 255.0
             for i in range(thumb) for j in range(thumb)]
    head = [float(w), float(h),
            *(rgb.mean(axis=(0, 1)) / 255.0),
            *(rgb.std(axis=(0, 1)) / 255.0)]
    return np.asarray(head + tiles, dtype=np.float32)


def audio_features(samples: np.ndarray, sample_rate: int,
                   n_frames: int = 8) -> np.ndarray:
    """(n,) int16 -> float32 features: rate, duration, rms, zero-cross
    rate, and n_frames frame-sampled energies (the 'frame-sample' op)."""
    x = samples.astype(np.float32) / 32768.0
    n = len(x)
    dur = n / sample_rate if sample_rate else 0.0
    rms = float(np.sqrt((x * x).mean())) if n else 0.0
    zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 else 0.0
    bounds = np.linspace(0, n, n_frames + 1).astype(int)
    frames = [float(np.sqrt((x[bounds[i]:max(bounds[i + 1], bounds[i] + 1)] ** 2
                             ).mean())) if n else 0.0 for i in range(n_frames)]
    return np.asarray([float(sample_rate), dur, rms, zcr] + frames,
                      dtype=np.float32)
