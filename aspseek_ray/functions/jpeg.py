"""Baseline JPEG (ITU-T T.81 sequential DCT, JFIF colorspace) codec in
pure numpy + stdlib — no PIL/libjpeg in this container, so the transform
chain is implemented from the public spec: marker parsing (SOI/APP/DQT/
DHT/SOF0/DRI/SOS/RSTn/EOI), canonical Huffman coding with byte stuffing,
run/size AC coding (EOB/ZRL), dequantization over the zigzag order, the
orthonormal 8x8 DCT as one batched matmul, 4:4:4 and 4:2:0 chroma
subsampling, restart-marker resync, and the JFIF YCbCr<->RGB integer
conversion.

Reference role: the reference's media handling stops at Content-Type
sniffing (SURVEY §2 O6 — images are fetched, typed and size-capped, never
decoded); the decode stage here serves the training-data multimodal
pipelines (pipelines/multimodal.py) where JPEG is the dominant web image
payload.

Exactness contract the oracle relies on: for an image whose every MCU
(8x8 for gray/4:4:4, 16x16 for 4:2:0) is a single constant color and a
flat (all-ones) quantization table, the full chain
FDCT -> quantize -> Huffman -> entropy bytes -> Huffman^-1 -> dequantize
-> IDCT is BITWISE lossless: a constant block has one DC coefficient
8*(v-128) (an exact small integer in float64), every AC coefficient
rounds to zero, and the IDCT returns v with ~1e-13 float error, far
inside the round-to-int radius. Chroma box-downsampling of a constant
MCU is exact too. The independent-codec fixture
(pipelines/multimodal.synth_jpeg_media_table) exploits this to pin the
engine's JPEG decode against a SQL-decoded BMP twin, same contract as the
PNG/GIF oracles.

The entropy decoder walks codes bit-by-bit in Python (a Huffman stream is
inherently sequential); everything block-shaped — dequantize, IDCT,
plane assembly, upsampling, color conversion — is batched numpy. Fine
for fixture- and crawl-thumbnail-scale payloads; a 100-TB image corpus
would decode inside the same actor-pool stage, one payload per loop
iteration, so the Ray-side plumbing is unchanged.

Progressive (SOF2), arithmetic coding, 12-bit precision and lossless
modes raise NotImplementedError — honest seams, like the other codecs in
functions/media.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "jpeg_encode", "jpeg_decode", "rgb_to_ycbcr", "ycbcr_to_rgb",
    "QUANT_LUMA", "QUANT_CHROMA", "scale_quant",
]


# ------------------------------------------------------------ constants
def _zigzag() -> np.ndarray:
    """ZIGZAG[k] = natural (row-major) index of the k-th zigzag element.
    Generated algorithmically (anti-diagonals, alternating direction) to
    avoid a 64-entry literal typo."""
    idx = []
    for d in range(15):
        rows = range(d, -1, -1) if d % 2 == 0 else range(0, d + 1)
        for r in rows:
            c = d - r
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return np.array(idx, dtype=np.int64)


ZIGZAG = _zigzag()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C (C[u, x]); FDCT of a block s is
    C @ s @ C.T, IDCT is C.T @ S @ C. For constant s == v the only
    nonzero output is S[0,0] == 8*v, matching T.81's scaling."""
    x = np.arange(8)
    c = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0, :] = 0.5 / np.sqrt(2.0)
    return c


_C = _dct_matrix()

# T.81 Annex K example quantization tables (public spec), natural order.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)


def scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula): 1..100 -> scaled
    table clipped to [1, 255]."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base.astype(np.int64) * scale + 50) // 100,
                   1, 255).astype(np.int32)


# ------------------------------------------------------- color transform
def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> uint8 YCbCr, JFIF full-range formulas with
    round-to-nearest."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 YCbCr -> uint8 RGB, JFIF inverse."""
    f = ycc.astype(np.float64)
    y, cb, cr = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- bit I/O
class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF -> 0xFF
    0x00 inside entropy-coded data)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)

    def raw(self, data: bytes) -> None:
        assert self.n == 0
        self.out += data


class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte unstuffing
    and restart-marker resync."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(
                        f"marker 0xFF{nxt:02X} inside entropy data")
            self.cur = b
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expect: int) -> None:
        """Byte-align and consume the RSTn marker."""
        self.nbits = 0
        if (self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (expect & 7)):
            raise ValueError("missing/misnumbered restart marker")
        self.pos += 2


# ------------------------------------------------------- huffman tables
def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """(BITS[1..16], HUFFVAL) -> {symbol: (length, code)} per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]) -> dict:
    """{(length, code): symbol} for the sequential decoder."""
    return {lc: sym for sym, lc in _canonical_codes(bits, values).items()}


def _uniform_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A valid (suboptimal) Huffman spec assigning every used symbol the
    same code length L = ceil(log2(n+1)); the +1 keeps the all-ones code
    of length L unassigned so 1-padding before markers can never decode
    as a symbol. Fixture-grade compression; the decoder accepts any
    conforming DHT, so real optimal tables drop in transparently."""
    vals = sorted(symbols) or [0]
    n = len(vals)
    length = max(1, (n + 1 - 1).bit_length())
    if (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, vals


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: signed value -> (SSSS size category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# ------------------------------------------------------------- encoder
def _block_symbols(blocks: np.ndarray, preds: list[int],
                   comp_idx: int) -> list[tuple]:
    """Quantized (n, 64) natural-order blocks -> flat token list
    [('dc', size, bits), ('ac', rs, size, bits), ...] updating the DC
    predictor in place."""
    toks = []
    zz = blocks[:, ZIGZAG]
    for row in zz:
        diff = int(row[0]) - preds[comp_idx]
        preds[comp_idx] = int(row[0])
        t, extra = _magnitude(diff)
        toks.append(("dc", t, extra))
        nz = np.nonzero(row[1:])[0]
        k = 0
        for pos in nz:
            run = int(pos) - k
            while run >= 16:
                toks.append(("ac", 0xF0, 0, 0))
                run -= 16
            t, extra = _magnitude(int(row[1 + pos]))
            toks.append(("ac", (run << 4) | t, t, extra))
            k = int(pos) + 1
        if k < 63:
            toks.append(("ac", 0x00, 0, 0))
    return toks


def jpeg_encode(img: np.ndarray, quality: int = 75,
                subsampling: str = "4:4:4", restart_interval: int = 0,
                quant_override: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 gray or (h, w, 3) uint8 RGB -> baseline JFIF bytes.

    ``quant_override`` replaces BOTH scaled Annex-K tables (natural
    order); ``quant_override=np.ones(64)`` makes the transform chain
    bitwise-lossless for MCU-constant blocks (see module docstring).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's resync path).
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("jpeg_encode expects (h, w) or (h, w, 3) uint8")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("color input must be (h, w, 3) RGB")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise NotImplementedError(f"subsampling {subsampling!r}")
    sub = 2 if (subsampling == "4:2:0" and not gray) else 1

    if quant_override is not None:
        qluma = qchroma = np.asarray(quant_override,
                                     dtype=np.int32).reshape(64)
    else:
        qluma = scale_quant(QUANT_LUMA, quality)
        qchroma = scale_quant(QUANT_CHROMA, quality)

    # ---- planes (float, level-shifted later), sampling factors
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = rgb_to_ycbcr(img).astype(np.float64)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if sub == 2:
            # pad to even dims (edge replication), then 2x2 box mean
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            def _down(p):
                p = np.pad(p, ((0, eh - h), (0, ew - w)), mode="edge")
                return np.rint(
                    p.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3)))
            cb, cr = _down(cb), _down(cr)
        planes = [y, cb, cr]
        samp = [(sub, sub), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # ---- per-plane: pad, block, FDCT, quantize -> (mcuy, mcux, vi, hi, 64)
    quant = [qluma, qchroma]
    comp_blocks = []
    for p, (hi, vi), qs in zip(planes, samp, qsel):
        ph, pw = mcuy * vi * 8, mcux * hi * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        b = (p.reshape(mcuy, vi, 8, mcux, hi, 8)
              .transpose(0, 3, 1, 4, 2, 5))       # mcuy mcux vi hi 8 8
        coef = _C @ (b - 128.0) @ _C.T
        q = quant[qs].reshape(8, 8).astype(np.float64)
        comp_blocks.append(
            np.rint(coef / q).astype(np.int32).reshape(
                mcuy, mcux, vi, hi, 64))

    # ---- token stream in MCU-interleaved order, collecting symbol sets
    ncomp = len(planes)
    preds = [0] * ncomp
    dc_syms = [set(), set()]
    ac_syms = [set(), set()]
    mcu_tokens: list[list] = []
    for i in range(mcuy * mcux):
        if restart_interval and i and i % restart_interval == 0:
            preds = [0] * ncomp     # RSTn resets every DC predictor
        my, mx = divmod(i, mcux)
        toks = []
        for ci in range(ncomp):
            cls = 0 if ci == 0 else 1
            blk = comp_blocks[ci][my, mx].reshape(-1, 64)
            ctoks = _block_symbols(blk, preds, ci)
            for t in ctoks:
                (dc_syms if t[0] == "dc" else ac_syms)[cls].add(t[1])
            toks.append((cls, ctoks))
        mcu_tokens.append(toks)

    nclass = 1 if gray else 2
    dc_spec = [_uniform_table(dc_syms[c]) for c in range(nclass)]
    ac_spec = [_uniform_table(ac_syms[c]) for c in range(nclass)]
    dc_codes = [_canonical_codes(*s) for s in dc_spec]
    ac_codes = [_canonical_codes(*s) for s in ac_spec]

    # ---- headers
    wtr = _BitWriter()
    wtr.raw(b"\xff\xd8")                                        # SOI
    wtr.raw(b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00")
    for tq in range(nclass):                                    # DQT
        tbl = quant[tq][ZIGZAG]
        wtr.raw(b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(int(x) for x in tbl))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):                                     # SOF0
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    wtr.raw(b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
    for cls in range(nclass):                                   # DHT
        for tc, (bits, vals) in ((0, dc_spec[cls]), (1, ac_spec[cls])):
            body = bytes([(tc << 4) | cls]) + bytes(bits) + bytes(vals)
            wtr.raw(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    if restart_interval:                                        # DRI
        wtr.raw(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    sos = bytes([ncomp])                                        # SOS
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    wtr.raw(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)

    # ---- entropy-coded data
    for i, toks in enumerate(mcu_tokens):
        if restart_interval and i and i % restart_interval == 0:
            wtr.align()
            wtr.raw(bytes([0xFF, 0xD0 + ((i // restart_interval - 1) & 7)]))
        for cls, ctoks in toks:
            for t in ctoks:
                if t[0] == "dc":
                    _, size, extra = t
                    ln, code = dc_codes[cls][size]
                    wtr.write(code, ln)
                    if size:
                        wtr.write(extra, size)
                else:
                    _, rs, size, extra = t
                    ln, code = ac_codes[cls][rs]
                    wtr.write(code, ln)
                    if size:
                        wtr.write(extra, size)
    wtr.align()
    wtr.raw(b"\xff\xd9")                                        # EOI
    return bytes(wtr.out)


# ------------------------------------------------------------- decoder
def _decode_block(rdr: _BitReader, dc_tab: dict, ac_tab: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    coef = np.zeros(64, dtype=np.int32)
    size = _decode_symbol(rdr, dc_tab)
    diff = _extend(rdr.read_bits(size), size) if size else 0
    pred += diff
    coef[0] = pred
    k = 1
    while k < 64:
        rs = _decode_symbol(rdr, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:           # ZRL
                k += 16
                continue
            break                   # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[ZIGZAG[k]] = _extend(rdr.read_bits(size), size)
        k += 1
    return coef, pred


def _decode_symbol(rdr: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rdr.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) uint8 gray or (h, w, 3) uint8 RGB.

    Accepts SOF0/SOF1 (sequential, 8-bit), interleaved or single-
    component scans, 16-bit DQT entries, multi-table DHT/DQT segments,
    DRI/RSTn restarts and stuffed bytes. Progressive/arithmetic/12-bit
    raise NotImplementedError.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None        # (h, w, [(cid, hi, vi, tq)])
    scan_sel = None     # [(comp_index, dc_id, ac_id)]
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:          # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue                # TEM / stray RST: no payload
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq:
                    zz = np.frombuffer(seg, dtype=">u2", count=64,
                                       offset=i).astype(np.int32)
                    i += 128
                else:
                    zz = np.frombuffer(seg, dtype=np.uint8, count=64,
                                       offset=i).astype(np.int32)
                    i += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                quant[tq] = nat
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                bits = list(seg[i:i + 16])
                i += 16
                nv = sum(bits)
                vals = list(seg[i:i + nv])
                i += nv
                huff[(tc, th)] = _decode_table(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline sequential
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:        # DRI
            (restart,) = struct.unpack(">H", seg)
        elif marker == 0xDA:        # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            ids = [c[0] for c in frame[2]]
            scan_sel = []
            for j in range(ns):
                cs, tt = seg[1 + 2 * j], seg[2 + 2 * j]
                scan_sel.append((ids.index(cs), tt >> 4, tt & 0x0F))
            planes, pos = _decode_scan(data, pos, frame, scan_sel,
                                       quant, huff, restart)
            return _assemble(frame, planes)
        # else: APPn / COM / DNL — skipped via seglen
    raise ValueError("no scan data (missing SOS)")


def _decode_scan(data: bytes, pos: int, frame, scan_sel, quant, huff,
                 restart: int) -> tuple[list[np.ndarray], int]:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    interleaved = len(scan_sel) > 1
    rdr = _BitReader(data, pos)
    preds = {ci: 0 for ci, _, _ in scan_sel}
    raw_blocks: dict[int, list[np.ndarray]] = {ci: []
                                               for ci, _, _ in scan_sel}
    if interleaved:
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        nmcu = mcux * mcuy
        for i in range(nmcu):
            if restart and i and i % restart == 0:
                rdr.restart(i // restart - 1)
                preds = {ci: 0 for ci in preds}
            for ci, dc_id, ac_id in scan_sel:
                _, hi, vi, _ = comps[ci]
                for _b in range(hi * vi):
                    blk, preds[ci] = _decode_block(
                        rdr, huff[(0, dc_id)], huff[(1, ac_id)], preds[ci])
                    raw_blocks[ci].append(blk)
        dims = {ci: (mcuy, mcux, comps[ci][2], comps[ci][1])
                for ci, _, _ in scan_sel}
    else:
        ci, dc_id, ac_id = scan_sel[0]
        _, hi, vi, _ = comps[ci]
        cw = -(-w * hi // hmax)
        chh = -(-h * vi // vmax)
        bx, by = -(-cw // 8), -(-chh // 8)
        for i in range(bx * by):
            if restart and i and i % restart == 0:
                rdr.restart(i // restart - 1)
                preds[ci] = 0
            blk, preds[ci] = _decode_block(
                rdr, huff[(0, dc_id)], huff[(1, ac_id)], preds[ci])
            raw_blocks[ci].append(blk)
        dims = {ci: (by, bx, 1, 1)}

    # batched dequantize + IDCT + plane assembly per component
    planes: list[np.ndarray | None] = [None] * len(comps)
    for ci, _, _ in scan_sel:
        _, hi, vi, tq = comps[ci]
        my, mx, bv, bh = dims[ci]
        coef = (np.stack(raw_blocks[ci]).astype(np.float64)
                * quant[tq].astype(np.float64))
        blocks = _C.T @ coef.reshape(-1, 8, 8) @ _C + 128.0
        px = np.clip(np.rint(blocks), 0, 255).astype(np.uint8)
        plane = (px.reshape(my, mx, bv, bh, 8, 8)
                   .transpose(0, 2, 4, 1, 3, 5)
                   .reshape(my * bv * 8, mx * bh * 8))
        planes[ci] = plane
    # skip the trailing align bits; leave pos at the next marker
    end = rdr.pos
    while end < len(data) and not (data[end] == 0xFF
                                   and data[end + 1] != 0x00):
        end += 1
    return planes, end


def _assemble(frame, planes: list[np.ndarray]) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        return planes[0][:h, :w]
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    out = []
    for (cid, hi, vi, _), p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    return ycbcr_to_rgb(np.stack(out, axis=-1))
