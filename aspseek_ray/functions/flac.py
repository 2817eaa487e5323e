"""FLAC codec — pure numpy + stdlib (zlib-free), no ffmpeg.

FLAC (Xiph.Org; the format spec is public at xiph.org/flac/format.html)
is the web's standard lossless audio codec: frames of rice-coded
prediction residuals under CRC-8/CRC-16 integrity, with an MD5 of the
unencoded signal pinned in STREAMINFO. Implemented subset (all honest
spec features, no shortcuts):

  - stream: "fLaC" magic, STREAMINFO (+ skipped padding/other blocks)
  - frames: fixed-blocksize strategy, UTF-8-coded frame numbers,
    blocksize code 0b0111 (explicit 16-bit), rate from STREAMINFO,
    CRC-8 header check, CRC-16 frame check
  - subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (residual = k-th
    difference; reconstruction = k nested cumsums), wasted-bits shift
  - residuals: 4-bit rice (method 0) and 5-bit rice2 (method 1),
    partition orders 0-15, zigzag folding, escape-to-raw partitions
  - integrity: decoder recomputes the interleaved-PCM MD5 and compares
    against STREAMINFO — a per-file losslessness proof at decode time

Declared seams (encoder never emits, decoder raises NotImplementedError):
LPC subframes (types 32-63) and stereo decorrelation (channel
assignments 8-10) — the compression tools, not the container semantics.

FLAC is LOSSLESS, so the independent-codec oracle contract applies
directly: the engine decodes FLAC payloads, the SQL oracle re-parses a
PCM16 twin of the original samples, exact integer stats must agree
(multimodal.synth_flac_media_table).

Reference semantics: SURVEY.md §2 multimodal lane (reference tree is
empty; the Xiph FLAC format spec is the public source named above)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"fLaC"

# CRC-8 poly 0x07 and CRC-16 poly 0x8005, both init 0 (the FLAC spec's
# frame-header and frame checksums)
_CRC8_TABLE = np.empty(256, np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE[_i] = _c

_CRC16_TABLE = np.empty(256, np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TABLE[_i] = _c


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TABLE[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TABLE[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


def _utf8_number(n: int) -> bytes:
    """FLAC's extended-UTF-8 coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    for nbytes in range(2, 8):
        if n < (1 << (nbytes * 5 + 1)) or nbytes == 7:
            lead = (0xFF << (8 - nbytes)) & 0xFF
            shift = 6 * (nbytes - 1)
            out.append(lead | (n >> shift))
            for k in range(nbytes - 1):
                shift -= 6
                out.append(0x80 | ((n >> shift) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, val: int, nbits: int):
        self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)            # q zeros then a one

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


_FIXED_COEFFS = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _best_rice_param(u: np.ndarray, maxp: int = 14) -> tuple[int, int]:
    """(param, coded bit length) minimizing the rice cost for folded
    residuals u."""
    n = len(u)
    best_p, best_len = 0, int(u.sum()) + n
    for p in range(1, maxp + 1):
        ln = int((u >> p).sum()) + n * (p + 1)
        if ln < best_len:
            best_p, best_len = p, ln
    return best_p, best_len


def _write_residual(bw: _BitWriter, res: np.ndarray, blocksize: int,
                    order: int, part_order: int):
    bw.write(0, 2)                       # coding method 0: 4-bit rice
    bw.write(part_order, 4)
    nparts = 1 << part_order
    psize = blocksize >> part_order
    u = ((res << 1) ^ (res >> 63)).astype(np.uint64)   # zigzag fold
    start = 0
    for part in range(nparts):
        cnt = psize - order if part == 0 else psize
        pu = u[start:start + cnt]
        start += cnt
        param, _ = _best_rice_param(pu)
        bw.write(param, 4)
        hi = (pu >> np.uint64(param)).tolist()
        lo = pu.tolist() if param == 0 else (
            pu & np.uint64((1 << param) - 1)).tolist()
        for q, l in zip(hi, lo):
            bw.write_unary(int(q))
            if param:
                bw.write(int(l), param)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, part_order: int):
    n = len(x)
    if n and (x == x[0]).all():
        bw.write(0, 1)                   # padding
        bw.write(0, 6)                   # CONSTANT
        bw.write(0, 1)                   # no wasted bits
        bw.write(int(x[0]) & 0xFFFF, 16)
        return
    if n <= 4:
        bw.write(0, 1)
        bw.write(1, 6)                   # VERBATIM
        bw.write(0, 1)
        for v in x.tolist():
            bw.write(int(v) & 0xFFFF, 16)
        return
    # pick the fixed order with the smallest |residual| mass
    best_order, best_res, best_cost = 0, x.astype(np.int64), None
    for order in range(5):
        if (n >> part_order) <= order:
            break
        res = _fixed_residual(x, order)
        cost = int(np.abs(res).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    bw.write(0, 1)
    bw.write(8 + best_order, 6)          # FIXED order k
    bw.write(0, 1)
    for v in x[:best_order].tolist():    # warmup, sample-size bits
        bw.write(int(v) & 0xFFFF, 16)
    _write_residual(bw, best_res, n, best_order, part_order)


def flac_encode(samples: np.ndarray, rate: int = 16_000,
                blocksize: int = 4096) -> bytes:
    """(n,) or (n, ch) int16 PCM -> FLAC bytes (independent channels,
    fixed predictors; per-frame partition order cycles 0/1/2 for
    residual-coding coverage)."""
    if samples.dtype != np.int16:
        raise ValueError("flac_encode expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if not 1 <= ch <= 8:
        raise ValueError("1-8 channels")
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    out = bytearray()
    out += _MAGIC
    # STREAMINFO, last-metadata flag set
    si = _BitWriter()
    si.write(blocksize, 16)              # min block size
    si.write(blocksize, 16)              # max block size
    si.write(0, 24)                      # min frame size (unknown)
    si.write(0, 24)                      # max frame size (unknown)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(16 - 1, 5)
    si.write(n, 36)
    body = si.bytes() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big")   # type 0 | last
    out += body

    for fi, start in enumerate(range(0, max(n, 1), blocksize)):
        block = samples[start:start + blocksize]
        bs = len(block)
        if bs == 0:
            break
        hdr = bytearray()
        hdr += b"\xff\xf8"               # sync + reserved + fixed strategy
        hdr.append((0x7 << 4) | 0x0)     # blocksize: explicit 16-bit;
        #                                  rate: from STREAMINFO
        hdr.append(((ch - 1) << 4) | (0b100 << 1) | 0)   # chans | 16-bit
        hdr += _utf8_number(fi)
        hdr += struct.pack(">H", bs - 1)
        hdr.append(_crc8(bytes(hdr)))
        bw = _BitWriter()
        part_order = fi % 3              # cycle for coverage...
        if (bs >> part_order) <= 4 or bs % (1 << part_order):
            part_order = 0               # ...but keep partitions valid
        for c in range(ch):
            _encode_subframe(bw, block[:, c].astype(np.int64), part_order)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0

    def read(self, nbits: int) -> int:
        b = self.bits[self.pos:self.pos + nbits]
        if len(b) < nbits:
            raise ValueError("truncated FLAC stream")
        self.pos += nbits
        v = 0
        for bit in b.tolist():
            v = (v << 1) | bit
        return v

    def read_unary(self) -> int:
        j = np.searchsorted(self.ones, self.pos)
        if j >= len(self.ones):
            raise ValueError("truncated FLAC stream")
        stop = int(self.ones[j])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def align(self):
        self.pos = (self.pos + 7) & ~7

    def read_rice_block(self, n: int, param: int) -> np.ndarray:
        """n rice-coded signed residuals with one shared parameter —
        the hot loop, driven off the precomputed one-bit index."""
        out = np.empty(n, np.int64)
        bits, ones = self.bits, self.ones
        pos = self.pos
        j = int(np.searchsorted(ones, pos))
        pw = (1 << np.arange(param - 1, -1, -1)).astype(np.int64) \
            if param else None
        for i in range(n):
            if j >= len(ones):
                raise ValueError("truncated FLAC stream")
            stop = int(ones[j])
            u = (stop - pos) << param
            pos = stop + 1
            if param:
                u |= int(bits[pos:pos + param] @ pw)
                pos += param
                j += 1
                while j < len(ones) and ones[j] < pos:
                    j += 1
            else:
                j += 1
            out[i] = (u >> 1) ^ -(u & 1)
        self.pos = pos
        return out


def _read_residual(br: _BitReader, blocksize: int, order: int
                   ) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("bad residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    psize = blocksize >> part_order
    parts = []
    for part in range(nparts):
        cnt = psize - order if part == 0 else psize
        param = br.read(plen)
        if param == escape:              # raw-bits escape partition
            width = br.read(5)
            vals = [br.read_signed(width) if width else 0
                    for _ in range(cnt)]
            parts.append(np.array(vals, np.int64))
        else:
            parts.append(br.read_rice_block(cnt, param))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def _decode_subframe(br: _BitReader, blocksize: int, bps: int
                     ) -> np.ndarray:
    if br.read(1):
        raise ValueError("bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):                       # wasted-bits flag
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:                       # CONSTANT
        x = np.full(blocksize, br.read_signed(eff), np.int64)
    elif stype == 1:                     # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(blocksize)],
                     np.int64)
    elif 8 <= stype <= 12:               # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        x = _invert_fixed(np.array(warm, np.int64), res) if order else res
    elif 32 <= stype <= 63:
        raise NotImplementedError(
            "LPC subframes are a declared seam (fixed predictors only)")
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return x << wasted if wasted else x


def _invert_fixed(warm: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Reconstruct a FIXED-order subframe. The order-k residual is the
    k-th forward difference D_k of the signal, and D_{j}[i+1] =
    D_{j}[i] + D_{j+1}[i], so reconstruction is k nested cumsums, each
    seeded with D_j[0] — computable from the warmup alone (diff^j of
    the first j+1 warmup samples)."""
    x = res
    for j in range(len(warm) - 1, -1, -1):
        seed = _fixed_residual(warm, j)[0]
        x = np.concatenate(([seed], x)).cumsum()
    return x


def flac_decode(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n, ch) int16, rate). Verifies frame CRCs and the
    STREAMINFO MD5 (a per-file losslessness check)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = ch = bps = total = None
    md5 = b"\x00" * 16
    while True:
        hdr = data[pos:pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        blen = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4: pos + 4 + blen]
        if btype == 0:                   # STREAMINFO
            si = _BitReader(body)
            si.read(16)
            si.read(16)
            si.read(24)
            si.read(24)
            rate = si.read(20)
            ch = si.read(3) + 1
            bps = si.read(5) + 1
            total = si.read(36)
            md5 = body[18:34]
        pos += 4 + blen
        if last:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if bps != 16:
        raise NotImplementedError("only 16-bit FLAC supported")

    out = np.empty((total, ch), np.int16)
    done = 0
    while done < total:
        frame_start = pos
        if data[pos] != 0xFF or (data[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("lost FLAC frame sync")
        bs_code = data[pos + 2] >> 4
        chan_asgn = data[pos + 3] >> 4
        if chan_asgn >= 8:
            raise NotImplementedError(
                "stereo decorrelation is a declared seam")
        if chan_asgn + 1 != ch:
            raise ValueError("frame/STREAMINFO channel mismatch")
        p = pos + 4
        first = data[p]                  # UTF-8 frame number (skipped)
        nb = 1
        while first & (0x80 >> nb) and nb < 8:
            nb += 1
        nb = 1 if first < 0x80 else nb
        p += nb
        if bs_code == 6:
            bs = data[p] + 1
            p += 1
        elif bs_code == 7:
            bs = int.from_bytes(data[p:p + 2], "big") + 1
            p += 2
        elif bs_code == 1:
            bs = 192
        elif 2 <= bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code >= 8:
            bs = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code")
        if _crc8(data[frame_start:p]) != data[p]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        p += 1
        br = _BitReader(data[p:])
        chans = [_decode_subframe(br, bs, 16) for _ in range(ch)]
        br.align()
        p += br.pos // 8
        if _crc16(data[frame_start:p]) != int.from_bytes(
                data[p:p + 2], "big"):
            raise ValueError("FLAC frame CRC-16 mismatch")
        p += 2
        pos = p
        take = min(bs, total - done)
        for c in range(ch):
            out[done:done + take, c] = chans[c][:take]
        done += take
    if md5 != b"\x00" * 16 and \
            hashlib.md5(out.astype("<i2").tobytes()).digest() != md5:
        raise ValueError("FLAC MD5 mismatch: decode is not lossless")
    return out, int(rate)


def is_flac(payload: bytes) -> bool:
    return payload[:4] == _MAGIC
