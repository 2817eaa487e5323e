"""G.711 mu-law / A-law companded audio — pure numpy, no ffmpeg.

G.711 (ITU-T, 1972; the telephony codec carried in WAV as format tags
0x0007 mu-law / 0x0006 A-law) is an 8-bit logarithmic PCM: each code is
sign + 3-bit segment + 4-bit mantissa, expanded piecewise-linearly. The
expansion formulas below are the classic public-domain forms (Sun
Microsystems' g711.c lineage, identical tables in every conforming
implementation):

  mu-law:  v = ~code;  mag = (((v & 0x0F) << 3) + 0x84) << ((v>>4) & 7)
           pcm = (0x84 - mag) if v & 0x80 else (mag - 0x84)      (+-32124)
  A-law:   v = code ^ 0x55; seg = (v>>4) & 7; t = (v & 0x0F) << 4
           seg 0: t += 8; seg 1: t += 0x108; else (t+0x108) << (seg-1)
           pcm = t if v & 0x80 else -t                           (+-32256)

The DECODER is the normative side (the tables above ARE the spec); the
encoder here quantizes each input sample to the code whose expansion is
nearest (vectorized searchsorted over the sorted 256-entry table), which
is the optimal compander. Like the ADPCM lane, the oracle twin is the
encoder's own decode-expansion: a conforming decoder must reproduce it
BITWISE, so exact integer stats can be cross-checked in SQL.

Reference semantics: SURVEY.md §2 multimodal lane (reference tree is
empty; ITU-T G.711 is the public spec named above)."""

from __future__ import annotations

import struct

import numpy as np


def _ulaw_table() -> np.ndarray:
    t = np.empty(256, np.int16)
    for code in range(256):
        v = ~code & 0xFF
        mag = ((((v & 0x0F) << 3) + 0x84) << ((v >> 4) & 0x07))
        t[code] = (0x84 - mag) if v & 0x80 else (mag - 0x84)
    return t


def _alaw_table() -> np.ndarray:
    t = np.empty(256, np.int16)
    for code in range(256):
        v = code ^ 0x55
        seg = (v >> 4) & 0x07
        mag = (v & 0x0F) << 4
        if seg == 0:
            mag += 8
        elif seg == 1:
            mag += 0x108
        else:
            mag = (mag + 0x108) << (seg - 1)
        t[code] = mag if v & 0x80 else -mag
    return t


ULAW_TABLE = _ulaw_table()
ALAW_TABLE = _alaw_table()

_WAV_FMT = {"ulaw": 0x0007, "alaw": 0x0006}
_TABLE = {"ulaw": ULAW_TABLE, "alaw": ALAW_TABLE}


def _encoder(table: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(sorted expansion values, code for each sorted slot) — nearest-
    value quantizer state. Ties break toward the lower expansion, which
    is deterministic and irrelevant to the decode-twin contract."""
    order = np.argsort(table, kind="stable")
    return table[order].astype(np.int32), order.astype(np.uint8)


_ENC = {law: _encoder(t) for law, t in _TABLE.items()}


def g711_compress(samples: np.ndarray, law: str) -> np.ndarray:
    """int16 array -> uint8 G.711 codes (nearest-expansion quantizer)."""
    vals, codes = _ENC[law]
    s = samples.astype(np.int32).ravel()
    idx = np.searchsorted(vals, s)
    idx = np.clip(idx, 1, len(vals) - 1)
    left = vals[idx - 1]
    right = vals[idx]
    pick = np.where((s - left) <= (right - s), idx - 1, idx)
    return codes[pick].reshape(samples.shape)


def g711_expand(data: np.ndarray | bytes, law: str) -> np.ndarray:
    """uint8 G.711 codes -> int16 PCM via the normative table."""
    codes = np.frombuffer(data, np.uint8) if isinstance(data, (bytes,
            bytearray, memoryview)) else data.astype(np.uint8)
    return _TABLE[law][codes]


def g711_wav_encode(samples: np.ndarray, rate: int = 8_000,
                    law: str = "ulaw") -> tuple[bytes, np.ndarray]:
    """(n,) or (n, ch) int16 -> (RIFF/WAVE G.711 bytes, reconstruction).

    The returned reconstruction is the decode-expansion of the emitted
    codes — the int16 signal every conforming G.711 decoder must produce
    bitwise (the PCM twin for the independent-codec oracle)."""
    if samples.dtype != np.int16:
        raise ValueError("g711_wav_encode expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    codes = g711_compress(samples, law)
    data = codes.astype(np.uint8).tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, _WAV_FMT[law], ch, rate,
                      rate * ch, ch, 8)
    fact = struct.pack("<4sII", b"fact", 4, n)   # customary for non-PCM
    body = fmt + fact + struct.pack("<4sI", b"data", len(data)) + data
    if len(data) & 1:
        body += b"\x00"                           # RIFF word alignment
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE")
    recon = g711_expand(codes.ravel(), law).reshape(n, ch)
    return hdr + body, recon


def g711_wav_decode(data: bytes, audio_fmt: int, ch: int, rate: int,
                    raw: bytes) -> tuple[np.ndarray, int]:
    """Expand the data chunk of an already-walked G.711 WAV (wav_decode
    hands us the parsed fmt fields + raw codes)."""
    law = {0x0007: "ulaw", 0x0006: "alaw"}[audio_fmt]
    return g711_expand(raw, law).reshape(-1, ch), int(rate)
