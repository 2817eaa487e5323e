"""Pure-numpy codecs for UNCOMPRESSED public media formats — the real
decode kernels behind pipelines/multimodal.py (SURVEY: multimodal decode /
resize / frame-sample stages).

This container ships no PIL/ffmpeg/librosa, so compressed codecs
(JPEG/PNG/MP3/H.264) remain an explicit NotImplementedError seam — but the
uncompressed container formats are simple, fully documented public specs
and are implemented here for real:

* **BMP** (Windows BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up rows,
  4-byte row padding) — the canonical uncompressed image interchange.
* **WAV** (RIFF/WAVE, PCM16 mono/stereo) — canonical uncompressed audio.
* **Y4M** (YUV4MPEG2, C444 plain ASCII header + raw frames) — the
  standard uncompressed video stream format ffmpeg reads/writes.

Encoders exist so tests and the synthetic media generator produce REAL
payload bytes that any external tool could open; decoders are vectorized
numpy (no per-pixel Python)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "bmp_encode", "bmp_decode", "wav_encode", "wav_decode",
    "y4m_encode", "y4m_decode", "resize_nearest",
]


# --------------------------------------------------------------------- BMP
def bmp_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows,
    rows padded to 4 bytes, pixels stored BGR per the spec)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("bmp_encode expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    pixel_bytes = stride * h
    # BGR, bottom-up, padded
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes,
                       2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported "
                                  f"(got bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()   # BGR -> RGB


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pixel-center sampling), vectorized."""
    h, w = img.shape[:2]
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64),
                    h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64),
                    w - 1)
    return img[ys][:, xs]


# --------------------------------------------------------------------- WAV
def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """(n,) or (n, ch) int16 PCM -> RIFF/WAVE bytes."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, byte_rate,
                      ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data),
                      b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> ((n, ch) int16 samples, sample_rate).
    Walks RIFF chunks, so extra chunks (LIST/fact) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, rate, ch, bits, raw = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(raw, dtype="<i2")
    return samples.reshape(-1, ch), int(rate)


# --------------------------------------------------------------------- Y4M
def y4m_encode(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w, 3) uint8 (treated as raw 4:4:4 planes) ->
    YUV4MPEG2 C444 bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("y4m_encode expects (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()]
    planes = frames.transpose(0, 3, 1, 2)   # (n, 3, h, w) — Y, U, V planes
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(planes[i].tobytes())
    return b"".join(out)


def y4m_decode(data: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 C444 bytes -> ((n, h, w, 3) uint8, fps)."""
    nl = data.index(b"\n")
    head = data[:nl].decode()
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    colorspace = "C420jpeg"
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            colorspace = tok
    if colorspace != "C444":
        raise NotImplementedError("only C444 (4:4:4) streams supported")
    frame_bytes = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(data):
        fe = data.index(b"\n", pos)          # FRAME line (may carry params)
        if not data[pos:fe].startswith(b"FRAME"):
            raise ValueError("malformed Y4M frame header")
        start = fe + 1
        plane = np.frombuffer(data, np.uint8, count=frame_bytes,
                              offset=start)
        frames.append(plane.reshape(3, h, w).transpose(1, 2, 0))
        pos = start + frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8), fps
