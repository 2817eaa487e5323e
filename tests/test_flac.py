"""FLAC codec: losslessness across content/shape modes, spec details
(CRCs, UTF-8 frame numbers, MD5 gate, escape partitions), declared
seams, and the PCM-twin invariant behind multimodal_flac_audio_stats."""

import hashlib
import struct

import numpy as np
import pytest

from aspseek_ray.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    flac_decode,
    flac_encode,
    is_flac,
)
from aspseek_ray.functions.media import wav_decode


def _rng():
    return np.random.Generator(np.random.PCG64(47))


def test_flac_roundtrip_modes_and_shapes():
    rng = _rng()
    for trial in range(10):
        ch = (1, 2)[trial % 2]
        n = int(rng.integers(1, 7000))
        mode = trial % 4
        if mode == 0:
            s = (np.sin(np.arange(n) / 17) * 11000).astype(np.int16)
        elif mode == 1:
            s = np.full(n, -321, np.int16)
        elif mode == 2:
            s = rng.integers(-32768, 32768, n).astype(np.int16)
        else:
            s = ((np.arange(n) % 2000) - 1000
                 + rng.normal(0, 25, n)).astype(np.int16)
        if ch == 2:
            s = np.stack([s, np.roll(s, max(1, n // 3))], axis=1)
        enc = flac_encode(s, rate=16000, blocksize=512)
        assert is_flac(enc)
        dec, rate = flac_decode(enc)
        want = s if s.ndim == 2 else s[:, None]
        assert rate == 16000
        assert np.array_equal(dec, want), trial


def test_flac_stream_spec_details():
    s = (np.arange(2000) % 700 - 350).astype(np.int16)
    enc = flac_encode(s, rate=8000, blocksize=1024)
    assert enc[:4] == b"fLaC"
    assert enc[4] == 0x80                 # STREAMINFO, last-block flag
    assert int.from_bytes(enc[5:8], "big") == 34
    # STREAMINFO: min/max blocksize, then 20-bit rate / 3-bit chans /
    # 5-bit bps / 36-bit total packed big-endian
    assert struct.unpack(">HH", enc[8:12]) == (1024, 1024)
    packed = int.from_bytes(enc[18:26], "big")
    assert (packed >> 44) == 8000         # rate
    assert ((packed >> 41) & 0x7) + 1 == 1    # channels
    assert ((packed >> 36) & 0x1F) + 1 == 16  # bits per sample
    assert (packed & ((1 << 36) - 1)) == 2000
    # STREAMINFO MD5 = md5 of the LE-interleaved input
    assert enc[26:42] == hashlib.md5(s.astype("<i2").tobytes()).digest()
    # first frame: sync + fixed-blocksize strategy
    assert enc[42] == 0xFF and enc[43] == 0xF8
    # frame header CRC-8 holds (header = bytes 42..47 for frame 0:
    # 4 fixed + 1 UTF-8 number + 2 blocksize)
    assert _crc8(enc[42:49]) == enc[49]


def test_flac_crc_and_md5_detect_corruption():
    s = (np.sin(np.arange(3000) / 9) * 9000).astype(np.int16)
    enc = bytearray(flac_encode(s, blocksize=1024))
    bad = enc.copy()
    bad[60] ^= 0x01                       # flip a bit inside frame 0
    with pytest.raises(ValueError):
        flac_decode(bytes(bad))
    # corrupt the stored MD5: frames all pass CRC, MD5 gate must fire
    bad2 = enc.copy()
    bad2[26] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        flac_decode(bytes(bad2))


def test_flac_utf8_frame_numbers():
    assert _utf8_number(0) == b"\x00"
    assert _utf8_number(0x7F) == b"\x7f"
    assert _utf8_number(0x80) == b"\xc2\x80"      # plain UTF-8 agreement
    assert _utf8_number(0x7FF) == b"\xdf\xbf"
    assert _utf8_number(0x800) == b"\xe0\xa0\x80"
    assert _utf8_number(0x10000) == "\U00010000".encode()
    # many short frames force multi-byte numbers end-to-end
    s = (np.arange(40_000) % 251 - 125).astype(np.int16)
    enc = flac_encode(s, blocksize=256)   # 157 frames
    dec, _ = flac_decode(enc)
    assert np.array_equal(dec[:, 0], s)


def test_flac_escape_partition_decodes():
    """Hand-build a frame whose residual uses the raw-bits escape
    (param 0b1111) — the decoder-only spec path the encoder never
    emits."""
    n = 16
    warm = 5
    res = np.array([3, -4, 7, 0, -1, 2, -8, 6, 1, -2, 4, -3, 0, 5, -6],
                   np.int64)              # n-1 order-1 residuals
    hdr = bytearray()
    hdr += b"\xff\xf8"
    hdr.append((0x7 << 4) | 0x0)
    hdr.append((0 << 4) | (0b100 << 1))   # mono, 16-bit
    hdr += _utf8_number(0)
    hdr += struct.pack(">H", n - 1)
    hdr.append(_crc8(bytes(hdr)))
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(9, 6)                        # FIXED order 1
    bw.write(0, 1)
    bw.write(warm & 0xFFFF, 16)
    bw.write(0, 2)                        # rice method 0
    bw.write(0, 4)                        # partition order 0
    bw.write(0xF, 4)                      # ESCAPE
    bw.write(5, 5)                        # 5 raw bits per residual
    for r in res.tolist():
        bw.write(int(r) & 0x1F, 5)
    bw.align()
    frame = bytes(hdr) + bw.bytes()
    want = np.concatenate(([warm], warm + np.cumsum(res))).astype(np.int16)

    si = _BitWriter()
    si.write(n, 16)
    si.write(n, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n, 36)
    body = si.bytes() + hashlib.md5(want.astype("<i2").tobytes()).digest()
    stream = (b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big")
              + body + frame + struct.pack(">H", _crc16(frame)))
    dec, rate = flac_decode(stream)
    assert rate == 8000
    assert np.array_equal(dec[:, 0], want)


def _streaminfo(n, rate, ch, bps):
    si = _BitWriter()
    si.write(256, 16)
    si.write(256, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_flac_declared_seams():
    # non-16-bit streams are a declared seam
    with pytest.raises(NotImplementedError, match="16-bit"):
        flac_decode(_streaminfo(10, 8000, 1, 24))
    # stereo decorrelation (channel assignment 8 = left/side) is a seam
    hdr = bytearray()
    hdr += b"\xff\xf8"
    hdr.append((0x7 << 4) | 0x0)
    hdr.append((8 << 4) | (0b100 << 1))
    hdr += _utf8_number(0)
    hdr += struct.pack(">H", 9)
    hdr.append(_crc8(bytes(hdr)))
    with pytest.raises(NotImplementedError, match="decorrelation"):
        flac_decode(_streaminfo(10, 8000, 2, 16) + bytes(hdr))
    # LPC subframes (type 32-63) are a seam
    bw = _BitWriter()
    bw.write(0, 1)
    bw.write(33, 6)                       # LPC order 2
    bw.write(0, 1)
    bw.align()
    hdr2 = bytearray()
    hdr2 += b"\xff\xf8"
    hdr2.append((0x7 << 4) | 0x0)
    hdr2.append((0 << 4) | (0b100 << 1))
    hdr2 += _utf8_number(0)
    hdr2 += struct.pack(">H", 9)
    hdr2.append(_crc8(bytes(hdr2)))
    with pytest.raises(NotImplementedError, match="LPC"):
        flac_decode(_streaminfo(10, 8000, 1, 16) + bytes(hdr2)
                    + bw.bytes())


def test_flac_audio_stats_match_pcm_twin(ray_session):
    """The independent-codec invariant behind the
    multimodal_flac_audio_stats oracle: exact integer stats over the
    decoded FLAC payload equal the stats over the PCM16 twin of the
    original samples."""
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        media_audio_stats,
        synth_flac_media_table,
    )

    t = synth_flac_media_table(12)
    got = media_audio_stats(
        rd.from_arrow(t.select(["media_id", "media_type", "payload"]))
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(got) == 12
    for i, row in got.iterrows():
        samples, rate = wav_decode(t["payload_pcm"][i].as_py())
        s = samples[:, 0].astype(np.int64)
        assert row["n_samples"] == len(s)
        assert row["rate"] == rate
        assert row["peak_abs"] == int(np.abs(s).max())
        assert row["mean_sample"] == s.sum() / len(s)
        assert row["zero_cross"] == int(
            np.count_nonzero((s[1:] < 0) != (s[:-1] < 0)))
