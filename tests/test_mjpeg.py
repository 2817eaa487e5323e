"""MJPEG/AVI container codec: RIFF structure pins, frame roundtrip
exactness (riding the baseline-JPEG MCU-constant contract), the
filmstrip view behind decode_image, and the BMP-twin invariant behind
the multimodal_mjpeg_pixel_stats oracle."""

import struct

import numpy as np
import pytest

from aspseek_ray.functions.jpeg import rgb_to_ycbcr, ycbcr_to_rgb
from aspseek_ray.functions.media import (
    bmp_decode,
    decode_image,
    mjpeg_decode,
    mjpeg_encode,
)

RNG = np.random.Generator(np.random.PCG64(31))
ONES = np.ones(64, dtype=np.int32)


def _const_frames(nf, bh, bw, mcu=8, channels=None, rng=RNG):
    shape = (nf, bh, bw) if channels is None else (nf, bh, bw, channels)
    cells = rng.integers(0, 256, size=shape, dtype=np.uint8)
    return np.repeat(np.repeat(cells, mcu, 1), mcu, 2)


def test_riff_structure():
    frames = _const_frames(3, 2, 3, channels=3)
    data = mjpeg_encode(frames, fps=10, quant_override=ONES)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack_from("<I", data, 4)
    assert 8 + riff_size == len(data)
    assert b"MJPG" in data and b"avih" in data and b"movi" in data
    assert data.count(b"00dc") == 3            # one chunk per frame
    # every chunk is a complete JPEG (SOI right after the chunk header)
    i = data.find(b"00dc")
    assert data[i + 8:i + 10] == b"\xff\xd8"


def test_roundtrip_color_is_bitwise_and_fps_survives():
    frames = _const_frames(4, 2, 2, channels=3)
    expect = ycbcr_to_rgb(rgb_to_ycbcr(frames))
    out, fps = mjpeg_decode(mjpeg_encode(frames, fps=12,
                                         quant_override=ONES))
    assert fps == 12
    assert out.shape == expect.shape and np.array_equal(out, expect)


def test_roundtrip_gray_and_420():
    g = _const_frames(2, 3, 2)
    out, _ = mjpeg_decode(mjpeg_encode(g, quant_override=ONES))
    assert np.array_equal(out, np.repeat(g[..., None], 3, axis=3))
    c = _const_frames(3, 2, 2, mcu=16, channels=3)
    expect = ycbcr_to_rgb(rgb_to_ycbcr(c))
    out, _ = mjpeg_decode(mjpeg_encode(c, quant_override=ONES,
                                       subsampling="4:2:0"))
    assert np.array_equal(out, expect)


def test_lossy_quality_roundtrip_tolerance():
    x = np.linspace(0, np.pi, 32)
    base = (127 + 100 * np.sin(x)[:, None] * np.cos(x)[None, :])
    frames = np.stack([np.roll(base, k, axis=0) for k in range(3)])
    rgb = np.repeat(frames[..., None], 3, axis=3).astype(np.uint8)
    out, _ = mjpeg_decode(mjpeg_encode(rgb, quality=90))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 12


def test_decode_image_filmstrip_view():
    frames = _const_frames(5, 1, 2, channels=3)
    strip = decode_image(mjpeg_encode(frames, quant_override=ONES))
    assert strip.shape == (5 * 8, 16, 3)
    expect = ycbcr_to_rgb(rgb_to_ycbcr(frames)).reshape(40, 16, 3)
    assert np.array_equal(strip, expect)


def test_errors_and_seams():
    with pytest.raises(ValueError):
        mjpeg_decode(b"RIFF\x00\x00\x00\x00WAVE")   # not an AVI
    with pytest.raises(ValueError):
        mjpeg_encode(np.zeros((0, 8, 8, 3), dtype=np.uint8))
    # an AVI whose frames disagree on dimensions is rejected
    a = mjpeg_encode(_const_frames(1, 1, 1, channels=3),
                     quant_override=ONES)
    b = mjpeg_encode(_const_frames(1, 2, 2, channels=3),
                     quant_override=ONES)
    ia, ib = a.find(b"00dc"), b.find(b"00dc")
    sa = struct.unpack_from("<I", a, ia + 4)[0]
    sb = struct.unpack_from("<I", b, ib + 4)[0]
    chunk_a = a[ia:ia + 8 + sa + (sa & 1)]
    chunk_b = b[ib:ib + 8 + sb + (sb & 1)]
    body = b"AVI " + b"LIST" + struct.pack(
        "<I", 4 + len(chunk_a) + len(chunk_b)) + b"movi" + chunk_a + chunk_b
    franken = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        mjpeg_decode(franken)


def test_mjpeg_pixel_stats_match_bmp_twin(ray_session):
    """The invariant behind the multimodal_mjpeg_pixel_stats oracle:
    decoding every MJPG frame and the tall BMP twin of the stacked
    frames yields identical exact channel sums."""
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        media_pixel_stats,
        synth_mjpeg_media_table,
    )

    t = synth_mjpeg_media_table(12)
    got = media_pixel_stats(
        rd.from_arrow(t.select(["media_id", "media_type", "payload"])),
        media_types=("video",),
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(got) == 12
    for i, row in got.iterrows():
        img = bmp_decode(t["payload_bmp"][i].as_py())
        h, w = img.shape[:2]
        s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert (row["width"], row["height"]) == (w, h)
        assert row["mean_r"] == s[0] / (w * h)
        assert row["mean_g"] == s[1] / (w * h)
        assert row["mean_b"] == s[2] / (w * h)


def test_decode_stage_features_over_avi(ray_session):
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        extract_media_features,
        synth_mjpeg_media_table,
    )

    t = synth_mjpeg_media_table(6)
    f = extract_media_features(
        rd.from_arrow(t.select(["media_id", "media_type", "payload"]))
    ).to_pandas()
    assert len(f) == 6
    feats = np.stack(f["features"].to_numpy())
    assert np.isfinite(feats).all()
    assert (feats[:, 0] >= 1).all()               # n_frames lane
