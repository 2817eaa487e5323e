"""Baseline JPEG codec: spec pins, roundtrip exactness contracts, lossy
tolerance, declared seams, and the independent-codec twin invariant
behind the multimodal_jpeg_pixel_stats oracle."""

import numpy as np
import pytest

from aspseek_ray.functions.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _uniform_table,
    jpeg_decode,
    jpeg_encode,
    rgb_to_ycbcr,
    scale_quant,
    ycbcr_to_rgb,
)
from aspseek_ray.functions.media import bmp_decode, decode_image

RNG = np.random.Generator(np.random.PCG64(42))
ONES = np.ones(64, dtype=np.int32)


def _mcu_constant(bh, bw, mcu, channels=None, rng=RNG):
    shape = (bh, bw) if channels is None else (bh, bw, channels)
    cells = rng.integers(0, 256, size=shape, dtype=np.uint8)
    return np.repeat(np.repeat(cells, mcu, 0), mcu, 1)


# ------------------------------------------------------------- spec pins
def test_zigzag_is_the_t81_order():
    # first 16 entries of the standard zigzag scan, natural indices
    assert list(ZIGZAG[:16]) == [0, 1, 8, 16, 9, 2, 3, 10,
                                 17, 24, 32, 25, 18, 11, 4, 5]
    assert list(ZIGZAG[-6:]) == [61, 54, 47, 55, 62, 63]
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_jfif_color_conversion_vectors():
    # published JFIF formulas, independently re-expressed
    px = np.array([[[255, 0, 0]], [[0, 255, 0]], [[0, 0, 255]],
                   [[0, 0, 0]], [[255, 255, 255]]], dtype=np.uint8)
    ycc = rgb_to_ycbcr(px)
    for (r, g, b), (y, cb, cr) in zip(px[:, 0].astype(float),
                                      ycc[:, 0].astype(float)):
        assert y == min(255, max(0, np.rint(
            0.299 * r + 0.587 * g + 0.114 * b)))
        assert cb == min(255, max(0, np.rint(
            128 - 0.168736 * r - 0.331264 * g + 0.5 * b)))
        assert cr == min(255, max(0, np.rint(
            128 + 0.5 * r - 0.418688 * g - 0.081312 * b)))
    # every gray is a fixed point of the YCbCr roundtrip
    grays = np.arange(256, dtype=np.uint8)
    img = np.repeat(grays[None, :, None], 3, axis=2)
    ycc = rgb_to_ycbcr(img)
    assert np.array_equal(ycc[0, :, 0], grays)          # Y == v
    assert np.all(ycc[0, :, 1] == 128) and np.all(ycc[0, :, 2] == 128)
    assert np.array_equal(ycbcr_to_rgb(ycc), img)


def test_ijg_quality_scaling():
    assert np.array_equal(scale_quant(QUANT_LUMA, 50), QUANT_LUMA)
    assert scale_quant(QUANT_LUMA, 100).max() == 1     # lossless-ish
    assert scale_quant(QUANT_LUMA, 1).max() == 255     # clipped
    assert scale_quant(QUANT_LUMA, 90).min() >= 1


def test_bit_writer_stuffs_ff_and_reader_unstuffs():
    w = _BitWriter()
    w.write(0xFF, 8)
    w.write(0xA5, 8)
    assert bytes(w.out) == b"\xff\x00\xa5"
    r = _BitReader(bytes(w.out), 0)
    assert r.read_bits(8) == 0xFF and r.read_bits(8) == 0xA5
    r = _BitReader(b"\xff\xc0", 0)
    with pytest.raises(ValueError):
        r.read_bits(8)


def test_uniform_huffman_table_reserves_all_ones():
    for n in (1, 2, 3, 4, 7, 8, 200):
        bits, vals = _uniform_table(set(range(n)))
        length = next(i + 1 for i, b in enumerate(bits) if b)
        assert sum(bits) == n and len(vals) == n
        assert n < (1 << length)    # all-ones code of width L unassigned


# --------------------------------------------------- exactness contracts
def test_gray_mcu_constant_is_bitwise():
    img = _mcu_constant(5, 7, 8)
    out = jpeg_decode(jpeg_encode(img, quant_override=ONES))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_color_444_mcu_constant_is_bitwise_through_ycc():
    img = _mcu_constant(4, 3, 8, channels=3)
    expect = ycbcr_to_rgb(rgb_to_ycbcr(img))
    out = jpeg_decode(jpeg_encode(img, quant_override=ONES))
    assert np.array_equal(out, expect)


def test_color_420_mcu_constant_is_bitwise():
    img = _mcu_constant(3, 4, 16, channels=3)
    expect = ycbcr_to_rgb(rgb_to_ycbcr(img))
    out = jpeg_decode(jpeg_encode(img, quant_override=ONES,
                                  subsampling="4:2:0"))
    assert np.array_equal(out, expect)


def test_restart_markers_roundtrip_and_appear():
    img = _mcu_constant(4, 4, 16, channels=3)
    expect = ycbcr_to_rgb(rgb_to_ycbcr(img))
    data = jpeg_encode(img, quant_override=ONES, subsampling="4:2:0",
                       restart_interval=2)
    assert b"\xff\xdd" in data                       # DRI emitted
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    assert np.array_equal(jpeg_decode(data), expect)
    # gray + restarts too (single-component scan resync)
    g = _mcu_constant(6, 2, 8)
    data = jpeg_encode(g, quant_override=ONES, restart_interval=3)
    assert np.array_equal(jpeg_decode(data), g)


# ----------------------------------------------------- lossy tolerances
def test_flat_quant_noise_roundtrip_is_tight():
    img = RNG.integers(0, 256, size=(37, 53), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quant_override=ONES))
    assert out.shape == img.shape                     # crop to SOF dims
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_quality_90_smooth_image_tolerance():
    x = np.linspace(0, np.pi, 64)
    smooth = (127 + 100 * np.sin(x)[:, None] * np.cos(x)[None, :])
    img = np.stack([smooth, smooth[::-1], smooth.T], -1).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12
    out = jpeg_decode(jpeg_encode(img, quality=90, subsampling="4:2:0",
                                  restart_interval=3))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 20
    # lower quality is coarser but still recognizable
    out = jpeg_decode(jpeg_encode(img, quality=25))
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 10


def test_non_mcu_aligned_dims_crop_correctly():
    img = RNG.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quant_override=ONES,
                                  subsampling="4:2:0"))
    assert out.shape == (19, 21, 3)


# ------------------------------------------------------------ seams/errors
def test_progressive_is_a_declared_seam():
    data = bytearray(jpeg_encode(_mcu_constant(1, 1, 8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2                               # SOF0 -> SOF2
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(data))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        jpeg_decode(b"BM not a jpeg")
    with pytest.raises((ValueError, IndexError, KeyError)):
        jpeg_decode(b"\xff\xd8\xff\xda\x00\x04\x01\x00")  # SOS before SOF


def test_decode_image_routes_jpeg_and_replicates_gray():
    g = _mcu_constant(2, 2, 8)
    out = decode_image(jpeg_encode(g, quant_override=ONES))
    assert out.shape == (16, 16, 3)
    assert np.array_equal(out[..., 0], g)
    assert np.array_equal(out[..., 1], out[..., 2])


# ------------------------------------------------ oracle twin invariant
def test_jpeg_pixel_stats_match_bmp_twin(ray_session):
    """The independent-codec invariant behind the
    multimodal_jpeg_pixel_stats oracle: decoding the MCU-constant JPEG
    payload and the BMP twin of its expected pixels yields identical
    exact channel sums."""
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        media_pixel_stats,
        synth_jpeg_media_table,
    )

    t = synth_jpeg_media_table(18)
    got = media_pixel_stats(
        rd.from_arrow(t.select(["media_id", "media_type", "payload"]))
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(got) == 18
    for i, row in got.iterrows():
        img = bmp_decode(t["payload_bmp"][i].as_py())
        h, w = img.shape[:2]
        s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert (row["width"], row["height"]) == (w, h)
        assert row["mean_r"] == s[0] / (w * h)
        assert row["mean_g"] == s[1] / (w * h)
        assert row["mean_b"] == s[2] / (w * h)


def test_resize_stage_handles_jpeg(ray_session):
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        resize_images,
        synth_jpeg_media_table,
    )

    t = synth_jpeg_media_table(6)
    out = resize_images(
        rd.from_arrow(t.select(["media_id", "media_type", "payload"])),
        max_side=8,
    ).to_pandas()
    assert len(out) == 6
    assert (out["out_w"] <= 8).all() and (out["out_h"] <= 8).all()
    # re-encoded as PNG (lossless carrier for the resized RGB)
    assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in out["payload"])
