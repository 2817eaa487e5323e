"""Pure-numpy media codecs (functions/media.py): byte-exact round trips,
spec details (BMP row padding/BGR/bottom-up, WAV chunk walk, Y4M header),
and the real multimodal kernels over them."""

import struct

import numpy as np
import pytest

from aspseek_ray.functions.media import (
    bmp_decode,
    bmp_encode,
    resize_nearest,
    wav_decode,
    wav_encode,
    y4m_decode,
    y4m_encode,
)


def test_bmp_roundtrip_odd_width():
    rng = np.random.default_rng(1)
    for w, h in [(1, 1), (3, 2), (5, 7), (64, 33)]:   # odd widths need padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = bmp_decode(bmp_encode(img))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back, img)


def test_bmp_spec_details():
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]          # top-left RED
    data = bmp_encode(img)
    assert data[:2] == b"BM"
    w, h = struct.unpack_from("<ii", data, 18)
    assert (w, h) == (3, 2)
    off = struct.unpack_from("<I", data, 10)[0]
    stride = (3 * 3 + 3) // 4 * 4
    assert stride == 12              # padded from 9
    # bottom-up: the LAST stored row is the top row; pixels are BGR
    top_row = data[off + stride:off + stride + 9]
    assert top_row[:3] == bytes([0, 0, 255])


def test_wav_roundtrip_and_chunks():
    rng = np.random.default_rng(2)
    mono = rng.integers(-30000, 30000, size=500, dtype=np.int16)
    back, rate = wav_decode(wav_encode(mono, 8000))
    assert rate == 8000
    assert np.array_equal(back[:, 0], mono)
    stereo = rng.integers(-30000, 30000, size=(100, 2), dtype=np.int16)
    back2, _ = wav_decode(wav_encode(stereo, 44100))
    assert np.array_equal(back2, stereo)
    # extra RIFF chunk before data is tolerated (chunk walk)
    raw = wav_encode(mono, 8000)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    patched = raw[:fmt_end] + extra + raw[fmt_end:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    back3, _ = wav_decode(patched)
    assert np.array_equal(back3[:, 0], mono)


def test_y4m_roundtrip():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(4, 6, 5, 3), dtype=np.uint8)
    data = y4m_encode(frames, fps=10)
    assert data.startswith(b"YUV4MPEG2 W5 H6 F10:1")
    back, fps = y4m_decode(data)
    assert fps == 10
    assert np.array_equal(back, frames)


def test_resize_nearest_exact():
    # 2x2 checkerboard upscaled 2x: each source pixel becomes a 2x2 block
    img = np.array([[[0, 0, 0], [255, 255, 255]],
                    [[255, 255, 255], [0, 0, 0]]], np.uint8)
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    assert np.array_equal(up[:2, :2], np.zeros((2, 2, 3), np.uint8))
    assert np.array_equal(up[:2, 2:], np.full((2, 2, 3), 255, np.uint8))


def test_compressed_formats_are_a_declared_seam():
    from aspseek_ray.pipelines.multimodal import DecodeStage

    with pytest.raises(NotImplementedError):
        DecodeStage()._features(b"\xff\xd8\xff\xe0 jpeg bytes")


def test_decode_stage_real_features(ray_session):
    from aspseek_ray.pipelines.multimodal import (
        extract_media_features,
        synth_media_dataset,
    )

    ds = synth_media_dataset(30)
    f = extract_media_features(ds).to_pandas()
    assert len(f) == 30
    by_type = dict(zip(f["media_id"], zip(f["media_type"], f["features"])))
    # image features carry the true encoded dims
    import ray
    import pyarrow as pa
    src = pa.concat_tables(ray.get(ds.to_arrow_refs())).to_pylist()
    for row in src:
        kind, feat = by_type[row["media_id"]]
        feat = list(feat)
        if kind == "image":
            assert (int(feat[0]), int(feat[1])) == (row["meta"]["width"],
                                                    row["meta"]["height"])
        elif kind == "audio":
            assert int(feat[1]) == 8000                 # sample rate
            assert 0.0 < feat[2] < 1.0                  # sine RMS
            assert abs(feat[2] - 20000 / 32768 / np.sqrt(2)) < 0.05
        else:
            assert int(feat[3]) == 5                    # fps
            assert (int(feat[1]), int(feat[2])) == (row["meta"]["height"],
                                                    row["meta"]["width"])


def test_resize_stage_real_pixels(ray_session):
    from aspseek_ray.pipelines.multimodal import resize_images, synth_media_dataset

    r = resize_images(synth_media_dataset(30), max_side=16).to_pandas()
    assert len(r) == 10
    assert (r[["out_w", "out_h"]].max(axis=1) <= 16).all()
    for _, row in r.iterrows():      # payload is a REAL decodable BMP
        img = bmp_decode(row["payload"])
        assert img.shape == (row["out_h"], row["out_w"], 3)


def test_pixel_stats_exact(ray_session):
    """PixelStatsStage means equal the decoded image's exact channel means
    (int64 sums / n) and only image rows survive."""
    from aspseek_ray.pipelines.multimodal import (
        media_pixel_stats,
        synth_media_dataset,
        synth_media_table,
    )

    r = media_pixel_stats(synth_media_dataset(30)).to_pandas()
    src = synth_media_table(30).to_pylist()
    imgs = {row["media_id"]: row for row in src
            if row["media_type"] == "image"}
    assert set(r["media_id"]) == set(imgs)
    for _, row in r.iterrows():
        img = bmp_decode(imgs[row["media_id"]]["payload"])
        h, w = img.shape[:2]
        assert (row["width"], row["height"]) == (w, h)
        s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        assert row["mean_r"] == s[0] / (w * h)
        assert row["mean_g"] == s[1] / (w * h)
        assert row["mean_b"] == s[2] / (w * h)


def test_audio_stats_exact(ray_session):
    from aspseek_ray.pipelines.multimodal import (
        media_audio_stats,
        synth_media_dataset,
        synth_media_table,
    )

    r = media_audio_stats(synth_media_dataset(30)).to_pandas()
    wavs = {row["media_id"]: row for row in synth_media_table(30).to_pylist()
            if row["media_type"] == "audio"}
    assert set(r["media_id"]) == set(wavs)
    for _, row in r.iterrows():
        samples, rate = wav_decode(wavs[row["media_id"]]["payload"])
        s = samples[:, 0].astype(np.int64)
        assert row["rate"] == rate and row["n_samples"] == len(s)
        assert row["peak_abs"] == int(np.abs(s).max())
        assert row["mean_sample"] == s.sum() / len(s)
        assert row["zero_cross"] == int(
            np.count_nonzero((s[1:] < 0) != (s[:-1] < 0)))


def test_frame_luma_exact(ray_session):
    from aspseek_ray.pipelines.multimodal import (
        media_frame_luma,
        synth_media_dataset,
        synth_media_table,
    )

    r = media_frame_luma(synth_media_dataset(30)).to_pandas()
    vids = {row["media_id"]: row for row in synth_media_table(30).to_pylist()
            if row["media_type"] == "video"}
    assert set(r["media_id"]) == set(vids)
    for mid, grp in r.groupby("media_id"):
        frames, fps = y4m_decode(vids[mid]["payload"])
        n, h, w = frames.shape[:3]
        assert len(grp) == n
        assert (grp["fps"] == fps).all()
        g = grp.sort_values("frame_idx").reset_index(drop=True)
        for fi in range(n):
            assert g.loc[fi, "mean_y"] == (
                frames[fi, :, :, 0].astype(np.int64).sum() / (h * w))
