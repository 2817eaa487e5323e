"""QOI codec: spec conformance, round-trip losslessness, and the
independent-codec pixel-stats invariant behind the
multimodal_qoi_pixel_stats oracle."""

import struct

import numpy as np

from aspseek_ray.functions.media import bmp_decode
from aspseek_ray.functions.qoi import is_qoi, qoi_decode, qoi_encode


def _rng():
    return np.random.Generator(np.random.PCG64(41))


def _op_histogram(enc: bytes) -> dict:
    """Walk the chunk stream and count each QOI op."""
    ops = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
    p, end = 14, len(enc) - 8
    while p < end:
        b1 = enc[p]
        if b1 == 0xFE:
            ops["rgb"] += 1
            p += 4
        elif b1 == 0xFF:
            ops["rgba"] += 1
            p += 5
        else:
            tag = b1 & 0xC0
            name = {0x00: "index", 0x40: "diff",
                    0x80: "luma", 0xC0: "run"}[tag]
            ops[name] += 1
            p += 2 if tag == 0x80 else 1
    return ops


def test_qoi_roundtrip_rgb_rgba_all_content_modes():
    rng = _rng()
    for trial in range(30):
        h, w = int(rng.integers(1, 70)), int(rng.integers(1, 70))
        ch = (3, 4)[trial % 2]
        mode = trial % 5
        if mode == 0:
            img = np.full((h, w, ch), int(rng.integers(0, 256)), np.uint8)
        elif mode == 1:
            base = (np.add.outer(np.arange(h), np.arange(w)) % 256)
            img = np.stack([base] * ch, axis=2).astype(np.uint8)
        elif mode == 2:
            pal = rng.integers(0, 256, (5, ch), dtype=np.uint8)
            img = pal[rng.integers(0, 5, (h, w))]
        elif mode == 3:
            img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        else:
            img = np.full((h, w, ch), 9, np.uint8)
            m = rng.random((h, w)) < 0.15
            img[m] = rng.integers(0, 256, (int(m.sum()), ch),
                                  dtype=np.uint8)
        enc = qoi_encode(np.ascontiguousarray(img))
        assert is_qoi(enc)
        dec = qoi_decode(enc)
        assert dec.shape == img.shape
        assert np.array_equal(dec, img)


def test_qoi_spec_details():
    img = np.full((3, 5, 3), 77, np.uint8)
    enc = qoi_encode(img)
    # header: magic, BE dims, channels, colorspace
    assert enc[:4] == b"qoif"
    w, h, ch, cs = struct.unpack(">IIBB", enc[4:14])
    assert (w, h, ch, cs) == (5, 3, 3, 0)
    # trailer: seven 0x00 then 0x01
    assert enc[-8:] == b"\x00" * 7 + b"\x01"
    # first pixel (77,77,77) from prev (0,0,0): a literal RGB chunk,
    # then one RUN covering the remaining 14 pixels (run bias -1)
    assert enc[14] == 0xFE and enc[15:18] == bytes((77, 77, 77))
    assert enc[18] == 0xC0 | (14 - 1)

    # runs cap at 62 (values 62/63 collide with the RGB/RGBA tags)
    flat = np.zeros((1, 200, 3), np.uint8) + 5
    ops = _op_histogram(qoi_encode(flat))
    assert ops["run"] == 4          # 199 repeats -> 62+62+62+13
    # alpha change forces an RGBA literal
    im = np.full((1, 3, 4), 10, np.uint8)
    im[0, 1, 3] = 99
    assert _op_histogram(qoi_encode(im))["rgba"] >= 1


def test_qoi_index_replay():
    # A B A with hash-distinct colors: third pixel must be an INDEX op
    a = (10, 20, 30)
    b = (200, 100, 50)
    img = np.array([[a, b, a]], dtype=np.uint8)
    enc = qoi_encode(img)
    ops = _op_histogram(enc)
    assert ops["index"] >= 1
    assert np.array_equal(qoi_decode(enc), img)


def test_qoi_wraparound_diffs():
    # 255 -> 0 is dr=+1 after mod-256 wrap: must encode as DIFF and
    # round-trip exactly
    img = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
    enc = qoi_encode(img)
    assert _op_histogram(enc)["diff"] >= 1
    assert np.array_equal(qoi_decode(enc), img)


def test_qoi_rejects_garbage():
    import pytest

    with pytest.raises(ValueError):
        qoi_decode(b"nope")
    good = qoi_encode(np.zeros((2, 2, 3), np.uint8))
    with pytest.raises(ValueError):
        qoi_decode(good[:-9] + b"\x00" * 9)   # broken end marker
    with pytest.raises(ValueError):
        qoi_decode(good[:16])                 # truncated


def test_qoi_synth_corpus_exercises_every_op():
    from aspseek_ray.pipelines.multimodal import synth_qoi_media_table

    t = synth_qoi_media_table(20)
    total = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0,
             "run": 0}
    for payload in t["payload"].to_pylist():
        for k, v in _op_histogram(payload).items():
            total[k] += v
    assert all(v > 0 for v in total.values()), total


def test_qoi_pixel_stats_match_bmp_twin(ray_session):
    """The independent-codec invariant behind the
    multimodal_qoi_pixel_stats oracle: decoding the QOI payload and the
    BMP twin of the same pixels yields identical exact channel sums."""
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        media_pixel_stats,
        synth_qoi_media_table,
    )

    t = synth_qoi_media_table(18)
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
