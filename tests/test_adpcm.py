"""IMA ADPCM codec: table/format pins, the in-loop-reconstruction
bitwise invariant, container structure, wav_decode dispatch, and the
twin invariant behind the multimodal_adpcm_audio_stats oracle."""

import struct

import numpy as np
import pytest

from aspseek_ray.functions.adpcm import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    adpcm_decode,
    adpcm_encode,
)
from aspseek_ray.functions.media import wav_decode, wav_encode

RNG = np.random.Generator(np.random.PCG64(23))


def _tone(n, rate=8000, freq=440.0, amp=18000.0, noise=300.0, rng=RNG):
    t = np.arange(n, dtype=np.float64) / rate
    sig = np.sin(2 * np.pi * freq * t) * amp + rng.normal(0, noise, n)
    return np.clip(sig, -32768, 32767).astype(np.int16)


# --------------------------------------------------------------- spec pins
def test_ima_tables_are_the_published_ones():
    assert len(IMA_STEP_TABLE) == 89
    assert IMA_STEP_TABLE[0] == 7 and IMA_STEP_TABLE[88] == 32767
    assert (np.diff(IMA_STEP_TABLE) > 0).all()      # strictly increasing
    # the table is (approximately) geometric with ratio ~1.1
    ratios = IMA_STEP_TABLE[1:-1].astype(float) / IMA_STEP_TABLE[:-2]
    assert 1.05 < ratios.mean() < 1.15
    assert list(IMA_INDEX_TABLE) == [-1, -1, -1, -1, 2, 4, 6, 8]


def test_container_structure():
    s = _tone(1200)
    payload, _ = adpcm_encode(s, rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    tag, ch, rate = struct.unpack_from("<HHI", payload, 20)
    assert (tag, ch, rate) == (0x11, 1, 8000)
    block_align, bits = struct.unpack_from("<HH", payload, 32)
    spb = struct.unpack_from("<H", payload, 38)[0]
    assert bits == 4 and spb == 505
    assert block_align == 4 + (spb - 1) // 2        # mono
    # fact chunk carries the true frame count
    i = payload.find(b"fact")
    assert i > 0 and struct.unpack_from("<I", payload, i + 8)[0] == 1200


# ----------------------------------------------- the defining invariant
@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("n", [2, 17, 505, 1200, 505 * 3 + 7])
def test_decode_equals_in_loop_reconstruction(ch, n):
    s = _tone(n)
    if ch == 2:
        s = np.stack([s, np.roll(s, n // 3)], axis=1)
    payload, recon = adpcm_encode(s, rate=8000)
    dec, rate = adpcm_decode(payload)
    assert rate == 8000
    assert dec.dtype == np.int16 and dec.shape == ((n, ch))
    assert np.array_equal(dec, recon)


def test_snr_is_codec_grade():
    # 4-bit ADPCM on a clean-ish tone should land near 30 dB, far above
    # what a broken state machine produces (under 10 dB)
    s = _tone(4000)
    payload, _ = adpcm_encode(s, rate=8000)
    dec, _ = adpcm_decode(payload)
    err = dec[:, 0].astype(float) - s.astype(float)
    snr = 10 * np.log10((s.astype(float) ** 2).mean() / (err ** 2).mean())
    assert snr > 25.0
    # ~3.5-4x smaller than PCM16 at several blocks
    assert len(payload) < s.nbytes / 3


def test_stereo_channels_are_independent():
    left = _tone(1010, freq=300.0)
    right = _tone(1010, freq=1700.0)
    st = np.stack([left, right], axis=1)
    dec_st, _ = adpcm_decode(adpcm_encode(st, rate=8000)[0])
    dec_l, _ = adpcm_decode(adpcm_encode(left, rate=8000)[0])
    dec_r, _ = adpcm_decode(adpcm_encode(right, rate=8000)[0])
    assert np.array_equal(dec_st[:, 0], dec_l[:, 0])
    assert np.array_equal(dec_st[:, 1], dec_r[:, 0])


def test_first_sample_is_verbatim_and_errors():
    s = _tone(505)
    dec, _ = adpcm_decode(adpcm_encode(s, rate=8000)[0])
    assert dec[0, 0] == s[0]                       # header sample exact
    with pytest.raises(ValueError):
        adpcm_encode(np.zeros(0, dtype=np.int16))
    with pytest.raises(ValueError):
        adpcm_encode(s.astype(np.int32))
    with pytest.raises(ValueError):
        adpcm_encode(s, samples_per_block=500)     # (spb-1) % 8 != 0
    with pytest.raises(NotImplementedError):
        adpcm_decode(wav_encode(s, 8000))          # PCM16 is not ADPCM
    with pytest.raises(ValueError):
        adpcm_decode(b"RIFFxxxxWAVE")


def test_wav_decode_dispatches_adpcm():
    s = _tone(1010)
    payload, recon = adpcm_encode(s, rate=16000)
    samples, rate = wav_decode(payload)
    assert rate == 16000 and np.array_equal(samples, recon)
    # PCM16 still works, unknown tags still a declared seam
    samples, rate = wav_decode(wav_encode(s, 8000))
    assert np.array_equal(samples[:, 0], s)
    bad = bytearray(wav_encode(s, 8000))
    bad[20] = 0x55                                  # some other format tag
    with pytest.raises(NotImplementedError):
        wav_decode(bytes(bad))


def test_batch_decoder_matches_per_clip():
    # adpcm_decode_many runs ALL payloads' streams through one state
    # loop; it must be bit-identical to per-clip decoding across mixed
    # shapes, rates and channel counts
    from aspseek_ray.functions.adpcm import adpcm_decode_many, is_adpcm

    rng = np.random.Generator(np.random.PCG64(99))
    payloads = []
    for i in range(12):
        n = int(rng.integers(3, 2000))
        ch = (1, 2)[i % 2]
        s = np.clip(rng.normal(0, 9000, (n, ch)),
                    -32768, 32767).astype(np.int16)
        payloads.append(adpcm_encode(s, rate=(8000, 16000)[i % 2])[0])
    many = adpcm_decode_many(payloads)
    for p, (samp, rate) in zip(payloads, many):
        assert is_adpcm(p)
        one, r1 = adpcm_decode(p)
        assert r1 == rate and np.array_equal(one, samp)
    assert not is_adpcm(wav_encode(_tone(100), 8000))


# ------------------------------------------------ oracle twin invariant
def test_adpcm_audio_stats_match_pcm_twin(ray_session):
    """The invariant behind the multimodal_adpcm_audio_stats oracle:
    decoding the ADPCM payload and re-parsing the PCM16 twin of the
    in-loop reconstruction yield identical exact stats."""
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        media_audio_stats,
        synth_adpcm_media_table,
    )

    t = synth_adpcm_media_table(16)
    got = media_audio_stats(
        rd.from_arrow(t.select(["media_id", "media_type", "payload"]))
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    assert len(got) == 16
    for i, row in got.iterrows():
        twin, rate = wav_decode(t["payload_pcm"][i].as_py())
        s = twin[:, 0].astype(np.int64)
        assert row["rate"] == rate
        assert row["n_samples"] == len(s)
        assert row["peak_abs"] == int(np.abs(s).max())
        assert row["mean_sample"] == s.sum() / len(s)
        assert row["zero_cross"] == int(
            np.count_nonzero((s[1:] < 0) != (s[:-1] < 0)))
