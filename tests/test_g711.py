"""G.711 mu-law/A-law codec: normative-table checkpoints, WAV container
round trip, and the decode-twin invariant behind the
multimodal_g711_audio_stats oracle."""

import numpy as np
import pytest

from aspseek_ray.functions.g711 import (
    ALAW_TABLE,
    ULAW_TABLE,
    g711_compress,
    g711_expand,
    g711_wav_encode,
)
from aspseek_ray.functions.media import wav_decode


def _rng():
    return np.random.Generator(np.random.PCG64(43))


def test_g711_table_spec_checkpoints():
    # The classic expansion values every conforming implementation shares
    assert ULAW_TABLE[0xFF] == 0 and ULAW_TABLE[0x7F] == 0
    assert ULAW_TABLE[0x80] == 32124 and ULAW_TABLE[0x00] == -32124
    assert ALAW_TABLE[0xD5] == 8 and ALAW_TABLE[0x55] == -8
    assert ALAW_TABLE[0xAA] == 32256 and ALAW_TABLE[0x2A] == -32256
    # mu-law has exactly one duplicated value (two zero codes);
    # A-law's 256 codes expand to 256 distinct values
    assert len(set(ULAW_TABLE.tolist())) == 255
    assert len(set(ALAW_TABLE.tolist())) == 256


def test_g711_expand_compress_idempotent():
    rng = _rng()
    codes = rng.integers(0, 256, 2000).astype(np.uint8)
    for law in ("ulaw", "alaw"):
        exp = g711_expand(codes, law)
        assert np.array_equal(g711_expand(g711_compress(exp, law), law),
                              exp)


def test_g711_wav_roundtrip_and_twin():
    rng = _rng()
    for law in ("ulaw", "alaw"):
        for ch in (1, 2):
            s = np.clip(rng.normal(0, 9000, (777, ch)),
                        -32768, 32767).astype(np.int16)
            payload, recon = g711_wav_encode(s, rate=8000, law=law)
            assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
            dec, rate = wav_decode(payload)
            assert rate == 8000 and dec.shape == s.shape
            # the decode-twin contract: decoder output == the encoder's
            # normative expansion, bitwise
            assert np.array_equal(dec, recon)
            # companding quality: >= 30 dB SNR on a speech-level signal
            err = (s - recon).astype(np.float64)
            snr = 10 * np.log10((s.astype(np.float64) ** 2).mean()
                                / (err ** 2).mean())
            assert snr > 30.0, (law, ch, snr)


def test_g711_wav_rejects_wrong_bits():
    payload, _ = g711_wav_encode(np.zeros(10, np.int16))
    # corrupt bits-per-sample: 8 -> 12 must be a declared seam
    bad = bytearray(payload)
    pos = payload.index(b"fmt ")
    bad[pos + 8 + 14] = 12
    with pytest.raises(NotImplementedError):
        wav_decode(bytes(bad))


def test_g711_audio_stats_match_pcm_twin(ray_session):
    """The independent-codec invariant behind the
    multimodal_g711_audio_stats oracle: exact integer stats over the
    decoded G.711 payload equal the stats over its PCM16 twin."""
    import ray.data as rd

    from aspseek_ray.pipelines.multimodal import (
        media_audio_stats,
        synth_g711_media_table,
    )

    t = synth_g711_media_table(12)
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
