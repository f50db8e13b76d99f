"""RIFF/WAVE PCM codec (core/wav.py) + multimodal audio integration."""

import numpy as np
import pytest

from doc_parser_spark.core.wav import WavError, decode_wav, encode_wav


def _tone(n=500, ch=1):
    t = np.arange(n) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)
    if ch == 2:
        return np.stack([x, -x], axis=1)
    return x


@pytest.mark.parametrize("bits,tol", [(8, 1 / 120), (16, 1 / 3e4), (24, 1e-6), (32, 1e-9), (-32, 1e-7)])
def test_roundtrip_depths(bits, tol):
    x = _tone()
    rate, y = decode_wav(encode_wav(x, 8000, bits=bits))
    assert rate == 8000 and y.shape == (500, 1)
    assert np.abs(y[:, 0] - x).max() < tol


def test_stereo_and_word_alignment():
    x = _tone(ch=2)
    rate, y = decode_wav(encode_wav(x, 44100, bits=16))
    assert y.shape == (500, 2)
    assert np.allclose(y[:, 0], -y[:, 1], atol=1e-4)
    # odd-sized extra chunk before data must be skipped with padding
    raw = encode_wav(x, 44100, bits=16)
    injected = raw[:12] + b"LIST\x05\x00\x00\x00INFOx\x00" + raw[12:]
    rate2, y2 = decode_wav(injected)
    assert rate2 == 44100 and np.array_equal(y, y2)


def test_reference_fixture_wav_decodes():
    from doc_parser_spark.sources.office_fixtures import make_wav

    rate, y = decode_wav(make_wav(3, n_samples=256))
    assert rate == 8000 and y.shape == (256, 1)
    assert y.std() > 0.01


def test_errors():
    with pytest.raises(WavError, match="not a RIFF"):
        decode_wav(b"RIFX1234WAVE")
    with pytest.raises(WavError, match="missing data"):
        decode_wav(b"RIFF\x10\x00\x00\x00WAVEfmt \x10\x00\x00\x00" + b"\x01\x00\x01\x00" + b"\x40\x1f\x00\x00\x80>\x00\x00\x02\x00\x10\x00")
    # compressed tag (e.g. 85 = MP3-in-WAV) is a codec boundary
    mp3ish = (
        b"RIFF\x28\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
        + b"\x55\x00\x01\x00\x40\x1f\x00\x00\x80>\x00\x00\x02\x00\x10\x00"
        + b"data\x04\x00\x00\x00abcd"
    )
    with pytest.raises(WavError, match="unsupported"):
        decode_wav(mp3ish)


def test_decode_media_real_wav(spark):
    from doc_parser_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    wav = encode_wav(_tone(300, ch=2), 16000, bits=16)
    rows = [
        ("m://tone.wav", "audio", wav),
        ("m://compressed.wav", "audio",
         b"RIFF\x28\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
         + b"\x55\x00\x01\x00\x40\x1f\x00\x00\x80>\x00\x00\x02\x00\x10\x00"
         + b"data\x04\x00\x00\x00abcd"),
        ("m://broken.wav", "audio", b"RIFF\x08\x00\x00\x00WAVEjunk"),
    ]
    out = {r["url"]: r for r in
           decode_media(spark.createDataFrame(rows, schema=MEDIA_SCHEMA)).collect()}
    tone = out["m://tone.wav"]
    assert tone["status"] == "decoded"
    assert (tone["sample_rate"], tone["n_samples"], tone["channels"]) == (16000, 300, 2)
    assert len(tone["features"]) == 18
    assert out["m://compressed.wav"]["status"] == "codec_unavailable"
    assert out["m://broken.wav"]["status"] == "corrupt"
