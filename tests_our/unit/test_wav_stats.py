"""wav_stats kernel: integer audio statistics through the real WAV codec.

The oracle (av_wav_stats) verifies the closed-form corpus end to end; these
tests pin the kernel against an independent pure-python replica and the
failure-isolation contract on hostile payloads.
"""

import numpy as np
import pytest

from doc_parser_spark.core import wav as wavlib
from doc_parser_spark.operators import multimodal as mm


def _replica(samples: list[int], rate: int) -> dict:
    """Pure-python recomputation (no numpy) of every statistic."""
    n = len(samples)
    sabs = [abs(s) for s in samples]
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "peak": max(sabs),
        "energy": sum(s * s for s in samples),
        "mean_abs": sum(sabs) // n,
        "zero_crossings": sum(
            1 for i in range(1, n) if samples[i - 1] * samples[i] < 0
        ),
        "clip_count": sum(1 for s in samples if s in (32767, -32768)),
        "silence_permille": 1000
        * sum(1 for s in sabs if s < mm.WAV_SILENCE_ABS)
        // n,
    }


@pytest.mark.unit
@pytest.mark.parametrize("doc_id", [0, 7, 38, 1234])
def test_synth_roundtrip_matches_replica(doc_id):
    rate, n, a, b = mm.synth_wav_params(doc_id)
    i = np.arange(n, dtype=np.int64)
    s = (a * i + b) % mm.SYNTH_WAV_MOD - 32768
    payload = wavlib.encode_wav(s / 32768.0, rate, bits=16)
    rec = mm._wav_stats_one(payload)
    assert rec["status"] == "decoded"
    expect = _replica([int(v) for v in s], rate)
    for k, v in expect.items():
        assert rec[k] == v, k


@pytest.mark.unit
def test_known_values_by_hand():
    # [100, -200, 300, 0, -32768]: two strict sign flips (0 breaks the
    # third product), one clip, peak 32768, four samples under the
    # silence threshold
    s = np.array([100, -200, 300, 0, -32768], dtype=np.int64)
    rec = mm._wav_stats_one(wavlib.encode_wav(s / 32768.0, 16000, bits=16))
    assert rec["peak"] == 32768
    assert rec["clip_count"] == 1
    assert rec["zero_crossings"] == 2
    assert rec["silence_permille"] == 1000 * 4 // 5
    assert rec["energy"] == int((s * s).sum())
    assert rec["duration_ms"] == 0  # 5 samples @ 16 kHz


@pytest.mark.unit
def test_hostile_payloads_isolate_per_row():
    assert mm._wav_stats_one(b"")["status"] == "empty"
    assert mm._wav_stats_one(b"RIFFxxxxWAVE")["status"].startswith("error:")
    assert mm._wav_stats_one(b"\x00" * 64)["status"].startswith("error:")
    # truncated mid-header
    rate, n, a, b = mm.synth_wav_params(3)
    i = np.arange(n, dtype=np.int64)
    s = (a * i + b) % mm.SYNTH_WAV_MOD - 32768
    good = wavlib.encode_wav(s / 32768.0, rate, bits=16)
    assert mm._wav_stats_one(good[:20])["status"].startswith("error:")


@pytest.mark.unit
def test_float_full_scale_clips_like_integer_path():
    # a hard-limited float32 WAV at +1.0 must map to PCM16 full scale
    # (32767) and register on the clip detector — the float and integer
    # paths share one full-scale value
    s = np.array([1.0, -1.0, 0.5, 1.0], dtype=np.float64)
    rec = mm._wav_stats_one(wavlib.encode_wav(s, 8000, bits=-32))
    assert rec["status"] == "decoded"
    assert rec["peak"] == 32768  # |-1.0| -> -32768, in range
    assert rec["clip_count"] == 3  # +1.0 twice -> 32767, -1.0 -> -32768


@pytest.mark.unit
def test_stereo_uses_channel_zero():
    left = np.array([1000, -1000, 1000, -1000], dtype=np.int64)
    right = np.zeros(4, dtype=np.int64)
    inter = np.stack([left, right], axis=1) / 32768.0
    rec = mm._wav_stats_one(wavlib.encode_wav(inter, 8000, bits=16))
    assert rec["n_samples"] == 4
    assert rec["peak"] == 1000
    assert rec["zero_crossings"] == 3


@pytest.mark.unit
@pytest.mark.parametrize("doc_id", [0, 5, 91, 400])
def test_fingerprint_matches_replica(doc_id):
    rate, n, a, b = mm.synth_wav_params(doc_id)
    i = np.arange(n, dtype=np.int64)
    s = (a * i + b) % mm.SYNTH_WAV_MOD - 32768
    rec = mm._wav_fp_one(wavlib.encode_wav(s / 32768.0, rate, bits=16))
    assert rec["status"] == "decoded"
    w = n // mm.WAV_FP_WINDOWS
    ref = 0
    for k in range(mm.WAV_FP_WINDOWS - 1):
        e0 = sum(int(v) ** 2 for v in s[k * w:(k + 1) * w])
        e1 = sum(int(v) ** 2 for v in s[(k + 1) * w:(k + 2) * w])
        if e0 > e1:
            ref |= 1 << k
    assert rec["fp"] == ref


@pytest.mark.unit
def test_fingerprint_robust_to_small_noise_and_gain():
    """The envelope hash must survive mild re-encoding artifacts (the
    reason it exists): small additive noise and a gain change keep the
    Hamming distance tiny, while a different clip is far away."""
    rng = np.random.RandomState(3)
    base = (rng.randint(-20000, 20000, 4000)).astype(np.int64)
    fp0 = mm._wav_fp_one(wavlib.encode_wav(base / 32768.0, 8000))["fp"]
    noisy = base + rng.randint(-50, 50, 4000)
    fp1 = mm._wav_fp_one(wavlib.encode_wav(noisy / 32768.0, 8000))["fp"]
    gained = (base * 0.8).astype(np.int64)
    fp2 = mm._wav_fp_one(wavlib.encode_wav(gained / 32768.0, 8000))["fp"]
    other = (rng.randint(-20000, 20000, 4000)).astype(np.int64)
    fp3 = mm._wav_fp_one(wavlib.encode_wav(other / 32768.0, 8000))["fp"]
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(fp0, fp1) <= 3
    assert ham(fp0, fp2) <= 3
    assert ham(fp0, fp3) > 3


@pytest.mark.unit
def test_fingerprint_short_and_hostile():
    assert mm._wav_fp_one(b"")["status"] == "empty"
    assert mm._wav_fp_one(b"RIFFxxxxWAVE")["status"].startswith("error:")
    tiny = wavlib.encode_wav(np.zeros(10) / 32768.0, 8000)
    assert mm._wav_fp_one(tiny)["status"] == "short"
