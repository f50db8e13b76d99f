"""media_filter: the multimodal curation gate over the stat panels."""

import pytest

from doc_parser_spark.operators import multimodal as mm

WAV_SCHEMA = (
    "doc_id long, status string, sample_rate int, n_samples long,"
    " duration_ms long, peak long, energy long, mean_abs long,"
    " zero_crossings long, clip_count long, silence_permille long"
)
VID_SCHEMA = (
    "doc_id long, status string, n_frames long, usec_per_frame long,"
    " duration_ms long, total_frame_bytes long, min_frame_bytes long,"
    " max_frame_bytes long"
)


def _wav_row(doc_id, status="decoded", duration_ms=1000, silence=100,
             clip=0, n=16000):
    return (doc_id, status, 16000, n, duration_ms, 20000, 1, 5000, 10,
            clip, silence)


def _vid_row(doc_id, status="parsed", n_frames=10, duration_ms=1000):
    return (doc_id, status, n_frames, 100000, duration_ms, 5000, 100, 600)


@pytest.mark.unit
def test_gates(spark):
    wav = spark.createDataFrame(
        [
            _wav_row(1),                                  # clean
            _wav_row(2, duration_ms=50),                  # too short
            _wav_row(3, silence=950),                     # dead air
            _wav_row(4, clip=200, n=16000),               # 12.5 permille clip
            _wav_row(5, status="error:WavError"),
            _wav_row(7, duration_ms=61000),               # too long
        ],
        WAV_SCHEMA,
    )
    vid = spark.createDataFrame(
        [
            _vid_row(1),
            _vid_row(2),
            _vid_row(3, n_frames=1),                      # single frame
            _vid_row(4),
            _vid_row(6, status="error:AviError"),         # no audio row
            _vid_row(7),
        ],
        VID_SCHEMA,
    )
    out = {r["doc_id"]: r.asDict() for r in mm.media_filter(wav, vid).collect()}
    assert out[1]["keep"] is True
    assert out[2]["pass_audio"] is False and out[2]["pass_video"] is True
    assert out[3]["pass_audio"] is False  # silence gate
    assert out[3]["pass_video"] is False  # min_frames gate
    assert out[4]["pass_audio"] is False  # clip gate
    assert out[5]["pass_video"] is False and out[5]["video_status"] == "missing"
    assert out[6]["pass_audio"] is False and out[6]["audio_status"] == "missing"
    assert out[7]["pass_audio"] is False  # max duration gate
    assert all(not r["keep"] for d, r in out.items() if d != 1)


@pytest.mark.unit
def test_clip_gate_boundary(spark):
    # exactly 10 permille clips passes (<=), 11 fails
    wav = spark.createDataFrame(
        [_wav_row(1, clip=160, n=16000), _wav_row(2, clip=177, n=16000)],
        WAV_SCHEMA,
    )
    vid = spark.createDataFrame([_vid_row(1), _vid_row(2)], VID_SCHEMA)
    out = {r["doc_id"]: r.asDict() for r in mm.media_filter(wav, vid).collect()}
    assert out[1]["pass_audio"] is True   # 160*1000 == 10*16000
    assert out[2]["pass_audio"] is False  # 177*1000 > 10*16000
