"""video_stats kernel: container-level stats through the real AVI walk."""

import pytest

from doc_parser_spark.core import avi as avilib
from doc_parser_spark.operators import multimodal as mm


@pytest.mark.unit
@pytest.mark.parametrize("doc_id", [0, 3, 14, 999])
def test_synth_roundtrip_matches_closed_form(doc_id):
    n, fps = mm.synth_video_params(doc_id)
    frames = [
        bytes([(17 * j + doc_id) % 256]) * (100 + (7 * doc_id + 13 * j) % 50)
        for j in range(n)
    ]
    rec = mm._video_stats_one(avilib.build_avi(frames, fps=fps))
    sizes = [100 + (7 * doc_id + 13 * j) % 50 for j in range(n)]
    assert rec["status"] == "parsed"
    assert rec["n_frames"] == n
    assert rec["usec_per_frame"] == 1000000 // fps
    assert rec["duration_ms"] == n * (1000000 // fps) // 1000
    assert rec["total_frame_bytes"] == sum(sizes)
    assert rec["min_frame_bytes"] == min(sizes)
    assert rec["max_frame_bytes"] == max(sizes)


@pytest.mark.unit
def test_hostile_payloads_isolate_per_row():
    assert mm._video_stats_one(b"")["status"] == "empty"
    assert mm._video_stats_one(b"RIFF\x00\x00\x00\x00WAVE")["status"].startswith(
        "error:"
    )
    # a valid RIFF/AVI header with no frames
    import struct

    empty = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    assert mm._video_stats_one(empty)["status"].startswith("error:")
