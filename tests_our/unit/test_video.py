"""GIF codec, AVI container, and video frame-sampling operator."""

import numpy as np
import pytest

from doc_parser_spark.core.avi import AviError, build_avi, parse_avi
from doc_parser_spark.core.gif import GifError, decode_gif, encode_gif


PAL4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def _idx(h, w, v):
    return np.full((h, w), v, np.uint8)


def test_gif_roundtrip_single_frame():
    frames = [(_idx(4, 6, 2), 0.0)]
    data = encode_gif(frames, PAL4)
    w, h, out = decode_gif(data)
    assert (w, h) == (6, 4)
    assert len(out) == 1
    rgb, delay = out[0]
    assert rgb.shape == (4, 6, 3)
    assert (rgb == np.array([0, 255, 0], np.uint8)).all()


def test_gif_animation_delays_and_compositing():
    # disposal=1 (leave): each frame paints over the previous canvas
    frames = [(_idx(3, 3, 1), 100.0), (_idx(3, 3, 2), 200.0), (_idx(3, 3, 3), 50.0)]
    data = encode_gif(frames, PAL4, disposal=1)
    _, _, out = decode_gif(data)
    assert [d for _, d in out] == [100.0, 200.0, 50.0]
    assert (out[0][0][0, 0] == PAL4[1]).all()
    assert (out[1][0][0, 0] == PAL4[2]).all()
    assert (out[2][0][0, 0] == PAL4[3]).all()


def test_gif_transparency_keeps_underlying_pixels():
    # frame 2 is entirely the transparent index -> canvas keeps frame 1
    frames = [(_idx(2, 2, 1), 10.0), (_idx(2, 2, 0), 10.0)]
    data = encode_gif(frames, PAL4, disposal=1, transparent=0)
    _, _, out = decode_gif(data)
    assert (out[1][0] == out[0][0]).all()


def test_gif_rejects_garbage():
    with pytest.raises(GifError):
        decode_gif(b"NOTAGIF" * 4)


def test_avi_roundtrip_and_fps():
    frames = [b"\xff\xd8frame0", b"\xff\xd8frame1", b"\xff\xd8frame2"]
    data = build_avi(frames, fps=5.0)
    usec, out = parse_avi(data)
    assert out == frames
    assert usec == 200000
    with pytest.raises(AviError):
        parse_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_sample_video_frames_avi_and_gif(spark):
    from doc_parser_spark.core.jpeg import encode_jpeg
    from doc_parser_spark.core.png import decode_png
    from doc_parser_spark.operators.multimodal import sample_video_frames

    # MJPEG AVI: 10 distinguishable real JPEG frames at 2 fps
    jpegs = [
        encode_jpeg(np.full((16, 16, 3), i * 20, np.uint8)) for i in range(10)
    ]
    avi = build_avi(jpegs, fps=2.0)
    # animated GIF: 4 frames, 500 ms each
    gif = encode_gif([(_idx(4, 4, i % 4), 500.0) for i in range(4)], PAL4)
    media = spark.createDataFrame(
        [
            ("v://clip.avi", "video/avi", bytearray(avi)),
            ("v://anim.gif", "image/gif", bytearray(gif)),
            ("v://mystery.mp4", "video/mp4", bytearray(b"\x00\x00\x00 ftypmp42")),
            ("v://broken.avi", "video/avi", bytearray(b"RIFF\xff\xff\xff\xffAVI trunc")),
        ],
        "url string, media_type string, payload binary",
    )
    rows = sample_video_frames(media, every_n_seconds=1.0).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)

    # AVI at 2 fps sampled at 1 s -> frames 0, 2, 4, 6, 8 as original JPEGs
    avi_rows = sorted(by_url["v://clip.avi"], key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in avi_rows] == [0, 2, 4, 6, 8]
    assert all(r["status"] == "sampled" and r["frame_format"] == "jpeg" for r in avi_rows)
    assert bytes(avi_rows[1]["frame"]) == jpegs[2]
    assert [r["ts_ms"] for r in avi_rows] == [0.0, 1000.0, 2000.0, 3000.0, 4000.0]

    # GIF: 500 ms frames sampled at 1 s -> source frames 0 (t=0) and 2 (t=1s)
    # and 3 (t=1.5s <= 2s… duration 1.5s) — targets 0, 1000 -> frames 0, 2
    gif_rows = sorted(by_url["v://anim.gif"], key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in gif_rows] == [0, 2]
    png0 = decode_png(bytes(gif_rows[0]["frame"]))
    assert (png0 == PAL4[0]).all()
    assert gif_rows[0]["frame_format"] == "png"

    # unknown codec -> marked boundary, one row, no frames
    assert by_url["v://mystery.mp4"][0]["status"] == "codec_unavailable"
    # corrupt container -> isolated failure row
    assert by_url["v://broken.avi"][0]["status"] == "corrupt"
