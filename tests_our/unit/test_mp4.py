"""Header-only MP4 walker + H.264 SPS parser on a hand-built file.

The synthetic MP4 is assembled box-by-box from the ISO/IEC 14496-12
layout and the SPS bit-by-bit from ITU-T H.264 §7.3.2.1, so every
expectation is closed-form — no media library anywhere.
"""

import pytest

from doc_parser_spark.core import mp4 as mp4lib
from doc_parser_spark.operators import multimodal as mm

pytestmark = pytest.mark.unit


class _BitW:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int):
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes(self) -> bytes:
        bits = self.bits + [1] + [0] * 7  # rbsp_stop_one_bit + align
        out = bytearray()
        for i in range(0, len(bits) - 7, 8):
            out.append(
                sum(b << (7 - j) for j, b in enumerate(bits[i : i + 8]))
            )
        return bytes(out)


def _sps(width_mbs=4, height_mbs=3, crop_r=2, crop_b=1) -> bytes:
    """Baseline-profile SPS: 4x3 macroblocks cropped to 60x46."""
    w = _BitW()
    w.u(66, 8)       # profile_idc baseline
    w.u(0, 8)        # constraint flags
    w.u(30, 8)       # level_idc 3.0
    w.ue(0)          # sps_id
    w.ue(0)          # log2_max_frame_num_minus4
    w.ue(0)          # pic_order_cnt_type
    w.ue(0)          # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)          # max_num_ref_frames
    w.u(0, 1)        # gaps_in_frame_num
    w.ue(width_mbs - 1)
    w.ue(height_mbs - 1)
    w.u(1, 1)        # frame_mbs_only_flag
    w.u(1, 1)        # direct_8x8_inference
    w.u(1, 1)        # frame_cropping_flag
    w.ue(0); w.ue(crop_r); w.ue(0); w.ue(crop_b)
    w.u(0, 1)        # vui_parameters_present
    return b"\x67" + w.bytes()  # NAL header: nal_ref_idc=3, type=7


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def _full(btype: bytes, payload: bytes, version=0, flags=0) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def _synth_mp4(n_frames=24, timescale=1000, dur_per_frame=40) -> bytes:
    sps = _sps()
    avcc = _box(
        b"avcC",
        bytes([1, 66, 0, 30, 0xFF, 0xE1])
        + len(sps).to_bytes(2, "big") + sps
        + b"\x00",  # numOfPPS = 0
    )
    sample_entry = _box(
        b"avc1",
        bytes(6) + (1).to_bytes(2, "big")          # reserved + dref idx
        + bytes(16)                                  # predefined/reserved
        + (60).to_bytes(2, "big") + (46).to_bytes(2, "big")  # w, h
        + (0x00480000).to_bytes(4, "big") * 2        # 72 dpi x/y
        + bytes(4) + (1).to_bytes(2, "big")          # reserved + frame_count
        + bytes(32)                                  # compressorname
        + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
        + avcc,
    )
    stsd = _full(b"stsd", (1).to_bytes(4, "big") + sample_entry)
    stts = _full(
        b"stts",
        (1).to_bytes(4, "big")
        + n_frames.to_bytes(4, "big") + dur_per_frame.to_bytes(4, "big"),
    )
    sizes = [100 + 7 * i for i in range(n_frames)]
    stsz = _full(
        b"stsz",
        (0).to_bytes(4, "big") + n_frames.to_bytes(4, "big")
        + b"".join(s.to_bytes(4, "big") for s in sizes),
    )
    stbl = _box(b"stbl", stsd + stts + stsz)
    minf = _box(b"minf", stbl)
    mdhd = _full(
        b"mdhd",
        bytes(8)                                     # creation/modification
        + timescale.to_bytes(4, "big")
        + (n_frames * dur_per_frame).to_bytes(4, "big")
        + bytes(4),
    )
    hdlr = _full(b"hdlr", bytes(4) + b"vide" + bytes(12))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    mvhd = _full(b"mvhd", bytes(96))
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomavc1")
    mdat = _box(b"mdat", b"\x00" * 64)
    return ftyp + moov + mdat


def test_sps_geometry_and_profile():
    info = mp4lib.parse_sps(_sps())
    # 4x3 MBs = 64x48; crop_right=2, crop_bottom=1 in 2-px units → 60x46
    assert info == {
        "profile_idc": 66, "level_idc": 30, "width": 60, "height": 46,
    }


def test_sps_rejects_non_sps_nal():
    with pytest.raises(mp4lib.Mp4Error):
        mp4lib.parse_sps(b"\x68\x00")  # PPS NAL


def test_parse_mp4_header_only_probe():
    info = mp4lib.parse_mp4(_synth_mp4())
    assert info.codec == "avc1"
    assert (info.width, info.height) == (60, 46)
    assert info.timescale == 1000 and info.duration == 960
    assert info.n_frames == 24
    assert info.sample_sizes[0] == 100 and info.sample_sizes[-1] == 261
    assert info.sps == {
        "profile_idc": 66, "level_idc": 30, "width": 60, "height": 46,
    }


def test_video_stats_kernel_covers_mp4():
    rec = mm._video_stats_one(_synth_mp4())
    assert rec["status"] == "parsed"
    assert rec["n_frames"] == 24
    assert rec["duration_ms"] == 960  # 24 * 40ms at timescale 1000
    assert rec["usec_per_frame"] == 40000
    assert rec["total_frame_bytes"] == sum(100 + 7 * i for i in range(24))
    assert rec["min_frame_bytes"] == 100 and rec["max_frame_bytes"] == 261


def test_video_stats_mp4_hostile_payloads_isolate():
    good = _synth_mp4()
    assert mm._video_stats_one(good[:40])["status"].startswith("error:")
    # ftyp magic but garbage after → error, not crash
    assert mm._video_stats_one(good[:8] + b"\x01" * 8)["status"].startswith(
        "error:"
    )


def test_media_filter_gains_a_real_codec_row(spark):
    """An MP4/H.264 clip flows through the A/V curation gate beside the
    AVI rows: in-bounds duration passes, a 1-frame clip fails."""
    from pyspark.sql import Row

    good = _synth_mp4()                      # 960 ms, 24 frames → pass
    short = _synth_mp4(n_frames=1)           # 40 ms, 1 frame → fail
    video = mm.video_stats(
        spark.createDataFrame(
            [Row(doc_id=1, payload=bytearray(good)),
             Row(doc_id=2, payload=bytearray(short))]
        )
    )
    wav = mm.wav_stats(
        spark.createDataFrame([Row(doc_id=3, payload=bytearray(b""))])
    )
    out = {r["doc_id"]: r.asDict() for r in mm.media_filter(wav, video).collect()}
    assert out[1]["pass_video"] is True
    assert out[2]["pass_video"] is False


# -- ADVICE r4 regressions: malformed-box isolation + stsz trust ------------


def _mp4_with(stbl_extra=b"", mdhd_body=None, avcc=None) -> bytes:
    """Minimal video trak whose mdhd/stbl children are caller-supplied —
    for hostile-payload shapes _synth_mp4's fixed layout can't express."""
    sample_entry = _box(
        b"avc1",
        bytes(6) + (1).to_bytes(2, "big") + bytes(16)
        + (60).to_bytes(2, "big") + (46).to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big") * 2
        + bytes(4) + (1).to_bytes(2, "big") + bytes(32)
        + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
        + (avcc if avcc is not None else b""),
    )
    stsd = _full(b"stsd", (1).to_bytes(4, "big") + sample_entry)
    stbl = _box(b"stbl", stsd + stbl_extra)
    minf = _box(b"minf", stbl)
    if mdhd_body is None:
        mdhd_body = bytes(8) + (1000).to_bytes(4, "big") \
            + (960).to_bytes(4, "big") + bytes(4)
    mdhd = _full(b"mdhd", mdhd_body)
    hdlr = _full(b"hdlr", bytes(4) + b"vide" + bytes(12))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    moov = _box(b"moov", _box(b"trak", mdia))
    ftyp = _box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomavc1")
    return ftyp + moov


def test_truncated_mdhd_raises_mp4error_not_indexerror():
    # mdhd with an empty body: the version byte itself is out of range —
    # must raise Mp4Error, never IndexError (per-doc isolation contract)
    data = _mp4_with(mdhd_body=b"")
    with pytest.raises(mp4lib.Mp4Error):
        mp4lib.parse_mp4(data)
    assert mm._video_stats_one(data)["status"] == "error:Mp4Error"


def test_truncated_mdhd_v1_raises():
    data = _mp4_with(mdhd_body=bytes(24))  # v0-sized body…
    # …but flip the version byte to 1 (needs 36): _full wrote version=0
    idx = data.index(b"mdhd") + 4
    data = data[:idx] + b"\x01" + data[idx + 1:]
    with pytest.raises(mp4lib.Mp4Error):
        mp4lib.parse_mp4(data)


def test_truncated_avcc_sps_raises():
    # avcC declares one SPS of 500 bytes but the box ends after 8
    avcc = _box(b"avcC", bytes([1, 66, 0, 30, 0xFF, 0xE1]) + (500).to_bytes(2, "big"))
    data = _mp4_with(avcc=avcc, stbl_extra=_full(
        b"stsz", (0).to_bytes(4, "big") + (1).to_bytes(4, "big") + (9).to_bytes(4, "big")
    ))
    with pytest.raises(mp4lib.Mp4Error):
        mp4lib.parse_mp4(data)
    assert mm._video_stats_one(data)["status"] == "error:Mp4Error"


def test_stsz_count_exceeding_box_body_raises():
    # declared 1000 samples, body holds 2 entries: out-of-box slices must
    # not silently decode as 0-size frames
    stsz = _full(
        b"stsz",
        (0).to_bytes(4, "big") + (1000).to_bytes(4, "big")
        + (100).to_bytes(4, "big") + (200).to_bytes(4, "big"),
    )
    data = _mp4_with(stbl_extra=stsz)
    with pytest.raises(mp4lib.Mp4Error):
        mp4lib.parse_mp4(data)
    assert mm._video_stats_one(data)["status"] == "error:Mp4Error"


def test_uniform_stsz_hostile_count_never_materializes():
    # uniform size with a near-2^32 count: stats are pure arithmetic —
    # parses instantly instead of allocating tens of GB
    stsz = _full(
        b"stsz",
        (100).to_bytes(4, "big") + (2**31).to_bytes(4, "big"),
    )
    info = mp4lib.parse_mp4(_mp4_with(stbl_extra=stsz))
    assert info.sample_sizes == []  # no list for the uniform path
    assert info.n_frames == 2**31
    assert info.size_total == 100 * 2**31
    assert info.size_min == info.size_max == 100


def test_video_stats_isolates_any_indexerror(monkeypatch):
    # defense in depth: even an unforeseen raw-index escape inside
    # parse_mp4 must yield an error-status row, not fail the Spark task
    def boom(_):
        raise IndexError("index out of range")

    monkeypatch.setattr(mp4lib, "parse_mp4", boom)
    rec = mm._video_stats_one(_synth_mp4())
    assert rec["status"] == "error:IndexError"
