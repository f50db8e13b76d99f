"""Header-only ISO BMFF (MP4) walker + H.264/AVC SPS parser.

The dominant real-world video container: box-structured metadata
(``moov``) beside an opaque ``mdat`` payload. Everything the curation
gate needs — frame count, timing, per-frame byte sizes, declared
dimensions, and the codec's own profile/level/geometry from the SPS NAL
inside ``avcC`` — lives in headers, so no frame is ever decoded and the
compressed-bitstream boundary (multimodal.py's NotImplementedError)
stays intact.

Format sources (public specs): ISO/IEC 14496-12 (box structure, stbl
child boxes), ISO/IEC 14496-15 (AVCDecoderConfigurationRecord), ITU-T
H.264 §7.3.2.1 (seq_parameter_set_rbsp Exp-Golomb layout). Reference
parity note: the reference repo wraps ffmpeg/Pillow for A/V probing
(scoped out per SURVEY §7); this module is the deterministic header
subset of that surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Mp4Error(ValueError):
    pass


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) across [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box")
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise Mp4Error("bad box size")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(data, start, end):
        if t == btype:
            return b, e
    return None


class _Bits:
    """MSB-first bit reader with Exp-Golomb decodes (H.264 §9.1)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.d):
                raise Mp4Error("SPS bitstream underrun")
            v = (v << 1) | ((self.d[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise Mp4Error("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(nal: bytes) -> dict:
    """SPS NAL (header byte included) → profile/level/derived geometry.

    Emulation-prevention bytes (00 00 03) strip first; dimensions follow
    §7.4.2.1.1's derivation incl. frame cropping (4:2:0 crop units)."""
    if not nal or nal[0] & 0x1F != 7:
        raise Mp4Error("not an SPS NAL")
    rbsp = nal[1:].replace(b"\x00\x00\x03", b"\x00\x00")
    b = _Bits(rbsp)
    profile_idc = b.u(8)
    b.u(8)  # constraint_set flags + reserved
    level_idc = b.u(8)
    b.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = b.ue()
        if chroma_format_idc == 3:
            b.u(1)  # separate_colour_plane_flag
        b.ue()  # bit_depth_luma_minus8
        b.ue()  # bit_depth_chroma_minus8
        b.u(1)  # qpprime_y_zero_transform_bypass_flag
        if b.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if b.u(1):  # seq_scaling_list_present_flag[i]
                    last, nxt = 8, 8
                    for _ in range(16 if i < 6 else 64):
                        if nxt:
                            nxt = (last + b.se() + 256) % 256
                        last = nxt or last
    b.ue()  # log2_max_frame_num_minus4
    poc_type = b.ue()
    if poc_type == 0:
        b.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        b.u(1)  # delta_pic_order_always_zero_flag
        b.se()  # offset_for_non_ref_pic
        b.se()  # offset_for_top_to_bottom_field
        for _ in range(b.ue()):
            b.se()
    b.ue()  # max_num_ref_frames
    b.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw_mbs = b.ue() + 1
    ph_units = b.ue() + 1
    frame_mbs_only = b.u(1)
    if not frame_mbs_only:
        b.u(1)  # mb_adaptive_frame_field_flag
    b.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if b.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = b.ue(), b.ue(), b.ue(), b.ue()
    # crop units (§7.4.2.1.1): 4:2:0 → x2; monochrome/4:4:4 → x1
    cw = 2 if chroma_format_idc in (1, 2) else 1
    ch = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
    width = pw_mbs * 16 - (crop_l + crop_r) * cw
    height = (2 - frame_mbs_only) * ph_units * 16 - (crop_t + crop_b) * ch
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
    }


@dataclass
class Mp4Info:
    codec: str = ""
    timescale: int = 0
    duration: int = 0  # in media timescale units
    n_frames: int = 0
    sample_sizes: list[int] = field(default_factory=list)
    # stsz-derived byte stats, computed arithmetically for the uniform
    # case so a hostile 32-bit sample count never materializes a list
    size_total: int = 0
    size_min: int = 0
    size_max: int = 0
    width: int = 0  # VisualSampleEntry declared dims
    height: int = 0
    sps: dict | None = None  # parse_sps output when codec is AVC


def parse_mp4(data: bytes) -> Mp4Info:
    """Header-only probe of the first video track. Raises Mp4Error on
    anything that is not a sane ISO BMFF file with a video track."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise Mp4Error("no ftyp")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4Error("no moov")
    for t, tb, te in _iter_boxes(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        info = Mp4Info()
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is not None:
            mb, me = mdhd
            # v0 body is 24 bytes, v1 is 36; the version byte itself
            # needs one — a truncated box raises instead of IndexError
            if me - mb < 24:
                raise Mp4Error("truncated mdhd")
            version = data[mb]
            if version == 1 and me - mb < 36:
                raise Mp4Error("truncated mdhd v1")
            if version == 1:
                info.timescale = int.from_bytes(data[mb + 20 : mb + 24], "big")
                info.duration = int.from_bytes(data[mb + 24 : mb + 32], "big")
            else:
                info.timescale = int.from_bytes(data[mb + 12 : mb + 16], "big")
                info.duration = int.from_bytes(data[mb + 16 : mb + 20], "big")
        minf = _find(data, *mdia, b"minf")
        stbl = _find(data, *minf, b"stbl") if minf else None
        if stbl is None:
            raise Mp4Error("video trak without stbl")
        stsd = _find(data, *stbl, b"stsd")
        if stsd is not None:
            sb = stsd[0] + 8  # fullbox header + entry_count
            for t2, eb, ee in _iter_boxes(data, sb, stsd[1]):
                info.codec = t2.decode("latin-1")
                # VisualSampleEntry: 6 reserved + 2 dref index + 16
                # predefined/reserved, then width/height (14496-12 §12.1.3)
                info.width = int.from_bytes(data[eb + 24 : eb + 26], "big")
                info.height = int.from_bytes(data[eb + 26 : eb + 28], "big")
                if t2 in (b"avc1", b"avc3"):
                    avcc = _find(data, eb + 78, ee, b"avcC")
                    if avcc is not None:
                        ab, ae = avcc
                        if ae - ab < 8:
                            raise Mp4Error("truncated avcC")
                        n_sps = data[ab + 5] & 0x1F
                        if n_sps:
                            ln = int.from_bytes(data[ab + 6 : ab + 8], "big")
                            if ab + 8 + ln > ae:
                                raise Mp4Error("truncated avcC SPS")
                            info.sps = parse_sps(data[ab + 8 : ab + 8 + ln])
                break
        stsz = _find(data, *stbl, b"stsz")
        if stsz is not None:
            zb, ze = stsz
            if ze - zb < 12:
                raise Mp4Error("truncated stsz")
            uniform = int.from_bytes(data[zb + 4 : zb + 8], "big")
            count = int.from_bytes(data[zb + 8 : zb + 12], "big")
            info.n_frames = count
            if uniform:
                # never trust a declared 32-bit count with an allocation:
                # the uniform stats are pure arithmetic
                info.size_total = uniform * count
                info.size_min = info.size_max = uniform if count else 0
            else:
                # the entries table must actually fit in the box body
                if count > (ze - zb - 12) // 4:
                    raise Mp4Error("stsz count exceeds box body")
                info.sample_sizes = [
                    int.from_bytes(data[zb + 12 + 4 * i : zb + 16 + 4 * i], "big")
                    for i in range(count)
                ]
                info.size_total = sum(info.sample_sizes)
                info.size_min = min(info.sample_sizes, default=0)
                info.size_max = max(info.sample_sizes, default=0)
        if not info.n_frames:
            stts = _find(data, *stbl, b"stts")
            if stts is not None:
                sb2 = stts[0]
                n_ent = int.from_bytes(data[sb2 + 4 : sb2 + 8], "big")
                info.n_frames = sum(
                    int.from_bytes(data[sb2 + 8 + 8 * i : sb2 + 12 + 8 * i], "big")
                    for i in range(n_ent)
                )
        return info
    raise Mp4Error("no video track")
