"""Minimal pure-Python baseline JPEG codec (numpy + stdlib only).

Turns the multimodal operators' JPEG path real: PDF ``/DCTDecode`` images
and crawl JPEG payloads decode to arrays without PIL. Scope (deliberate):

* decode — baseline sequential DCT (SOF0/SOF1) and progressive DCT
  (SOF2: spectral selection + successive approximation, EOB runs,
  interleaved DC / non-interleaved AC scans), 8-bit, grayscale or YCbCr
  (any h×v chroma sampling), Huffman entropy coding, restart markers,
  0xFF00 byte unstuffing. Arithmetic coding, hierarchical (SOF5-7/13-15),
  12-bit and CMYK raise :class:`JpegError` — callers treat that as an
  unsupported payload.
* encode — baseline or progressive (libjpeg's default 10-scan script),
  4:4:4 / 4:2:0, Annex-K standard tables with libjpeg-style quality
  scaling; used for self-tests and deterministic fixtures. The
  progressive encoder exists so the decoder's scan machinery is testable
  without third-party codecs: progressive and baseline encodes of the
  same array at the same quality quantize to IDENTICAL coefficients, so
  decode(progressive) must equal decode(baseline) bit-for-bit.

Validated against the 18 real Adobe-produced grayscale JPEGs embedded in
the reference's ``amt_handbook_sample.pdf`` (dimensions + pixel-range
sanity) and by encode→decode PSNR round-trips.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["JpegError", "decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]


class JpegError(ValueError):
    pass


# zigzag order: index in scan order → position in the 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K default quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# Annex K standard Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _idct_basis() -> np.ndarray:
    u = np.arange(8)
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * u[:, None] * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m * 0.5  # includes the 1/2 normalization per dimension


_IDCT_M = _idct_basis()


def _idct2(block: np.ndarray) -> np.ndarray:
    return _IDCT_M.T @ block @ _IDCT_M


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _IDCT_M @ block @ _IDCT_M.T


class _HuffDecoder:
    """Canonical Huffman table: (code length, code) → symbol lookup."""

    def __init__(self, bits: list, values: list):
        self.lookup: dict[tuple, int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker: consumed by caller
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:  # real marker: pad with zeros
                    self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = ((self.bitbuf << 8) | byte) & 0xFFFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def align_restart(self) -> None:
        """Skip to just past the next RSTn marker, resetting bit state."""
        self.bitbuf = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes → uint8 (H, W) grayscale or (H, W, 3) RGB array.

    Every failure mode raises :class:`JpegError` — malformed segment
    structure from truncated/corrupt files (struct/index/value errors)
    must never escape as a different type, because callers use the
    exception type to classify payloads per-item."""
    try:
        return _decode_jpeg(data)
    except JpegError:
        raise
    except (struct.error, IndexError, ValueError, TypeError) as exc:
        raise JpegError(f"malformed JPEG: {type(exc).__name__}: {exc}") from exc


def _decode_jpeg(data: bytes) -> np.ndarray:
    if not data.startswith(b"\xff\xd8"):
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    coeff_store = None  # progressive: per-component zigzag coefficient arrays
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:
                    raise JpegError("16-bit quant tables unsupported")
                table = np.zeros(64, dtype=np.int32)
                table[ZIGZAG] = np.frombuffer(seg[p : p + 64], np.uint8)
                qt[tq] = table.reshape(8, 8)
                p += 64
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"{precision}-bit JPEG unsupported")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
            if marker == 0xC2:
                coeff_store = _alloc_coeff_store(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0xFF{marker:02X}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17 : p + 17 + nvals])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, values)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — start entropy-coded scan
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_comps = []  # (component id, DC table, AC table) in scan order
            for c in range(ns):
                cs, tdta = seg[1 + c * 2], seg[2 + c * 2]
                scan_comps.append((cs, tdta >> 4, tdta & 0xF))
            if frame["progressive"]:
                ss, se, ahal = seg[1 + ns * 2 : 4 + ns * 2]
                pos = _progressive_scan(
                    data, pos + 2 + seglen, frame, scan_comps, qt,
                    huff_dc, huff_ac, restart_interval, coeff_store,
                    ss, se, ahal >> 4, ahal & 0xF,
                )
                continue
            return _decode_scan(
                data, pos + 2 + seglen, frame, dict(
                    (cs, (td, ta)) for cs, td, ta in scan_comps
                ), qt, huff_dc, huff_ac, restart_interval,
            )
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and coeff_store is not None:
        return _finish_progressive(frame, coeff_store, qt)
    raise JpegError("no scan data found")


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac, dri):
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = []
    for c in comps:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.align_restart()
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_tables.get(c["id"], (0, 0))
                dct, act = huff_dc.get(td), huff_ac.get(ta)
                if dct is None or act is None:
                    raise JpegError("missing Huffman table")
                q = qt.get(c["tq"])
                if q is None:
                    raise JpegError("missing quant table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        size = reader.decode_symbol(dct)
                        diff = _extend(reader.read_bits(size), size) if size else 0
                        dc_pred[ci] += diff
                        coeffs[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run overflow")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs
                        spatial = _idct2(block.reshape(8, 8) * q) + 128.0
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = spatial
            mcu_count += 1

    return _assemble(planes, comps, w, h, hmax, vmax)


def _assemble(planes, comps, w, h, hmax, vmax) -> np.ndarray:
    """Per-component sample planes → upsampled/cropped gray or RGB array."""
    full = []
    for ci, c in enumerate(comps):
        plane = planes[ci]
        if vmax % c["v"] or hmax % c["h"]:
            raise JpegError(
                f"non-integer sampling ratio {c['h']}x{c['v']} vs max "
                f"{hmax}x{vmax} unsupported"
            )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(rgb.round(), 0, 255).astype(np.uint8)
    raise JpegError(f"{len(full)}-component JPEG unsupported")


# -- progressive decode (SOF2) ------------------------------------------------
#
# Coefficients accumulate across scans in zigzag order per component and
# are dequantized + IDCT'd once at EOI. Scan semantics follow ITU-T.81
# §G.2 with libjpeg's (jdphuff.c) interpretation of successive
# approximation: DC refinement ORs one bit at Al; AC refinement emits
# ±1<<Al for newly-nonzero coefficients and correction bits for history.


def _comp_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coeff_store(frame):
    hmax, vmax, mcus_x, mcus_y = _comp_geometry(frame)
    store = []
    for c in frame["comps"]:
        store.append(
            np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        )
    return store


def _progressive_scan(
    data, pos, frame, scan_comps, qt, huff_dc, huff_ac, dri,
    store, ss, se, ah, al,
):
    """Decode one SOS of a progressive frame into ``store``; returns the
    byte position where the entropy-coded data ended."""
    comps = frame["comps"]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}
    hmax, vmax, mcus_x, mcus_y = _comp_geometry(frame)
    if se > 63 or ss > se:
        raise JpegError(f"bad spectral band {ss}..{se}")
    reader = _BitReader(data, pos)
    frame["n_scans"] = frame.get("n_scans", 0) + 1

    if ss == 0:  # DC scan — may be interleaved
        if se != 0:
            raise JpegError("DC scan with Se != 0")
        members = []
        for cs, td, _ta in scan_comps:
            ci = by_id.get(cs)
            if ci is None:
                raise JpegError(f"scan references unknown component {cs}")
            members.append((ci, td))
        dc_pred = [0] * len(comps)
        # restart cadence: one unit = one MCU (interleaved) or one block
        # (single-component scan), T.81 §G.1.1
        if len(members) == 1:
            ci0, td0 = members[0]
            bx, by = _true_blocks(frame, ci0, hmax, vmax)
            units = (
                [(ci0, td0, y, x)] for y in range(by) for x in range(bx)
            )
        else:
            units = (
                [
                    (ci, td, my * comps[ci]["v"] + byy, mx * comps[ci]["h"] + bxx)
                    for ci, td in members
                    for byy in range(comps[ci]["v"])
                    for bxx in range(comps[ci]["h"])
                ]
                for my in range(mcus_y)
                for mx in range(mcus_x)
            )
        for ui, unit in enumerate(units):
            if dri and ui and ui % dri == 0:
                reader.align_restart()
                dc_pred = [0] * len(comps)
            for ci, td, y, x in unit:
                blk = store[ci][y, x]
                if ah == 0:
                    tbl = huff_dc.get(td)
                    if tbl is None:
                        raise JpegError("missing DC Huffman table")
                    size = reader.decode_symbol(tbl)
                    diff = _extend(reader.read_bits(size), size) if size else 0
                    dc_pred[ci] += diff
                    blk[0] = dc_pred[ci] << al
                else:
                    if reader.read_bit():
                        blk[0] |= 1 << al
        return reader.pos

    # AC scan — single component, non-interleaved (T.81 §G.1.1.1.1)
    if len(scan_comps) != 1:
        raise JpegError("interleaved AC scan in progressive JPEG")
    cs, _td, ta = scan_comps[0]
    ci = by_id.get(cs)
    if ci is None:
        raise JpegError(f"scan references unknown component {cs}")
    tbl = huff_ac.get(ta)
    if tbl is None:
        raise JpegError("missing AC Huffman table")
    bx, by = _true_blocks(frame, ci, hmax, vmax)
    eobrun = 0
    unit = 0
    for y in range(by):
        for x in range(bx):
            if dri and unit and unit % dri == 0:
                reader.align_restart()
                eobrun = 0
            blk = store[ci][y, x]
            if ah == 0:
                eobrun = _ac_first_block(reader, tbl, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(reader, tbl, blk, ss, se, al, eobrun)
            unit += 1
    return reader.pos


def _true_blocks(frame, ci, hmax, vmax):
    """Non-interleaved scans cover only the component's true block grid
    (ceil(scaled dimension / 8)), not the MCU-padded grid (T.81 A.2.2)."""
    c = frame["comps"][ci]
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _ac_first_block(reader, tbl, blk, ss, se, al, eobrun):
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_symbol(tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, tbl, blk, ss, se, al, eobrun):
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(tbl)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                s_val = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refinement symbol with s > 1")
                s_val = p1 if reader.read_bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s_val and k <= se:
                blk[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _finish_progressive(frame, store, qt):
    if not frame.get("n_scans"):
        raise JpegError("progressive JPEG with no scans")
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _comp_geometry(frame)
    planes = []
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("missing quant table")
        zz = store[ci].astype(np.float64)  # (by, bx, 64) zigzag order
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(zz.shape[0], zz.shape[1], 8, 8) * q[None, None]
        spatial = (
            np.einsum("ij,abjk,kl->abil", _IDCT_M.T, blocks, _IDCT_M) + 128.0
        )
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(
                zz.shape[0] * 8, zz.shape[1] * 8
            )
        )
    return _assemble(planes, comps, frame["w"], frame["h"], hmax, vmax)


# -- encoder (baseline 4:4:4, standard tables) -------------------------------


class _HuffEncoder:
    def __init__(self, bits: list, values: list):
        self.codes: dict[int, tuple] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1s


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.clip((base * s + 50) // 100, 1, 255)
    return q.astype(np.int32)


def _mag(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(writer, enc_dc, enc_ac, q, block, dc_pred, ci):
    coeffs = np.round(_fdct2(block - 128.0) / q).astype(np.int32)
    zz = coeffs.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - dc_pred[ci]
    dc_pred[ci] = int(zz[0])
    size = _mag(diff)
    code, length = enc_dc.codes[size]
    writer.write(code, length)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        writer.write(v, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = enc_ac.codes[0xF0]
            writer.write(code, length)
            run -= 16
        size = _mag(v)
        code, length = enc_ac.codes[(run << 4) | size]
        writer.write(code, length)
        vv = v if v > 0 else v + (1 << size) - 1
        writer.write(vv, size)
        run = 0
    if last_nz < 63:
        code, length = enc_ac.codes[0x00]
        writer.write(code, length)


def _encoder_setup(arr: np.ndarray, quality: int, subsampling: str):
    """Shared front half of both encoders: validation, color conversion,
    padding, subsampling, quant-table scaling. Baseline and progressive
    MUST share this so the same input quantizes to identical coefficients
    (the property the progressive round-trip tests rely on)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim not in (2, 3):
        raise JpegError("encode_jpeg needs uint8 (H,W) or (H,W,3)")
    gray = a.ndim == 2 or a.shape[2] == 1
    if not gray and a.shape[2] != 3:
        raise JpegError("only gray/RGB encode supported")
    if subsampling not in ("444", "420"):
        raise JpegError(f"unsupported subsampling {subsampling}")
    sub = 2 if (subsampling == "420" and not gray) else 1
    h, w = a.shape[:2]
    if gray:
        comps = [a.reshape(h, w).astype(np.float64)]
    else:
        rf, gf, bf = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        comps = [y, cb, cr]

    qts = [_scale_qt(_QT_LUMA.reshape(8, 8), quality)]
    if not gray:
        qts.append(_scale_qt(_QT_CHROMA.reshape(8, 8), quality))

    mcu = 8 * sub
    mh, mw = (h + mcu - 1) // mcu, (w + mcu - 1) // mcu

    def pad_to(plane, ph, pw):
        p = np.empty((ph, pw), dtype=np.float64)
        sh, sw = plane.shape
        p[:sh, :sw] = plane
        p[sh:, :sw] = plane[-1:, :]
        p[:, sw:] = p[:, sw - 1 : sw]
        return p

    padded = [pad_to(comps[0], mh * mcu, mw * mcu)]
    if not gray:
        for plane in comps[1:]:
            if sub == 2:  # 2x2 box average
                p = pad_to(plane, mh * mcu, mw * mcu)
                plane = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            else:
                plane = pad_to(plane, mh * mcu, mw * mcu)
            padded.append(plane)
    return gray, sub, h, w, qts, mh, mw, padded


def encode_jpeg(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB → baseline JPEG bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2 — the
    common web default; exercises the decoder's upsampling path)."""
    gray, sub, h, w, qts, mh, mw, padded = _encoder_setup(arr, quality, subsampling)
    ncomps = 1 if gray else 3

    enc_dc = [_HuffEncoder(*_HT_DC_LUMA), _HuffEncoder(*_HT_DC_CHROMA)]
    enc_ac = [_HuffEncoder(*_HT_AC_LUMA), _HuffEncoder(*_HT_AC_CHROMA)]

    writer = _BitWriter()
    dc_pred = [0] * ncomps
    for my in range(mh):
        for mx in range(mw):
            # Y blocks (sub×sub per MCU), then one Cb and one Cr
            for by in range(sub):
                for bx in range(sub):
                    py, px = (my * sub + by) * 8, (mx * sub + bx) * 8
                    _encode_block(
                        writer, enc_dc[0], enc_ac[0], qts[0],
                        padded[0][py : py + 8, px : px + 8], dc_pred, 0,
                    )
            for ci in (1, 2) if not gray else ():
                py, px = my * 8, mx * 8
                _encode_block(
                    writer, enc_dc[1], enc_ac[1], qts[1],
                    padded[ci][py : py + 8, px : px + 8], dc_pred, ci,
                )
    writer.flush()

    out = bytearray(b"\xff\xd8")
    out += _dqt_sof(qts, h, w, gray, sub, 0xC0)
    for ti in range(1 if gray else 2):
        for tc, tables in ((0, (_HT_DC_LUMA, _HT_DC_CHROMA)), (1, (_HT_AC_LUMA, _HT_AC_CHROMA))):
            bits, values = tables[ti]
            out += _seg(0xC4, bytes([(tc << 4) | ti]) + bytes(bits) + bytes(values))
    sos = bytes([ncomps])
    for c in range(ncomps):
        ti = 0 if c == 0 else 1
        sos += bytes([c + 1, (ti << 4) | ti])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt_sof(qts, h, w, gray, sub, sof_marker: int) -> bytes:
    out = bytearray()
    for i, q in enumerate(qts):
        zz = np.empty(64, dtype=np.uint8)
        zz[np.arange(64)] = q.reshape(-1)[ZIGZAG]
        out += _seg(0xDB, bytes([i]) + zz.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        hv = (sub << 4) | sub if c == 0 else 0x11
        sof += bytes([c + 1, hv, 0 if c == 0 else 1])
    out += _seg(sof_marker, sof)
    return bytes(out)


# -- progressive encoder ------------------------------------------------------
#
# Exists primarily so the progressive decoder is testable without any
# third-party codec: it reuses _encoder_setup (identical quantized
# coefficients as baseline) and re-arranges only the entropy layer into
# libjpeg's default 10-scan script (jcparam.c) with per-scan optimal
# Huffman tables (progressive needs EOBn symbols the Annex-K tables
# lack, which is also why libjpeg always optimizes tables in this mode).


def _build_huff_table(freq: dict[int, int]) -> tuple[list, list]:
    """Symbol→frequency → canonical (bits[1..16], values), libjpeg's
    jpeg_gen_optimal_table algorithm (code-length merge with the 256
    dummy symbol reserving the all-ones code, then 16-bit limiting)."""
    f = [0] * 257
    for sym, n in freq.items():
        f[sym] = n
    f[256] = 1  # dummy: guarantees the all-1s code is never assigned
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        if sum(1 for i in range(257) if f[i] > 0) <= 1:
            break
        # smallest frequency wins ties by HIGHEST symbol (libjpeg's scan
        # uses <= while walking upward, so the last tie wins)
        c1 = min(range(257), key=lambda i: (f[i] if f[i] > 0 else 1 << 60, -i))
        f1 = f[c1]
        f[c1] = 0
        c2 = min(range(257), key=lambda i: (f[i] if f[i] > 0 else 1 << 60, -i))
        f[c1] = f1
        f[c1] += f[c2]
        f[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    if not any(codesize[s] for s in range(256)):
        # no symbols in this scan (e.g. a DC refinement emits raw bits
        # only) — a trivial one-entry table keeps the DHT segment legal
        return [1] + [0] * 15, [0]
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    # limit code lengths to 16 (Annex K.3 adjustment)
    for i in range(32, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the dummy symbol's code (the longest, all-ones)
    values = sorted(
        (s for s in range(256) if codesize[s]),
        key=lambda s: (codesize[s], s),
    )
    return bits[1:17], values


class _TokenSink:
    """Per-scan token buffer: symbols, raw bit runs, restart markers.
    Collected first so symbol frequencies are known before the table is
    built, then replayed through a _BitWriter."""

    def __init__(self):
        self.tokens: list = []
        self.freq: dict[int, int] = {}

    def sym(self, s: int) -> None:
        self.tokens.append(("s", s))
        self.freq[s] = self.freq.get(s, 0) + 1

    def bits(self, v: int, n: int) -> None:
        if n:
            self.tokens.append(("b", v & ((1 << n) - 1), n))

    def rst(self, idx: int) -> None:
        self.tokens.append(("r", idx & 7))

    def render(self) -> tuple[bytes, list, list]:
        bits, values = _build_huff_table(self.freq)
        enc = _HuffEncoder(bits, values)
        w = _BitWriter()
        for t in self.tokens:
            if t[0] == "s":
                code, length = enc.codes[t[1]]
                w.write(code, length)
            elif t[0] == "b":
                w.write(t[1], t[2])
            else:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + t[1]])
        w.flush()
        return bytes(w.out), bits, values


def _appended(v: int, size: int) -> int:
    return v if v > 0 else v + (1 << size) - 1


class _AcFirstState:
    """EOB-run accumulator for AC first scans (jcphuff.c emit_eobrun)."""

    def __init__(self, sink: _TokenSink):
        self.sink = sink
        self.eobrun = 0

    def flush(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sink.sym(nbits << 4)
            self.sink.bits(self.eobrun, nbits)
            self.eobrun = 0

    def block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            v = -((-t) >> al) if t < 0 else t >> al  # magnitude shift
            if v == 0:
                r += 1
                continue
            self.flush()
            while r > 15:
                self.sink.sym(0xF0)
                r -= 16
            size = _mag(v)
            self.sink.sym((r << 4) | size)
            self.sink.bits(_appended(v, size), size)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush()


class _AcRefineState:
    """AC refinement emitter (jcphuff.c encode_mcu_AC_refine): correction
    bits buffer within a block (BR) and across EOB-run blocks (BE)."""

    def __init__(self, sink: _TokenSink):
        self.sink = sink
        self.eobrun = 0
        self.held: list[int] = []  # BE: bits carried with the pending EOB run

    def flush(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sink.sym(nbits << 4)
            self.sink.bits(self.eobrun, nbits)
            self.eobrun = 0
        for b in self.held:
            self.sink.bits(b, 1)
        self.held = []

    def block(self, zz: np.ndarray, ss: int, se: int, al: int) -> None:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = -1  # index (relative) of the last newly-significant coeff
        for i, t in enumerate(absv):
            if t == 1:
                eob = i
        r = 0
        br: list[int] = []  # BR: correction bits pending within this block
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                self.flush()
                self.sink.sym(0xF0)
                r -= 16
                for b in br:
                    self.sink.bits(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            self.flush()
            self.sink.sym((r << 4) | 1)
            self.sink.bits(1 if int(zz[ss + i]) > 0 else 0, 1)
            for b in br:
                self.sink.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.held.extend(br)
            if self.eobrun == 0x7FFF:
                self.flush()


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 gray/RGB array → progressive JPEG (SOF2) bytes using
    libjpeg's default scan script. ``restart_interval`` > 0 inserts RSTn
    markers every that many units in every scan (exercises the decoder's
    restart resync in both DC and AC scans)."""
    gray, sub, h, w, qts, mh, mw, padded = _encoder_setup(arr, quality, subsampling)
    ncomps = 1 if gray else 3
    comps = [
        {"h": sub if ci == 0 else 1, "v": sub if ci == 0 else 1, "tq": 0 if ci == 0 else 1}
        for ci in range(ncomps)
    ]

    # quantize every padded block with the exact per-block math of
    # _encode_block so coefficients match the baseline encoder bit-for-bit
    store = []
    for ci in range(ncomps):
        plane = padded[ci]
        q = qts[comps[ci]["tq"]]
        by, bx = plane.shape[0] // 8, plane.shape[1] // 8
        zz = np.zeros((by, bx, 64), dtype=np.int32)
        for y in range(by):
            for x in range(bx):
                block = plane[y * 8 : y * 8 + 8, x * 8 : x * 8 + 8]
                coeffs = np.round(_fdct2(block - 128.0) / q).astype(np.int32)
                zz[y, x] = coeffs.reshape(-1)[ZIGZAG]
        store.append(zz)

    def true_blocks(ci):
        c = comps[ci]
        cw = (w * c["h"] + sub - 1) // sub
        ch = (h * c["v"] + sub - 1) // sub
        return (cw + 7) // 8, (ch + 7) // 8

    # libjpeg default progressive scan script (jcparam.c)
    if gray:
        script = [
            ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
        ]

    out = bytearray(b"\xff\xd8")
    out += _dqt_sof(qts, h, w, gray, sub, 0xC2)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    for scan_cis, ss, se, ah, al in script:
        sink = _TokenSink()
        rst_idx = 0
        if ss == 0:  # DC scan
            dc_pred = [0] * ncomps
            if len(scan_cis) == 1:
                bx, by = true_blocks(scan_cis[0])
                units = ([(scan_cis[0], y, x)] for y in range(by) for x in range(bx))
            else:
                units = (
                    [
                        (ci, my * comps[ci]["v"] + byy, mx * comps[ci]["h"] + bxx)
                        for ci in scan_cis
                        for byy in range(comps[ci]["v"])
                        for bxx in range(comps[ci]["h"])
                    ]
                    for my in range(mh)
                    for mx in range(mw)
                )
            for ui, unit in enumerate(units):
                if restart_interval and ui and ui % restart_interval == 0:
                    sink.rst(rst_idx)
                    rst_idx += 1
                    dc_pred = [0] * ncomps
                for ci, y, x in unit:
                    if ah == 0:
                        v = int(store[ci][y, x, 0]) >> al
                        diff = v - dc_pred[ci]
                        dc_pred[ci] = v
                        size = _mag(diff)
                        sink.sym(size)
                        sink.bits(_appended(diff, size), size)
                    else:
                        sink.bits((int(store[ci][y, x, 0]) >> al) & 1, 1)
        else:  # AC scan, single component
            ci = scan_cis[0]
            bx, by = true_blocks(ci)
            state = _AcFirstState(sink) if ah == 0 else _AcRefineState(sink)
            unit = 0
            for y in range(by):
                for x in range(bx):
                    if restart_interval and unit and unit % restart_interval == 0:
                        state.flush()
                        sink.rst(rst_idx)
                        rst_idx += 1
                    state.block(store[ci][y, x], ss, se, al)
                    unit += 1
            state.flush()

        data, bits, values = sink.render()
        tc = 0 if ss == 0 else 1
        out += _seg(0xC4, bytes([(tc << 4) | 0]) + bytes(bits) + bytes(values))
        sos = bytes([len(scan_cis)])
        for ci in scan_cis:
            td_ta = 0  # table 0 for whichever class this scan uses
            sos += bytes([ci + 1, td_ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += data
    out += b"\xff\xd9"
    return bytes(out)
