"""Minimal WMF (Windows Metafile) rasterizer — pure numpy.

HWPX BinData frequently embeds pictures as WMF (the reference converts
them with ImageMagick via Wand, ``docling/backend/xml/hwpx_backend.py:
1173-1197``; with Wand absent it silently drops them). Neither
ImageMagick nor PIL ships in this environment, so this module walks the
public MS-WMF record format directly and rasterizes the small subset
real embedded metafiles use:

* placeable header (Aldus key ``0x9AC6CDD7``) or SETWINDOWORG/EXT for
  the logical->pixel mapping
* CREATEPENINDIRECT / CREATEBRUSHINDIRECT / SELECTOBJECT /
  DELETEOBJECT object table
* RECTANGLE, ELLIPSE, POLYGON (even-odd scanline fill), POLYLINE,
  MOVETO/LINETO, SETPIXEL
* STRETCHDIB / DIBSTRETCHBLT — the overwhelmingly common case: a WMF
  that is just a wrapper around one embedded DIB (decoded here too:
  BI_RGB 1/4/8/24/32-bit, bottom-up or top-down, palette)

Unknown records are skipped by their declared size; anything
structurally broken raises ``WmfError`` so callers drop the picture the
way the reference drops un-convertible WMF.
"""

from __future__ import annotations

import struct

import numpy as np

PLACEABLE_KEY = 0x9AC6CDD7
MAX_DIM = 2048  # rasterization cap (px per side)
_WHITE = (255, 255, 255)
_BLACK = (0, 0, 0)


class WmfError(ValueError):
    pass


def is_wmf(data: bytes) -> bool:
    if len(data) >= 4 and struct.unpack("<I", data[:4])[0] == PLACEABLE_KEY:
        return True
    if len(data) >= 18:
        ftype, hsize, ver = struct.unpack("<HHH", data[:6])
        return ftype in (1, 2) and hsize == 9 and ver in (0x0100, 0x0300)
    return False


# -- DIB (device-independent bitmap) -------------------------------------------


def decode_dib(data: bytes) -> np.ndarray:
    """BITMAPINFO (header + palette + pixels) → (h, w, 3) uint8 RGB."""
    if len(data) < 40:
        raise WmfError("DIB header truncated")
    (
        hsize, w, h, _planes, bpp, comp, _img_size, _xppm, _yppm,
        clr_used, _clr_imp,
    ) = struct.unpack("<IiihhIIiiII", data[:40])
    if hsize < 40 or len(data) < hsize:
        raise WmfError(f"unsupported DIB header size {hsize}")
    if comp != 0:  # BI_RGB only (no RLE)
        raise WmfError(f"unsupported DIB compression {comp}")
    top_down = h < 0
    h = abs(h)
    if not (0 < w <= 1 << 15 and 0 < h <= 1 << 15):
        raise WmfError(f"bad DIB dims {w}x{h}")
    if w * h > 64_000_000:
        raise WmfError("DIB too large")
    if bpp not in (1, 4, 8, 24, 32):
        raise WmfError(f"unsupported DIB bpp {bpp}")
    pos = hsize
    palette = None
    if bpp <= 8:
        n_colors = clr_used or (1 << bpp)
        pal_raw = data[pos : pos + 4 * n_colors]
        if len(pal_raw) < 4 * n_colors:
            raise WmfError("DIB palette truncated")
        pal = np.frombuffer(pal_raw, dtype=np.uint8).reshape(-1, 4)
        palette = pal[:, [2, 1, 0]]  # BGRA -> RGB
        pos += 4 * n_colors
    stride = ((w * bpp + 31) // 32) * 4
    pix = data[pos : pos + stride * h]
    if len(pix) < stride * h:
        raise WmfError("DIB pixel data truncated")
    rows = np.frombuffer(pix, dtype=np.uint8).reshape(h, stride)
    if bpp == 24:
        rgb = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 32:
        rgb = rows[:, : w * 4].reshape(h, w, 4)[:, :, [2, 1, 0]]
    elif bpp == 8:
        rgb = palette[rows[:, :w]]
    elif bpp == 4:
        nib = np.zeros((h, stride * 2), dtype=np.uint8)
        nib[:, 0::2] = rows >> 4
        nib[:, 1::2] = rows & 0x0F
        rgb = palette[nib[:, :w]]
    else:  # 1-bit
        bits = np.unpackbits(rows, axis=1)
        rgb = palette[bits[:, :w]]
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP file (14-byte file header + DIB) → (h, w, 3) uint8 RGB."""
    if len(data) < 14 or data[:2] != b"BM":
        raise WmfError("not a BMP file")
    return decode_dib(data[14:])


# -- drawing primitives ---------------------------------------------------------


def _fill_polygon(canvas: np.ndarray, xs, ys, color) -> None:
    """Even-odd scanline fill (integer pixel centers)."""
    h, w = canvas.shape[:2]
    n = len(xs)
    if n < 3:
        return
    y0 = max(0, int(np.floor(min(ys))))
    y1 = min(h - 1, int(np.ceil(max(ys))))
    for y in range(y0, y1 + 1):
        yc = y + 0.5
        nodes = []
        j = n - 1
        for i in range(n):
            yi, yj = ys[i], ys[j]
            if (yi <= yc < yj) or (yj <= yc < yi):
                nodes.append(
                    xs[i] + (yc - yi) / (yj - yi) * (xs[j] - xs[i])
                )
            j = i
        nodes.sort()
        for k in range(0, len(nodes) - 1, 2):
            a = max(0, int(np.ceil(nodes[k] - 0.5)))
            b = min(w - 1, int(np.floor(nodes[k + 1] - 0.5)))
            if b >= a:
                canvas[y, a : b + 1] = color


def _draw_line(canvas: np.ndarray, x0, y0, x1, y1, color) -> None:
    h, w = canvas.shape[:2]
    steps = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.linspace(x0, x1, steps).round().astype(int)
    ys = np.linspace(y0, y1, steps).round().astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[ok], xs[ok]] = color


def _colorref(lo: int, hi: int) -> tuple[int, int, int]:
    val = (hi << 16) | lo
    return (val & 0xFF, (val >> 8) & 0xFF, (val >> 16) & 0xFF)


# -- record walk ----------------------------------------------------------------


def decode_wmf(data: bytes) -> np.ndarray:
    """WMF bytes → (h, w, 3) uint8 RGB canvas (white background)."""
    pos = 0
    bbox = None  # (left, top, right, bottom) logical units
    inch = 1440
    if len(data) >= 22 and struct.unpack("<I", data[:4])[0] == PLACEABLE_KEY:
        _key, _hwmf, left, top, right, bottom, inch = struct.unpack(
            "<IHhhhhH", data[:16]
        )
        if right > left and bottom > top and inch > 0:
            bbox = (left, top, right, bottom)
        pos = 22
    if len(data) < pos + 18:
        raise WmfError("WMF header truncated")
    ftype, hsize, _ver = struct.unpack("<HHH", data[pos : pos + 6])
    if ftype not in (1, 2) or hsize != 9:
        raise WmfError("not a WMF header")
    pos += 18

    # first pass: find window org/ext for the coordinate system
    org = (0, 0)
    ext = None
    scan = pos
    while scan + 6 <= len(data):
        size_w, func = struct.unpack("<IH", data[scan : scan + 6])
        if size_w < 3 or func == 0:
            break
        params = data[scan + 6 : scan + 2 * size_w]
        if func == 0x020B and len(params) >= 4:  # SETWINDOWORG (y, x)
            y, x = struct.unpack("<hh", params[:4])
            org = (x, y)
        elif func == 0x020C and len(params) >= 4:  # SETWINDOWEXT (h, w)
            eh, ew = struct.unpack("<hh", params[:4])
            ext = (abs(ew) or 1, abs(eh) or 1)
        scan += 2 * size_w

    if bbox is not None:
        lw = bbox[2] - bbox[0]
        lh = bbox[3] - bbox[1]
        org = (bbox[0], bbox[1])
        px_w = lw * 96.0 / inch
        px_h = lh * 96.0 / inch
    elif ext is not None:
        lw, lh = ext
        px_w, px_h = float(lw), float(lh)
    else:
        raise WmfError("no drawable extent (no placeable bbox or window ext)")
    scale = min(1.0, MAX_DIM / max(px_w, px_h, 1.0))
    W = max(1, int(round(px_w * scale)))
    H = max(1, int(round(px_h * scale)))
    sx = W / lw
    sy = H / lh

    def X(v: float) -> float:
        return (v - org[0]) * sx

    def Y(v: float) -> float:
        return (v - org[1]) * sy

    canvas = np.full((H, W, 3), 255, dtype=np.uint8)
    objects: list = []  # WMF object table: lowest free slot on create
    pen: tuple | None = _BLACK  # (color) — None = PS_NULL
    brush: tuple | None = None  # None = hollow
    cur = (0.0, 0.0)

    def alloc(obj) -> None:
        for i, slot in enumerate(objects):
            if slot is None:
                objects[i] = obj
                return
        objects.append(obj)

    while pos + 6 <= len(data):
        size_w, func = struct.unpack("<IH", data[pos : pos + 6])
        if size_w < 3:
            raise WmfError(f"bad record size {size_w}")
        params = data[pos + 6 : pos + 2 * size_w]
        pos += 2 * size_w
        if func == 0x0000:  # META_EOF
            break
        # every handler reads a bounded word prefix except POLYGON/POLYLINE
        # (whose point list IS the record); a multi-MB DIB blit must not be
        # unpacked into two full Python int tuples first
        n_words = len(params) // 2
        int_words = n_words if func in (0x0324, 0x0325) else min(n_words, 16)
        ints = struct.unpack(f"<{int_words}h", params[: 2 * int_words])
        u_words = min(n_words, 16)
        uints = struct.unpack(f"<{u_words}H", params[: 2 * u_words])
        if func == 0x02FA and len(uints) >= 5:  # CREATEPENINDIRECT
            style = uints[0]
            color = _colorref(uints[3], uints[4])
            alloc(("pen", None if style == 5 else color))
        elif func == 0x02FC and len(uints) >= 3:  # CREATEBRUSHINDIRECT
            style = uints[0]
            color = _colorref(uints[1], uints[2])
            alloc(("brush", None if style == 1 else color))
        elif func in (
            0x00F7,  # CREATEPALETTE
            0x01F9,  # CREATEPATTERNBRUSH (legacy)
            0x02FB,  # CREATEFONTINDIRECT
            0x0142,  # DIBCREATEPATTERNBRUSH
            0x06FF,  # CREATEREGION
        ):
            alloc(("other", None))
        elif func == 0x012D and uints:  # SELECTOBJECT
            idx = uints[0]
            if idx < len(objects) and objects[idx] is not None:
                kind, val = objects[idx]
                if kind == "pen":
                    pen = val
                elif kind == "brush":
                    brush = val
        elif func == 0x01F0 and uints:  # DELETEOBJECT
            idx = uints[0]
            if idx < len(objects):
                objects[idx] = None
        elif func == 0x0214 and len(ints) >= 2:  # MOVETO (y, x)
            cur = (float(ints[1]), float(ints[0]))
        elif func == 0x0213 and len(ints) >= 2:  # LINETO (y, x)
            nxt = (float(ints[1]), float(ints[0]))
            if pen is not None:
                _draw_line(
                    canvas, X(cur[0]), Y(cur[1]), X(nxt[0]), Y(nxt[1]), pen
                )
            cur = nxt
        elif func == 0x041B and len(ints) >= 4:  # RECTANGLE (b, r, t, l)
            b, r, t, l = ints[:4]
            xs = [X(l), X(r), X(r), X(l)]
            ys = [Y(t), Y(t), Y(b), Y(b)]
            if brush is not None:
                _fill_polygon(canvas, xs, ys, brush)
            if pen is not None:
                for i in range(4):
                    j = (i + 1) % 4
                    _draw_line(canvas, xs[i], ys[i], xs[j], ys[j], pen)
        elif func == 0x0418 and len(ints) >= 4:  # ELLIPSE (b, r, t, l)
            b, r, t, l = ints[:4]
            cx, cy = (X(l) + X(r)) / 2, (Y(t) + Y(b)) / 2
            rx, ry = abs(X(r) - X(l)) / 2, abs(Y(b) - Y(t)) / 2
            if rx >= 0.5 and ry >= 0.5:
                yy, xx = np.mgrid[0:H, 0:W]
                mask = ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
                if brush is not None:
                    canvas[mask] = brush
                elif pen is not None:
                    edge = ((xx - cx) / rx) ** 2 + (
                        (yy - cy) / ry
                    ) ** 2 >= (1 - 2.0 / max(rx, ry)) ** 2
                    canvas[mask & edge] = pen
        elif func in (0x0324, 0x0325) and ints:  # POLYGON / POLYLINE
            n = ints[0]
            pts = ints[1 : 1 + 2 * n]
            if len(pts) == 2 * n and n >= 2:
                xs = [X(pts[2 * i]) for i in range(n)]
                ys = [Y(pts[2 * i + 1]) for i in range(n)]
                if func == 0x0324 and brush is not None:
                    _fill_polygon(canvas, xs, ys, brush)
                if pen is not None:
                    closed = func == 0x0324
                    for i in range(n - 1 + (1 if closed else 0)):
                        j = (i + 1) % n
                        _draw_line(
                            canvas, xs[i], ys[i], xs[j], ys[j], pen
                        )
        elif func == 0x041F and len(ints) >= 4:  # SETPIXEL (c2, c1, y, x)
            x, y = int(round(X(ints[3]))), int(round(Y(ints[2])))
            if 0 <= x < W and 0 <= y < H:
                canvas[y, x] = _colorref(uints[0], uints[1])
        elif func in (0x0F43, 0x0B41):  # STRETCHDIB / DIBSTRETCHBLT
            # rasterOp(2w) [+ colorUsage(1w) for STRETCHDIB], then
            # srcH srcW srcY srcX dstH dstW dstY dstX, then the DIB
            head = 3 if func == 0x0F43 else 2
            if len(ints) >= head + 8:
                dib_off = 2 * (head + 8)
                s_h, s_w, _sy, _sx, d_h, d_w, d_y, d_x = ints[
                    head : head + 8
                ]
                try:
                    img = decode_dib(params[dib_off:])
                except WmfError:
                    continue
                x0, y0 = int(round(X(d_x))), int(round(Y(d_y)))
                x1 = int(round(X(d_x + d_w)))
                y1 = int(round(Y(d_y + d_h)))
                if x1 <= x0 or y1 <= y0:
                    continue
                tw, th = min(x1, W) - max(x0, 0), min(y1, H) - max(y0, 0)
                if tw <= 0 or th <= 0:
                    continue
                ih, iw = img.shape[:2]
                ridx = np.clip(
                    ((np.arange(max(y0, 0), max(y0, 0) + th) - y0)
                     * ih // max(y1 - y0, 1)),
                    0, ih - 1,
                )
                cidx = np.clip(
                    ((np.arange(max(x0, 0), max(x0, 0) + tw) - x0)
                     * iw // max(x1 - x0, 1)),
                    0, iw - 1,
                )
                canvas[
                    max(y0, 0) : max(y0, 0) + th,
                    max(x0, 0) : max(x0, 0) + tw,
                ] = img[ridx[:, None], cidx[None, :]]
        # all other records (text, clipping, modes) skipped by size
    return canvas


def wmf_to_png(data: bytes) -> bytes | None:
    """WMF bytes → PNG bytes via the native codec; None if undecodable
    (caller drops the picture, matching the reference's Wand-failure
    path)."""
    from .png import encode_png

    try:
        return encode_png(decode_wmf(data))
    except Exception:
        return None
