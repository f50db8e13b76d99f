"""Minimal MS-CFB (Compound File Binary / OLE2) reader + tiny writer.

HWP v5 documents are CFB containers (the reference shells out to
``hwp5html`` — pyhwp — to unpack them, doc_preprocessors/
attachment_processor.py:296-318; this module reads the container directly
so the extraction kernel needs no subprocess).

Reader scope: version 3 (512-byte sectors) and version 4 (4096), FAT +
mini-FAT streams, directory tree flattened by scan (names are unique
enough per HWP). Writer scope: just enough to synthesize spec-conformant
test fixtures — version 3, root + N streams, no mini-FAT (every stream is
padded to a full sector and stored in the regular FAT; readers, including
this one and real CFB implementations, accept regular-FAT streams of any
size because placement is governed by the stored start sector + size).
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD

_DIR_ENTRY = struct.Struct("<64sHBBIII16sIQQIII")


class CfbError(ValueError):
    pass


class CfbStream:
    def __init__(self, name: str, data: bytes):
        self.name = name
        self.data = data


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out = []
    sect = start
    while sect not in (ENDOFCHAIN, FREESECT) and len(out) <= limit:
        out.append(sect)
        if sect >= len(fat):
            raise CfbError(f"FAT chain runs off the table at sector {sect}")
        sect = fat[sect]
    return out


def read_cfb(data: bytes) -> dict[str, bytes]:
    """CFB bytes → {stream name (with '/'-joined storage path): bytes}."""
    if not data.startswith(MAGIC):
        raise CfbError("not a CFB container")
    (
        _minor, major, _order, sector_shift, mini_shift
    ) = struct.unpack_from("<HHHHH", data, 24)
    if major not in (3, 4):
        raise CfbError(f"unsupported CFB version {major}")
    ssz = 1 << sector_shift
    msz = 1 << mini_shift
    num_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    num_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    num_difat = struct.unpack_from("<I", data, 72)[0]

    def sector(n: int) -> bytes:
        off = 512 + n * ssz if major == 3 else (n + 1) * ssz
        return data[off : off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", data, 76))
    sect = difat_start
    for _ in range(num_difat):
        if sect in (ENDOFCHAIN, FREESECT):
            break
        raw = sector(sect)
        entries = struct.unpack(f"<{ssz // 4}I", raw)
        difat.extend(entries[:-1])
        sect = entries[-1]
    fat: list[int] = []
    for fs in difat[:num_fat]:
        if fs in (FREESECT, ENDOFCHAIN):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    limit = len(data) // ssz + 2

    # directory
    dir_raw = b"".join(sector(s) for s in _chain(fat, dir_start, limit))
    entries = []
    for off in range(0, len(dir_raw) - 127, 128):
        name_raw, name_len, otype, _color, _l, _r, child, _clsid, _state, _ct, _mt, start, size_lo, size_hi = _DIR_ENTRY.unpack_from(dir_raw, off)
        if otype == 0 or name_len < 2:
            continue
        name = name_raw[: name_len - 2].decode("utf-16-le", errors="replace")
        size = size_lo if major == 3 else (size_hi << 32) | size_lo
        entries.append((name, otype, start, size, child))

    # root entry holds the mini-stream
    root = next((e for e in entries if e[1] == 5), None)
    mini_stream = b""
    minifat: list[int] = []
    if root is not None and num_minifat:
        mini_stream = b"".join(sector(s) for s in _chain(fat, root[2], limit))
        mf_raw = b"".join(
            sector(s) for s in _chain(fat, minifat_start, limit)
        )
        minifat = list(struct.unpack(f"<{len(mf_raw) // 4}I", mf_raw))

    out: dict[str, bytes] = {}
    for name, otype, start, size, _child in entries:
        if otype != 2:  # only streams
            continue
        if size < mini_cutoff and minifat:
            chunks = []
            sect = start
            n = 0
            while sect not in (ENDOFCHAIN, FREESECT) and n <= limit:
                chunks.append(mini_stream[sect * msz : (sect + 1) * msz])
                sect = minifat[sect] if sect < len(minifat) else ENDOFCHAIN
                n += 1
            raw = b"".join(chunks)
        else:
            raw = b"".join(sector(s) for s in _chain(fat, start, limit))
        out[name] = raw[:size]
    return out


# -- writer (test fixtures only) ---------------------------------------------


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Build a small CFB v3 container holding the given streams.

    All streams go in the regular FAT (mini-cutoff forced to 0 so readers
    never consult a mini-FAT)."""
    ssz = 512
    payload_sectors: list[bytes] = []
    dir_entries: list[bytes] = []

    def pad(b: bytes) -> list[bytes]:
        sectors = []
        for i in range(0, max(len(b), 1), ssz):
            chunk = b[i : i + ssz]
            sectors.append(chunk + b"\x00" * (ssz - len(chunk)))
        return sectors

    # layout: [dir sectors][stream sectors][FAT sector(s)] — 4 entries per
    # 512-byte directory sector, so the directory size is known up front
    n_dir = (1 + len(streams) + 3) // 4
    stream_meta = []
    next_sect = n_dir
    for name, blob in streams.items():
        secs = pad(blob)
        stream_meta.append((name, next_sect, len(blob), len(secs)))
        payload_sectors.extend(secs)
        next_sect += len(secs)

    def dir_entry(name: str, otype: int, start: int, size: int, child: int = FREESECT) -> bytes:
        raw_name = name.encode("utf-16-le")[:62]
        return _DIR_ENTRY.pack(
            raw_name, len(raw_name) + 2, otype, 1,
            FREESECT, FREESECT, child, b"\x00" * 16, 0, 0, 0,
            start, size, 0,
        )

    dir_entries.append(dir_entry("Root Entry", 5, ENDOFCHAIN, 0, child=1))
    for name, start, size, _n in stream_meta:
        dir_entries.append(dir_entry(name, 2, start, size))
    while len(dir_entries) % 4:
        dir_entries.append(b"\x00" * 128)
    dir_sectors = pad(b"".join(dir_entries))
    assert len(dir_sectors) == n_dir

    total_payload = n_dir + sum(n for _, _, _, n in stream_meta)
    n_fat = (total_payload * 4) // (ssz - 4) + 1
    fat = []
    # directory chain
    for i in range(n_dir):
        fat.append(i + 1 if i + 1 < n_dir else ENDOFCHAIN)
    for _name, start, _size, n in stream_meta:
        for i in range(n):
            fat.append(start + i + 1 if i + 1 < n else ENDOFCHAIN)
    for i in range(n_fat):
        fat.append(FATSECT)
    while len(fat) % (ssz // 4):
        fat.append(FREESECT)
    fat_sectors = [
        struct.pack(f"<{ssz // 4}I", *fat[i : i + ssz // 4])
        for i in range(0, len(fat), ssz // 4)
    ]
    fat_start = total_payload

    if n_fat > 109:
        # chained DIFAT sectors are out of scope for a fixture writer
        raise CfbError(
            f"write_cfb supports at most 109 FAT sectors (~7 MB); got {n_fat}"
        )
    difat = [fat_start + i for i in range(n_fat)] + [FREESECT] * (109 - n_fat)
    header = (
        MAGIC
        + b"\x00" * 16  # clsid
        + struct.pack("<HHHHH", 0x3E, 3, 0xFFFE, 9, 6)
        + b"\x00" * 6
        + struct.pack("<I", 0)  # num dir sectors (v3: 0)
        + struct.pack("<I", n_fat)
        + struct.pack("<I", 0)  # dir start = sector 0
        + struct.pack("<I", 0)  # transaction
        + struct.pack("<I", 0)  # mini cutoff 0 → nothing uses mini-FAT
        + struct.pack("<I", ENDOFCHAIN)  # minifat start
        + struct.pack("<I", 0)  # num minifat
        + struct.pack("<I", ENDOFCHAIN)  # difat start
        + struct.pack("<I", 0)  # num difat sectors
        + struct.pack("<109I", *difat)
    )
    assert len(header) == 512
    return header + b"".join(dir_sectors + payload_sectors + fat_sectors)
