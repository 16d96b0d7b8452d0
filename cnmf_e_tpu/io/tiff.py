"""Minimal pure-numpy TIFF stack reader (no external deps).

Covers the formats the reference reads with ``smod_bigread2.m`` /
``get_data_dimension.m``: classic multi-page grayscale TIFF and ImageJ's
"fake-bigtiff" (one IFD + ``images=N`` in the ImageDescription, frames laid
out contiguously after the first strip). Supports uint8/16/32 and float32,
little- and big-endian, strip-based storage (the formats calcium-imaging
acquisition software writes).
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_DESCRIPTION = 270
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d",
             16: "Q", 17: "q"}


@dataclass
class TiffInfo:
    shape: Tuple[int, int, int]     # (T, H, W)
    dtype: np.dtype
    # per-frame (offset, nbytes) when every frame is contiguous
    frame_offsets: List[int]
    frame_nbytes: int
    byteorder: str                  # '<' or '>'
    imagej_contiguous: bool


def _read_ifd(f, offset, bo, big):
    """Read one IFD; returns (tags dict, next_ifd_offset)."""
    if big:
        n = struct.unpack(bo + "Q", f.read(8))[0] if f.seek(offset) or True \
            else 0
        entry_size, count_fmt = 20, "Q"
    else:
        f.seek(offset)
        n = struct.unpack(bo + "H", f.read(2))[0]
        entry_size, count_fmt = 12, "I"
    tags = {}
    for _ in range(n):
        data = f.read(entry_size)
        if big:
            tag, typ = struct.unpack(bo + "HH", data[:4])
            cnt = struct.unpack(bo + "Q", data[4:12])[0]
            val_bytes = data[12:20]
        else:
            tag, typ = struct.unpack(bo + "HH", data[:4])
            cnt = struct.unpack(bo + "I", data[4:8])[0]
            val_bytes = data[8:12]
        size = _TYPE_SIZE.get(typ, 1) * cnt
        inline_cap = 8 if big else 4
        if size <= inline_cap:
            raw = val_bytes[:size]
        else:
            ptr = struct.unpack(bo + ("Q" if big else "I"), val_bytes)[0]
            here = f.tell()
            f.seek(ptr)
            raw = f.read(size)
            f.seek(here)
        if typ in _TYPE_FMT:
            fmt = _TYPE_FMT[typ]
            vals = struct.unpack(bo + fmt * cnt, raw)
            tags[tag] = vals if cnt > 1 else (vals[0],)
        elif typ == 2:  # ascii
            tags[tag] = raw.split(b"\0")[0].decode("latin1")
    nxt = struct.unpack(bo + ("Q" if big else "I"),
                        f.read(8 if big else 4))[0]
    return tags, nxt


def probe_tiff(path: str) -> TiffInfo:
    """Parse headers only (cheap, like ``get_data_dimension.m:11-45``)."""
    with open(path, "rb") as f:
        hdr = f.read(8)
        bo = "<" if hdr[:2] == b"II" else ">"
        magic = struct.unpack(bo + "H", hdr[2:4])[0]
        big = magic == 43
        if big:
            f.seek(8)
            first_ifd = struct.unpack(bo + "Q", f.read(8))[0]
        else:
            first_ifd = struct.unpack(bo + "I", hdr[4:8])[0]

        tags, nxt = _read_ifd(f, first_ifd, bo, big)
        H = tags[_TAG_HEIGHT][0]
        W = tags[_TAG_WIDTH][0]
        bits = tags.get(_TAG_BITS, (8,))[0]
        fmt = tags.get(_TAG_SAMPLE_FORMAT, (1,))[0]
        if tags.get(_TAG_COMPRESSION, (1,))[0] != 1:
            raise ValueError("compressed TIFF not supported")
        kind = {1: "u", 2: "i", 3: "f"}[fmt]
        dtype = np.dtype(f"{bo}{kind}{bits // 8}")

        desc = tags.get(_TAG_DESCRIPTION, "")
        m = re.search(r"images=(\d+)", desc or "")
        offsets0 = tags[_TAG_STRIP_OFFSETS]
        frame_nbytes = H * W * (bits // 8)

        if m and nxt == 0:
            # ImageJ contiguous stack: frames follow the first strip
            T = int(m.group(1))
            base = offsets0[0]
            return TiffInfo((T, H, W), dtype,
                            [base + i * frame_nbytes for i in range(T)],
                            frame_nbytes, bo, True)

        # classic multi-IFD: walk the chain
        frame_offsets = [offsets0[0]]
        strip_ok = len(offsets0) == 1
        while nxt:
            tags_i, nxt = _read_ifd(f, nxt, bo, big)
            offs = tags_i[_TAG_STRIP_OFFSETS]
            strip_ok &= len(offs) == 1
            frame_offsets.append(offs[0])
        if not strip_ok:
            raise ValueError("multi-strip frames not supported")
        return TiffInfo((len(frame_offsets), H, W), dtype, frame_offsets,
                        frame_nbytes, bo, False)


def read_tiff(path: str, start: int = 0, count: Optional[int] = None
              ) -> np.ndarray:
    """Read ``count`` frames starting at ``start``. Returns (T, H, W)."""
    info = probe_tiff(path)
    T, H, W = info.shape
    if count is None:
        count = T - start
    count = min(count, T - start)
    out = np.empty((count, H, W), info.dtype)
    with open(path, "rb") as f:
        if info.imagej_contiguous:
            f.seek(info.frame_offsets[start])
            data = f.read(info.frame_nbytes * count)
            out[:] = np.frombuffer(data, info.dtype).reshape(count, H, W)
        else:
            for i in range(count):
                f.seek(info.frame_offsets[start + i])
                out[i] = np.frombuffer(f.read(info.frame_nbytes),
                                       info.dtype).reshape(H, W)
    return out


def write_tiff(path: str, movie: np.ndarray) -> None:
    """Write a (T, H, W) stack as a classic little-endian multi-IFD TIFF
    (reference: ``utilities/writeTiff.m``). Supports u8/u16/f32."""
    movie = np.ascontiguousarray(movie)
    T, H, W = movie.shape
    dt = movie.dtype
    if dt == np.float64:
        movie = movie.astype(np.float32)
        dt = movie.dtype
    bits = dt.itemsize * 8
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    frame_nbytes = H * W * dt.itemsize

    n_tags = 9
    ifd_size = 2 + n_tags * 12 + 4
    with open(path, "wb") as f:
        f.write(b"II*\x00")
        f.write(struct.pack("<I", 8))
        data_base = 8 + T * ifd_size

        def tag(t, typ, cnt, val):
            return struct.pack("<HHI4s", t, typ, cnt,
                               struct.pack("<I", val))

        for i in range(T):
            entries = [
                tag(_TAG_WIDTH, 4, 1, W),
                tag(_TAG_HEIGHT, 4, 1, H),
                tag(_TAG_BITS, 3, 1, bits),
                tag(_TAG_COMPRESSION, 3, 1, 1),
                tag(262, 3, 1, 1),  # photometric: BlackIsZero
                tag(_TAG_STRIP_OFFSETS, 4, 1, data_base + i * frame_nbytes),
                tag(_TAG_ROWS_PER_STRIP, 4, 1, H),
                tag(_TAG_STRIP_COUNTS, 4, 1, frame_nbytes),
                tag(_TAG_SAMPLE_FORMAT, 3, 1, fmt),
            ]
            nxt = 8 + (i + 1) * ifd_size if i + 1 < T else 0
            f.write(struct.pack("<H", n_tags) + b"".join(entries)
                    + struct.pack("<I", nxt))
        f.write(movie.astype(dt.newbyteorder("<")).tobytes())
