"""Real PNG codec — pure stdlib (zlib + struct), no PIL.

Implements the public PNG specification (RFC 2083 / W3C PNG): chunk
framing with CRC-32, IHDR, concatenated IDAT zlib streams, and full
per-row filter reconstruction (None / Sub / Up / Average / Paeth) for
8-bit greyscale (color type 0), RGB (2) and RGBA (6), non-interlaced.
Adam7 interlacing and sub-byte depths raise a named error instead of
silently mis-decoding.

This replaces the deterministic fake for PNG in ``codec.decode_real``:
the PSNR invariant of ``image_decode_verify`` now runs against actually
encoded bytes. The encoder half exists so tests can synthesize files
that exercise EVERY filter type (rows cycle 0→4).

Row maths: Up/None are vectorized with numpy; Sub is a per-channel
byte cumsum (mod 256); Average/Paeth carry a left dependency and run as
per-row byte loops — correctness-first; at lake scale the decode sits
inside ``mapInPandas`` so the cost is per-image, not per-row-roundtrip.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_mode: str = "cycle",
               texts: dict[str, str] | None = None) -> bytes:
    """Spec-conformant PNG bytes from (h, w), (h, w, 3) or (h, w, 4) uint8.

    ``filter_mode``: "none" writes filter 0 rows; "cycle" cycles filter
    types 0,1,2,3,4 by row index so a decoder roundtrip exercises every
    reconstruction branch. ``texts`` become iTXt chunks (UTF-8 metadata —
    the caption carrier for the image+caption table)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    raw = arr.reshape(h, w * ch).astype(np.int16)
    out = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        row = raw[y]
        ft = 0 if filter_mode == "none" else y % 5
        left = np.zeros_like(row)
        left[ch:] = row[:-ch]
        upleft = np.zeros_like(prev)
        upleft[ch:] = prev[:-ch]
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            filt = row - pred
        out.append(ft)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    itxt = b"".join(
        _chunk(
            b"iTXt",
            k.encode("latin-1") + b"\x00\x00\x00\x00\x00" + v.encode("utf-8"),
        )
        for k, v in (texts or {}).items()
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + itxt
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def read_texts(data: bytes) -> dict[str, str]:
    """iTXt metadata chunks → {keyword: text} (uncompressed iTXt only)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, out = 8, {}
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"iTXt":
            kw, rest = body.split(b"\x00", 1)
            comp_flag = rest[0]
            # skip comp flag+method, language tag, translated keyword
            _, _, text = rest[2:].split(b"\x00", 2)
            if comp_flag:
                text = zlib.decompress(text)
            out[kw.decode("latin-1")] = text.decode("utf-8")
        elif tag == b"IEND":
            break
    return out


def is_png(data: bytes) -> bool:
    return data[:8] == _SIG


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 (greyscale keeps a 1-channel
    last axis dropped to (h, w))."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    ctype = depth = interlace = None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype} (0/2/6 only)")
    if interlace:
        raise ValueError("Adam7-interlaced PNG not supported")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: per-channel cumulative sum mod 256
            rec = row.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average — left dependency: sequential per byte
            rec = row.copy()
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (row[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:  # Paeth — left dependency: sequential per byte
            rec = row.copy()
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    arr = out.reshape(h, w, ch)
    return arr[..., 0] if ch == 1 else arr
