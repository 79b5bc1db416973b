"""Deterministic image codec for the graft payload.

PIL/libjpeg are not available in this container, so the codec is a
clearly-marked deterministic fake with real Spark-side plumbing (schema,
batching, UDF signatures) — exactly what BASELINE.json's input_hint allows
("STUB the decode step behind a deterministic fake"). Real decode slots in
behind ``decode_real`` once PIL exists.

Formats:
- ``png``  — lossless: header + raw uint8 pixels + caption payload.
- ``jpeg`` — lossy: pixels quantized to steps of 4 (max |err| = 2 per
  channel → MSE <= 4 → PSNR >= 10*log10(255^2/4) ≈ 42 dB > the 40 dB
  gate), caption lossless.

Pixels themselves are synthesized deterministically from the image id, so
any executor can regenerate the ground-truth array without shipping it.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC_PNG = b"FPNG"
MAGIC_JPG = b"FJPG"


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 array derived from the id."""
    seed = int.from_bytes(hashlib.md5(image_id.encode()).digest()[:4], "big")
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + y * 13 + seed) % 256
    g = (x * 3 + y * 31 + seed // 7) % 256
    b = (x * 17 + y * 5 + seed // 13) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def encode(arr: np.ndarray, caption: str, fmt: str) -> bytes:
    h, w = arr.shape[:2]
    if fmt == "jpeg":
        payload = ((arr.astype(np.int16) // 4) * 4 + 2).clip(0, 255).astype(np.uint8)
        magic = MAGIC_JPG
    elif fmt == "png":
        payload = arr
        magic = MAGIC_PNG
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    cap = caption.encode("utf-8")
    return (
        magic
        + struct.pack("<III", w, h, len(cap))
        + cap
        + payload.tobytes()
    )


def decode(data: bytes) -> tuple[np.ndarray, str, str]:
    """→ (pixels, caption, fmt). The deterministic-fake decoder."""
    magic, rest = data[:4], data[4:]
    if magic == MAGIC_PNG:
        fmt = "png"
    elif magic == MAGIC_JPG:
        fmt = "jpeg"
    else:
        raise ValueError("not a fake-codec payload")
    w, h, clen = struct.unpack("<III", rest[:12])
    cap = rest[12 : 12 + clen].decode("utf-8")
    arr = np.frombuffer(rest[12 + clen :], dtype=np.uint8).reshape(h, w, 3)
    return arr, cap, fmt


def decode_real(data: bytes):  # pragma: no cover - environment-gated
    """Real image decode — plugs in when PIL is installed."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL; this sandbox uses the "
            "deterministic fake codec (decode())"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(data)))


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = arr.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[yi][:, xi]


_DCT8 = np.array(
    [
        [np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
        for u in range(8)
    ]
)


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale → 32×32 nearest resize → 8×8 DCT
    low-frequency block → median threshold. Pure numpy."""
    gray = arr.astype(np.float64).mean(axis=-1)
    small = resize_nearest(gray[..., None], 32, 32)[..., 0]
    # 2-D DCT-II via separable matrix products on the top-left 8x8 of the
    # 32x32 (classic pHash takes DCT of 32x32 then the 8x8 corner; we DCT
    # 8x8 block means of the 32x32 — deterministic and discriminative).
    block = small.reshape(8, 4, 8, 4).mean(axis=(1, 3))
    coef = _DCT8 @ block @ _DCT8.T
    flat = coef.flatten()
    med = np.median(flat[1:])  # skip DC term
    bits = (flat > med).astype(np.uint64)
    value = np.uint64(0)
    for i, b in enumerate(bits):
        value |= np.uint64(b) << np.uint64(i)
    # keep inside signed int64 for Spark's BIGINT (63 informative bits)
    return int(value & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
