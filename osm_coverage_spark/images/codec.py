"""Image codec for the graft payload.

Formats — both REAL pure-stdlib codecs, no PIL/libjpeg:
- ``png``  — spec-conformant PNG (images/png.py: zlib + per-row filter
  reconstruction, caption carried in an iTXt chunk).
- ``jpeg`` — baseline sequential JPEG (images/jpeg.py: DCT + uniform
  quantizer + Annex-K Huffman, RGB 4:4:4 via APP14 transform 0, caption
  in a COM segment). Uniform quantizer step 2 ⇒ per-coefficient error
  ≤ 1 ⇒ orthonormal-DCT block MSE ≤ 1 ⇒ PSNR ≥ 48 dB, above the 40 dB
  BASELINE.json gate.

Pixels themselves are synthesized deterministically from the image id, so
any executor can regenerate the ground-truth array without shipping it.
"""

from __future__ import annotations

import hashlib

import numpy as np


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 array derived from the id."""
    seed = int.from_bytes(hashlib.md5(image_id.encode()).digest()[:4], "big")
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + y * 13 + seed) % 256
    g = (x * 3 + y * 31 + seed // 7) % 256
    b = (x * 17 + y * 5 + seed // 13) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def encode(arr: np.ndarray, caption: str, fmt: str) -> bytes:
    if fmt == "jpeg":
        from . import jpeg as _jpeg

        # restart markers every 32 MCUs: real-world robustness structure
        # (independently decodable intervals), reconstruction-identical —
        # the block-class oracle is unaffected by entropy framing. Near-
        # constant interval SIZE (vs whole rows) keeps the restart streams
        # length-balanced, which the vectorized pool decoder's iteration
        # count (= longest stream's symbol count) is bound by.
        return _jpeg.encode_jpeg(arr, caption=caption, restart_mcus=32)
    if fmt == "png":
        from . import png as _png

        # filter 0 rows: both encode and decode stay numpy-vectorized in
        # the hot pipeline; the slow-but-exact Average/Paeth branches are
        # exercised by tests via filter_mode="cycle"
        return _png.encode_png(arr, filter_mode="none",
                               texts={"caption": caption})
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes) -> tuple[np.ndarray, str, str]:
    """→ (pixels, caption, fmt). Real PNG and real baseline JPEG."""
    from . import jpeg as _jpeg
    from . import png as _png

    if _png.is_png(data):
        arr = _png.decode_png(data)
        cap = _png.read_texts(data).get("caption", "")
        return arr, cap, "png"
    if _jpeg.is_jpeg(data):
        arr, cap = _jpeg.decode_jpeg(data)
        return arr, cap, "jpeg"
    raise ValueError("neither PNG nor JPEG payload")


def decode_batch(datas: list[bytes]) -> list[tuple[np.ndarray, str, str]]:
    """Batch decode, index-aligned with the input — the hot path for
    mapInPandas batches: all JPEGs in the batch share one vectorized
    entropy-decode pool (restart intervals across ALL images advance in
    lockstep, jpeg.decode_jpeg_batch), PNGs decode per-image (already
    numpy-vectorized per row)."""
    from . import jpeg as _jpeg
    from . import png as _png

    out: list = [None] * len(datas)
    jidx = []
    for i, d in enumerate(datas):
        if _png.is_png(d):
            arr = _png.decode_png(d)
            out[i] = (arr, _png.read_texts(d).get("caption", ""), "png")
        elif _jpeg.is_jpeg(d):
            jidx.append(i)
        else:
            raise ValueError("neither PNG nor JPEG payload")
    if jidx:
        decoded = _jpeg.decode_jpeg_batch([datas[i] for i in jidx])
        for i, (arr, cap) in zip(jidx, decoded):
            out[i] = (arr, cap, "jpeg")
    return out


def decode_real(data: bytes):
    """Real image decode. PNG and baseline JPEG are decoded by the
    pure-stdlib codecs in this package; any OTHER format (webp, tiff, …)
    needs PIL, absent in this sandbox."""
    from . import jpeg, png

    if png.is_png(data):
        return png.decode_png(data)
    if jpeg.is_jpeg(data):
        return jpeg.decode_jpeg(data)[0]
    try:  # pragma: no cover - environment-gated
        import io

        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real decode for formats beyond PNG/baseline-JPEG requires "
            "PIL, absent in this sandbox"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(data)))  # pragma: no cover


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
