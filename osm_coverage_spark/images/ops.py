"""Image pipeline operators: Arrow-batched mapInPandas over binary columns.

The encode→decode→verify loop runs distributed: every batch synthesizes its
ground-truth pixels from the image id (no driver-side arrays), encodes with
the REAL stdlib codecs (PNG/baseline-JPEG), decodes, and checks the
BASELINE.json per-row invariants — decoded-pixel match (integer PSNR≥40
gate for lossy) and caption equality — emitting integer-exact stats the
block-class DuckDB oracle (sources/image_oracle.py) reproduces. Work is
numpy-vectorized per image inside the batch loop — no row-at-a-time Python
at the Spark boundary (one Arrow batch in, one out).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codec


def with_encoded_bytes(images: DataFrame) -> DataFrame:
    """Materialize the `bytes` column of the input_hint schema: encode the
    deterministic pixels + caption per row (mapInPandas, Arrow batches).

    The metadata rows are repartitioned to the session's parallelism
    first: codec work is CPU-bound python, and the sandbox's derived
    input collapses to 1-2 scan tasks (single-row-group parquet) — a real
    lake's many splits make this a no-op-sized shuffle of narrow rows."""
    sc = images.sparkSession.sparkContext
    images = images.repartition(sc.defaultParallelism * 2)

    def encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for iid, w, h, fmt, cap in zip(
                pdf["image_id"], pdf["w"], pdf["h"], pdf["fmt"], pdf["caption"]
            ):
                arr = codec.synth_pixels(iid, int(w), int(h))
                blobs.append(codec.encode(arr, cap, fmt))
            out = pdf[["image_id", "w", "h", "fmt", "caption", "phash"]].copy()
            out["bytes"] = blobs
            yield out

    schema = (
        "image_id string, w int, h int, fmt string, caption string, "
        "phash bigint, bytes binary"
    )
    return images.mapInPandas(encode_batch, schema)


# ---------------------------------------------------------------------------
# Integer-exact verification / feature ops (oracle-paired: every emitted
# column is BIGINT/BOOLEAN/STRING computed with pure integer arithmetic from
# the decoded pixels, so the DuckDB block-class oracle
# (sources/image_oracle.py) matches hash-for-hash — no FP in the compared
# surface).
# ---------------------------------------------------------------------------

PSNR_SSE_SCALE = 10_000  # PSNR >= 40 dB  <=>  10000*sse <= 65025*3*w*h

INT_VERIFY_SCHEMA = (
    "image_id string, fmt string, pixels_ok boolean, caption_ok boolean, "
    "sse bigint, mean_px_e4 bigint, psnr_db double"
)


def decode_verify_int(images_with_bytes: DataFrame) -> DataFrame:
    """Decode every blob, verify against regenerated ground truth, and emit
    integer-exact stats: sse = Σ(dec−truth)², mean_px_e4 = ⌊10⁴·Σdec /
    (3wh)⌋. pixels_ok is exact equality for PNG and the integer form of the
    PSNR≥40 gate for JPEG; psnr_db rides along for pytest (not compared by
    the driver)."""

    def verify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            decoded = codec.decode_batch([bytes(d) for d in pdf["bytes"]])
            for iid, (arr, dec_cap, dec_fmt), w, h, fmt, cap in zip(
                pdf["image_id"], decoded, pdf["w"], pdf["h"], pdf["fmt"],
                pdf["caption"],
            ):
                truth = codec.synth_pixels(iid, int(w), int(h))
                d = arr.astype(np.int64)
                sse = int(((d - truth.astype(np.int64)) ** 2).sum())
                total = int(d.sum())
                npx = 3 * int(w) * int(h)
                ok = (
                    sse == 0
                    if dec_fmt == "png"
                    else PSNR_SSE_SCALE * sse <= 65025 * npx
                )
                rows.append(
                    (
                        iid,
                        dec_fmt,
                        bool(ok),
                        dec_cap == cap,
                        sse,
                        (PSNR_SSE_SCALE * total) // npx,
                        round(min(codec.psnr_db(truth, arr), 99.0), 2),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "pixels_ok", "caption_ok", "sse",
                         "mean_px_e4", "psnr_db"],
            )

    return images_with_bytes.mapInPandas(verify_batch, INT_VERIFY_SCHEMA)


def _ahash63(arr: np.ndarray) -> tuple[int, int]:
    """63-bit average-hash over an 8×8 super-block grid of the decoded
    image (dims must be block-aligned): bit(q,p) = 1 iff the super-block's
    per-pixel gray3 mean exceeds the global mean (integer cross-multiplied
    — no FP). Returns (ahash, gray3_total)."""
    h, w = arr.shape[:2]
    if h % 8 or w % 8:
        raise ValueError("ahash63 requires block-aligned dims")
    ny, nx = h // 8, w // 8
    g3 = arr.astype(np.int64).sum(axis=2)
    bs = g3.reshape(ny, 8, nx, 8).sum(axis=(1, 3))  # per-block gray3 sums
    p = (np.arange(nx) * 8) // nx
    q = (np.arange(ny) * 8) // ny
    ssum = np.zeros((8, 8), dtype=np.int64)
    bcount = np.zeros((8, 8), dtype=np.int64)
    np.add.at(ssum, (q[:, None], p[None, :]), bs)
    np.add.at(bcount, (q[:, None], p[None, :]), 1)
    total = int(bs.sum())
    bits = (ssum * nx * ny) > (total * bcount)
    value = 0
    for idx in range(63):  # idx = q*8 + p, top bit dropped to stay BIGINT+
        if bits[idx // 8, idx % 8]:
            value |= 1 << idx
    return value, total


FEATURE_INT_SCHEMA = "image_id string, ahash bigint, gray3_total bigint"


def extract_features_int(images_with_bytes: DataFrame) -> DataFrame:
    """Decode → integer aHash + total gray3 mass per image."""

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            decoded = codec.decode_batch([bytes(d) for d in pdf["bytes"]])
            for iid, (arr, _, _) in zip(pdf["image_id"], decoded):
                ah, total = _ahash63(arr)
                rows.append((iid, ah, total))
            yield pd.DataFrame(rows, columns=["image_id", "ahash", "gray3_total"])

    return images_with_bytes.mapInPandas(feat_batch, FEATURE_INT_SCHEMA)


def box_downsample(arr: np.ndarray, factor: int = 2) -> np.ndarray:
    """Integer 2×2 (or f×f) box-filter resize: each output pixel is
    ⌊mean of its f×f quad⌋. Dims must divide by f. uint8 in, uint8 out —
    the standard pyramid/thumbnail step, exact integer semantics."""
    h, w = arr.shape[:2]
    if h % factor or w % factor:
        raise ValueError("box_downsample requires dims divisible by factor")
    q = arr.astype(np.int64).reshape(
        h // factor, factor, w // factor, factor, -1
    ).sum(axis=(1, 3)) // (factor * factor)
    return q.astype(np.uint8)


RESIZE_INT_SCHEMA = (
    "image_id string, fmt string, out_w int, out_h int, "
    "ds_sum bigint, ds_mean_e4 bigint"
)


def resize_stats_int(images_with_bytes: DataFrame) -> DataFrame:
    """Decode → 2×2 box-downsample (real resized pixels) → integer stats
    per image: ds_sum = Σ downsampled pixels over all 3 channels,
    ds_mean_e4 = ⌊10⁴·ds_sum / (3·out_w·out_h)⌋. The downsampled array
    itself is materialized on the executor (the thumbnail a real pipeline
    would re-encode and sink); the emitted stats are the oracle surface."""

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            decoded = codec.decode_batch([bytes(d) for d in pdf["bytes"]])
            for iid, fmt, (arr, _, _) in zip(
                pdf["image_id"], pdf["fmt"], decoded
            ):
                small = box_downsample(arr)
                oh, ow = small.shape[:2]
                total = int(small.astype(np.int64).sum())
                rows.append(
                    (iid, fmt, ow, oh, total, 10_000 * total // (3 * ow * oh))
                )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "out_w", "out_h", "ds_sum",
                         "ds_mean_e4"],
            )

    return images_with_bytes.mapInPandas(resize_batch, RESIZE_INT_SCHEMA)


# ---------------------------------------------------------------------------
# MPNG frame container — a real multi-frame byte format: 'MPNG' magic,
# frame count, length-prefixed REAL PNG frames (block-aligned horizontal
# strips of the decoded image). Frame extraction parses the container
# structure and PNG-decodes every frame.
# ---------------------------------------------------------------------------

MAGIC_MPNG = b"MPNG"


def build_container(frames: list[np.ndarray]) -> bytes:
    from . import png as _png

    import struct

    blobs = [_png.encode_png(f, filter_mode="none") for f in frames]
    out = bytearray(MAGIC_MPNG)
    out += struct.pack("<I", len(blobs))
    for b in blobs:
        out += struct.pack("<I", len(b))
        out += b
    return bytes(out)


def parse_container(data: bytes) -> list[bytes]:
    import struct

    if data[:4] != MAGIC_MPNG:
        raise ValueError("not an MPNG container")
    (n,) = struct.unpack_from("<I", data, 4)
    off = 8
    frames = []
    for _ in range(n):
        (length,) = struct.unpack_from("<I", data, off)
        off += 4
        frames.append(data[off : off + length])
        off += length
    return frames


def make_video_container(
    images_with_bytes: DataFrame, n_frames: int = 3
) -> DataFrame:
    """Decode each image and pack ``n_frames`` block-aligned row strips as
    real PNG frames into an MPNG container column (the 'video' blob)."""

    def pack_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            decoded = codec.decode_batch([bytes(d) for d in pdf["bytes"]])
            for arr, _, _ in decoded:
                ny = arr.shape[0] // 8
                strips = [
                    arr[(k * ny // n_frames) * 8 : ((k + 1) * ny // n_frames) * 8]
                    for k in range(n_frames)
                ]
                blobs.append(build_container(strips))
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "video": blobs}
            )

    return images_with_bytes.mapInPandas(
        pack_batch, "image_id string, video binary"
    )


FRAME_INT_SCHEMA = (
    "image_id string, frame int, frame_h int, gray3_sum bigint, "
    "mean_px_e4 bigint"
)


def sample_container_frames(videos: DataFrame) -> DataFrame:
    """Parse MPNG containers, PNG-decode every frame, and emit integer
    per-frame stats (height, gray3 mass, scaled mean)."""

    def sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import png as _png

        for pdf in batches:
            rows = []
            for iid, blob in zip(pdf["image_id"], pdf["video"]):
                for k, fb in enumerate(parse_container(bytes(blob))):
                    arr = _png.decode_png(fb)
                    fh, fw = arr.shape[:2]
                    g3 = int(arr.astype(np.int64).sum())
                    rows.append(
                        (iid, k, fh, g3, (10_000 * g3) // (3 * fw * fh))
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "frame", "frame_h", "gray3_sum",
                         "mean_px_e4"],
            )

    return videos.mapInPandas(sample_batch, FRAME_INT_SCHEMA)


AUDIO_SCHEMA = (
    "clip_id string, container string, sample_rate int, channels int, "
    "n_samples int, rms double, peak double"
)


def _parse_wav(raw: bytes):
    """RIFF/WAVE PCM parse (pure stdlib `wave`): (int16 samples, rate,
    channels) or None when the bytes are not a WAV container. 8-bit PCM
    is widened to int16; compressed formats (mp3/flac) stay out of scope
    (no codec libs in this sandbox)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(raw)) as w:
            sw = w.getsampwidth()
            ch = w.getnchannels()
            sr = w.getframerate()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError):
        return None
    if sw == 2:
        pcm = np.frombuffer(frames[: len(frames) // 2 * 2], dtype="<i2")
    elif sw == 1:  # unsigned 8-bit → centered int16
        pcm = (np.frombuffer(frames, dtype="u1").astype(np.int16) - 128) * 256
    else:
        return None
    return pcm, sr, ch


def audio_features(clips: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Per-clip RMS/peak, numpy-vectorized per Arrow batch. RIFF/WAVE PCM
    containers are REALLY parsed (stdlib `wave` — header, sample width,
    rate, channels); anything else is treated as headerless 16-bit LE PCM
    (container='raw', rate/channels 0) — the documented fallback for this
    sandbox's synthetic blobs. Compressed codecs (mp3/flac) remain
    environment-gated exactly like non-PNG image decode."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, data in zip(pdf["clip_id"], pdf[bytes_col]):
                raw = bytes(data)
                parsed = _parse_wav(raw)
                if parsed is not None:
                    pcm, sr, ch = parsed
                    container = "wav"
                else:
                    pcm = np.frombuffer(raw[: len(raw) // 2 * 2], dtype="<i2")
                    sr = ch = 0
                    container = "raw"
                if len(pcm) == 0:
                    rows.append((cid, container, sr, ch, 0, 0.0, 0.0))
                    continue
                x = pcm.astype(np.float64) / 32768.0
                rows.append(
                    (
                        cid,
                        container,
                        int(sr),
                        int(ch),
                        int(len(pcm)),
                        round(float(np.sqrt(np.mean(x**2))), 6),
                        round(float(np.abs(x).max()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "container", "sample_rate", "channels",
                         "n_samples", "rms", "peak"],
            )

    return clips.mapInPandas(feat, AUDIO_SCHEMA)
