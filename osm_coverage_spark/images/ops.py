"""Image pipeline operators: Arrow-batched mapInPandas over binary columns.

The encode→decode→verify loop runs distributed: every batch synthesizes its
ground-truth pixels from the image id (no driver-side arrays), encodes with
the deterministic codec, decodes, and checks the BASELINE.json per-row
invariants — decoded-pixel allclose (PSNR >= 40 dB for lossy) and caption
equality. Feature extraction (mean-grid) and pHash are numpy-vectorized per
image inside the same batch loop — no row-at-a-time Python at the Spark
boundary (one Arrow batch in, one out).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codec

PSNR_GATE_DB = 40.0

VERIFY_SCHEMA = (
    "image_id string, fmt string, psnr_db double, pixels_ok boolean, "
    "caption_ok boolean, mean_px double"
)

FEATURE_SCHEMA = "image_id string, feature array<float>, phash bigint"


def with_encoded_bytes(images: DataFrame) -> DataFrame:
    """Materialize the `bytes` column of the input_hint schema: encode the
    deterministic pixels + caption per row (mapInPandas, Arrow batches)."""

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


def decode_verify(images_with_bytes: DataFrame) -> DataFrame:
    """Decode every blob and verify the per-row invariants against the
    regenerated ground truth. Returns one verification row per image."""

    def verify_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, w, h, fmt, cap in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"],
                pdf["caption"],
            ):
                arr, dec_cap, dec_fmt = codec.decode(bytes(data))
                truth = codec.synth_pixels(iid, int(w), int(h))
                p = codec.psnr_db(truth, arr)
                lossless_ok = dec_fmt == "png" and np.array_equal(arr, truth)
                lossy_ok = dec_fmt == "jpeg" and p >= PSNR_GATE_DB
                rows.append(
                    (
                        iid,
                        dec_fmt,
                        round(min(p, 99.0), 2),
                        bool(lossless_ok or lossy_ok),
                        dec_cap == cap,
                        round(float(arr.mean()), 4),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "fmt", "psnr_db", "pixels_ok", "caption_ok",
                    "mean_px",
                ],
            )

    return images_with_bytes.mapInPandas(verify_batch, VERIFY_SCHEMA)


def extract_features(images_with_bytes: DataFrame, grid: int = 4) -> DataFrame:
    """Decode → grayscale mean-grid feature vector + DCT pHash per image."""

    def feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr, _, _ = codec.decode(bytes(data))
                gray = arr.astype(np.float32).mean(axis=-1)
                small = codec.resize_nearest(gray[..., None], grid, grid)[..., 0]
                rows.append((iid, small.flatten().tolist(), codec.phash64(arr)))
            yield pd.DataFrame(rows, columns=["image_id", "feature", "phash"])

    return images_with_bytes.mapInPandas(feat_batch, FEATURE_SCHEMA)


def frame_sample(images_with_bytes: DataFrame, n_frames: int = 3) -> DataFrame:
    """Video-style frame sampling stub: treats the image as a 1-frame clip
    and emits row-strips as 'frames' — real frame decode is gated on a
    video lib (NotImplementedError via codec.decode_real path). The Spark
    plumbing (explode to frame rows with typed metadata) is real."""

    def sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr, _, _ = codec.decode(bytes(data))
                h = arr.shape[0]
                for k in range(n_frames):
                    strip = arr[k * h // n_frames : (k + 1) * h // n_frames]
                    rows.append((iid, k, round(float(strip.mean()), 4)))
            yield pd.DataFrame(rows, columns=["image_id", "frame", "mean_px"])

    return images_with_bytes.mapInPandas(
        sample_batch, "image_id string, frame int, mean_px double"
    )


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
