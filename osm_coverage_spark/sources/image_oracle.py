"""Closed-form DuckDB oracles for the image-codec queries.

Why this is possible: the graft pixels are `synth_pixels` lattices —
channel ch of pixel (x, y) is ``(a·x + b·y + c) mod 256`` with per-channel
constants (a, b) ∈ {(7,13), (3,31), (17,5)} and a per-image offset c
derived from md5(image_id). Restricted to the 8×8 JPEG block at (bx, by),
the channel content is ``(a·i + b·j + K) mod 256`` with a SINGLE scalar
offset ``K = (8a·bx + 8b·by + c) mod 256`` — so every block any image can
ever contain is one of 256 canonical blocks per channel. The baseline-JPEG
codec (images/jpeg.py) processes components independently (RGB via APP14,
4:4:4) and its entropy stage is lossless, so the decoded block — and hence
its pixel sum and its squared error against the truth block — is a pure
function of (fmt, channel, K).

This module precomputes those 2·3·256 = 1536 (blocksum, sse) values with
the very same transform functions the executors run (`fdct_quant` /
`dequant_idct`; PNG is the identity), embeds them as a VALUES lookup
table, and lets DuckDB aggregate per image over the block grid with pure
integer arithmetic. Every compared column is BIGINT/BOOLEAN — zero
floating point in the oracle surface.

Requires the images table to have block-aligned dims (sources/derived.py
8-aligns w and h).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from . import derived

# per-channel lattice multipliers, mirroring images/codec.synth_pixels
CHANNELS = ((7, 13), (3, 31), (17, 5))


def _block_dsum(blocks: np.ndarray) -> np.ndarray:
    """Per-block sum of the 2×2 box downsample ⌊(p00+p01+p10+p11)/4⌋ —
    the integer the resize op emits. blocks: (n, 8, 8) int64."""
    q = (
        blocks.reshape(-1, 4, 2, 4, 2).sum(axis=(2, 4)) // 4
    )  # (n, 4, 4) downsampled pixels
    return q.sum(axis=(1, 2))


@lru_cache(maxsize=1)
def class_rows() -> tuple:
    """((fmt, ch, k, blocksum, sse, dsum), ...) for fmt ∈ {png, jpeg},
    ch < 3, k < 256 — computed with the codec's own transform stages.
    ``dsum`` is the block's 2×2-box-downsample pixel sum (resize op);
    a 2×2 quad never straddles an 8×8 block, so it is class-pure too."""
    from ..images import jpeg

    jj, ii = np.mgrid[0:8, 0:8]  # rows j, cols i
    rows = []
    for ch, (a, b) in enumerate(CHANNELS):
        base = (a * ii + b * jj) % 256  # (8, 8)
        stack = (base[None, :, :] + np.arange(256)[:, None, None]) % 256
        truth = stack.astype(np.int64)
        tds = _block_dsum(truth)
        # png: identity decode
        for k in range(256):
            rows.append(("png", ch, k, int(truth[k].sum()), 0, int(tds[k])))
        # jpeg: real transform round-trip (entropy stage is lossless, so
        # this equals full encode->decode; tests/test_jpeg.py asserts it)
        dec = jpeg.dequant_idct(
            jpeg.fdct_quant(stack.astype(np.uint8))
        ).astype(np.int64)
        err = ((dec - truth) ** 2).sum(axis=(1, 2))
        bsum = dec.sum(axis=(1, 2))
        dds = _block_dsum(dec)
        for k in range(256):
            rows.append(("jpeg", ch, k, int(bsum[k]), int(err[k]), int(dds[k])))
    return tuple(rows)


def _cls_cte() -> str:
    vals = ", ".join(
        f"('{f}',{c},{k},{b},{s},{d})" for f, c, k, b, s, d in class_rows()
    )
    return f"cls(fmt, ch, k, bsum, sse, dsum) AS (VALUES {vals})"


def _imgs_cte() -> str:
    seed = derived.hexn_to_bigint("md5(image_id)", 8, "duckdb")
    return f"""imgs AS (
  SELECT image_id, fmt, w, h, w // 8 AS nx, h // 8 AS ny,
         seed % 256 AS c0, (seed // 7) % 256 AS c1, (seed // 13) % 256 AS c2
  FROM (SELECT image_id, fmt, w, h, {seed} AS seed FROM images)
)"""


# blocks: cross-product image × block grid (two stacked unnest(range())
# stages — DuckDB 1.0 has no lateral range), then the three channel-class
# lookups joined against the 1536-row table.
_BLOCK_CTES = """bxs AS (
  SELECT image_id, fmt, w, h, nx, ny, c0, c1, c2,
         unnest(range(0, nx)) AS bx
  FROM imgs
),
blocks AS (
  SELECT image_id, fmt, w, h, nx, ny, c0, c1, c2, bx,
         unnest(range(0, ny)) AS by
  FROM bxs
),
vals AS (
  SELECT b.image_id, b.fmt, b.w, b.h, b.nx, b.ny, b.bx, b.by,
         r.bsum + g.bsum + u.bsum AS bsum3,
         r.sse + g.sse + u.sse AS sse3,
         r.dsum + g.dsum + u.dsum AS dsum3
  FROM blocks b
  JOIN cls r ON r.fmt = b.fmt AND r.ch = 0
            AND r.k = (56 * b.bx + 104 * b.by + b.c0) % 256
  JOIN cls g ON g.fmt = b.fmt AND g.ch = 1
            AND g.k = (24 * b.bx + 248 * b.by + b.c1) % 256
  JOIN cls u ON u.fmt = b.fmt AND u.ch = 2
            AND u.k = (136 * b.bx + 40 * b.by + b.c2) % 256
)"""


def _prelude() -> str:
    return (
        derived.duckdb_with(derived.images_cte("duckdb"), _cls_cte(),
                            _imgs_cte())
        + ",\n"
        + _BLOCK_CTES
    )


def decode_verify_sql() -> str:
    return f"""{_prelude()}
SELECT image_id, fmt,
       CASE WHEN fmt = 'png' THEN sse = 0
            ELSE 10000 * sse <= 65025 * 3 * CAST(w AS BIGINT) * h
       END AS pixels_ok,
       true AS caption_ok,
       sse, mean_px_e4
FROM (
  SELECT image_id, fmt, w, h,
         CAST(sum(sse3) AS BIGINT) AS sse,
         (10000 * CAST(sum(bsum3) AS BIGINT)) // (3 * w * h) AS mean_px_e4
  FROM vals GROUP BY image_id, fmt, w, h
)"""


def features_sql() -> str:
    return f"""{_prelude()},
super AS (
  SELECT image_id, nx, ny, (bx * 8) // nx AS p, (by * 8) // ny AS q,
         CAST(sum(bsum3) AS BIGINT) AS ssum,
         CAST(count(*) AS BIGINT) AS bcount
  FROM vals GROUP BY 1, 2, 3, 4, 5
),
tot AS (
  SELECT image_id, CAST(sum(ssum) AS BIGINT) AS total FROM super GROUP BY 1
)
SELECT s.image_id,
       CAST(sum(CASE WHEN s.q * 8 + s.p < 63
                      AND s.ssum * s.nx * s.ny > t.total * s.bcount
                     THEN CAST(1 AS BIGINT) << (s.q * 8 + s.p)
                     ELSE 0 END) AS BIGINT) AS ahash,
       any_value(t.total) AS gray3_total
FROM super s JOIN tot t USING (image_id)
GROUP BY s.image_id"""


def resize_sql() -> str:
    """2×2 box-downsample (resize) stats: per-class dsum aggregated over
    the block grid — same closed form as decode_verify, new column."""
    return f"""{_prelude()}
SELECT image_id, fmt,
       CAST(w // 2 AS INT) AS out_w, CAST(h // 2 AS INT) AS out_h,
       CAST(sum(dsum3) AS BIGINT) AS ds_sum,
       (10000 * CAST(sum(dsum3) AS BIGINT)) // (3 * (w // 2) * (h // 2))
         AS ds_mean_e4
FROM vals GROUP BY image_id, fmt, w, h"""


def frame_sample_sql(n_frames: int = 3) -> str:
    return f"""{_prelude()},
fb AS (
  SELECT image_id, w, ny,
         unnest(range(0, {n_frames})) AS frame
  FROM imgs
),
bounds AS (
  SELECT image_id, w, frame,
         (frame * ny) // {n_frames} AS lo,
         ((frame + 1) * ny) // {n_frames} AS hi
  FROM fb
)
SELECT b.image_id, CAST(b.frame AS INT) AS frame,
       CAST(8 * (b.hi - b.lo) AS INT) AS frame_h,
       CAST(sum(v.bsum3) AS BIGINT) AS gray3_sum,
       (10000 * CAST(sum(v.bsum3) AS BIGINT))
         // (3 * b.w * 8 * (b.hi - b.lo)) AS mean_px_e4
FROM bounds b
JOIN vals v ON v.image_id = b.image_id AND v.by >= b.lo AND v.by < b.hi
GROUP BY b.image_id, b.frame, b.w, b.hi, b.lo"""
