"""Real PNG codec (images/png.py): spec conformance, every filter type,
iTXt caption carriage, corruption detection, unsupported-feature errors.
Closes VERDICT r2 'make image_decode_verify real for PNG' — the PSNR/
equality invariant runs against actually-encoded PNG bytes."""

import struct
import zlib

import numpy as np
import pytest

from osm_coverage_spark.images import codec, png


def _rand(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_roundtrip_exact_all_filters(ch, mode):
    # h >= 6 so "cycle" exercises None/Sub/Up/Average/Paeth at least once
    arr = _rand(11, 7, ch, seed=ch * 100 + len(mode))
    out = png.decode_png(png.encode_png(arr, filter_mode=mode))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def test_itxt_caption_roundtrip_utf8():
    arr = _rand(4, 4, 3, seed=1)
    data = png.encode_png(arr, texts={"caption": "Füße im Grünen — 緑"})
    assert png.read_texts(data) == {"caption": "Füße im Grünen — 緑"}


def test_crc_corruption_detected():
    data = bytearray(png.encode_png(_rand(5, 5, 3, seed=2)))
    idat = data.index(b"IDAT")
    data[idat + 6] ^= 0xFF  # flip a pixel byte, leave the CRC stale
    with pytest.raises(ValueError, match="CRC"):
        png.decode_png(bytes(data))


def test_unsupported_features_named_errors():
    arr = _rand(4, 4, 3, seed=3)
    data = bytearray(png.encode_png(arr))
    # set interlace byte in IHDR (offset: 8 sig + 8 chunk hdr + 12) + fix CRC
    ihdr_body = bytearray(data[16:29])
    ihdr_body[12] = 1
    crc = zlib.crc32(b"IHDR" + bytes(ihdr_body)) & 0xFFFFFFFF
    data[16:29] = ihdr_body
    data[29:33] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="Adam7"):
        png.decode_png(bytes(data))
    with pytest.raises(ValueError, match="signature"):
        png.decode_png(b"not a png at all")


def test_codec_png_is_real_png_with_psnr_invariant():
    arr = codec.synth_pixels("real_png", 80, 60)
    data = codec.encode(arr, "echtes Bild", "png")
    assert png.is_png(data)  # actual PNG container, not the fake magic
    dec, cap, fmt = codec.decode(data)
    assert fmt == "png" and cap == "echtes Bild"
    assert np.array_equal(dec, arr)
    assert codec.psnr_db(arr, dec) == float("inf")  # lossless >= 40 dB gate
