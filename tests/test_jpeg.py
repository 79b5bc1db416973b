"""Baseline-JPEG codec (images/jpeg.py): spec structure, losslessness of
the entropy stage, PSNR bound, caption COM round-trip, block-class oracle
consistency."""

import numpy as np
import pytest

from osm_coverage_spark.images import codec, jpeg


def _transform_roundtrip(arr):
    h, w = arr.shape[:2]
    ph, pw = -h % 8, -w % 8
    padded = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge")
    fh, fw = padded.shape[:2]
    return np.stack(
        [
            jpeg._from_blocks(
                jpeg.dequant_idct(jpeg.fdct_quant(jpeg._to_blocks(padded[..., c]))),
                fh, fw,
            )
            for c in range(3)
        ],
        axis=-1,
    )[:h, :w]


@pytest.mark.parametrize("h,w", [(64, 64), (40, 56), (37, 61), (8, 8)])
def test_entropy_stage_is_lossless(h, w):
    """decode(encode(x)) must equal the bare transform round-trip — the
    Huffman/bitstream stage adds NO error (the block-class oracle in
    sources/image_oracle.py depends on exactly this)."""
    arr = codec.synth_pixels(f"jt_{h}x{w}", w, h)
    dec, cap = jpeg.decode_jpeg(jpeg.encode_jpeg(arr, caption="käse-ππ"))
    assert np.array_equal(dec, _transform_roundtrip(arr))
    assert cap == "käse-ππ"


def test_psnr_bound_and_marker_structure():
    arr = codec.synth_pixels("jt_psnr", 96, 72)
    data = jpeg.encode_jpeg(arr, caption="c")
    # marker skeleton: SOI .. DQT, SOF0, 2×DHT, SOS .. EOI
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda",
                   b"\xff\xee"):
        assert marker in data
    dec, _ = jpeg.decode_jpeg(data)
    # quantizer step 2 => coefficient error <= 1 => block MSE <= 1 => >=48dB
    assert codec.psnr_db(arr, dec) >= 48.0


def test_random_content_roundtrip():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(24, 32, 3), dtype=np.uint8)
    dec, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
    assert np.array_equal(dec, _transform_roundtrip(arr))
    assert codec.psnr_db(arr, dec) >= 40.0


def test_class_table_matches_full_pipeline():
    """The oracle's per-(fmt, ch, K) blocksum/sse values must equal what
    the FULL distributed pipeline computes for a real image — this pins
    the closed-form DuckDB oracle to the executor code path."""
    from osm_coverage_spark.sources.image_oracle import CHANNELS, class_rows

    cls = {(f, c, k): (b, s) for f, c, k, b, s, _d in class_rows()}
    for iid, w, h, fmt in [("img_7", 48, 40, "jpeg"), ("img_8", 32, 24, "png")]:
        truth = codec.synth_pixels(iid, w, h)
        dec, _, dfmt = codec.decode(codec.encode(truth, "cap", fmt))
        assert dfmt == fmt
        seed = int.from_bytes(
            __import__("hashlib").md5(iid.encode()).digest()[:4], "big"
        )
        offs = (seed % 256, (seed // 7) % 256, (seed // 13) % 256)
        mults = ((56, 104), (24, 248), (136, 40))  # 8*(a, b) per channel
        exp_sum = exp_sse = 0
        for by in range(h // 8):
            for bx in range(w // 8):
                for ch in range(3):
                    k = (mults[ch][0] * bx + mults[ch][1] * by + offs[ch]) % 256
                    b, s = cls[(fmt, ch, k)]
                    exp_sum += b
                    exp_sse += s
        d = dec.astype(np.int64)
        assert int(d.sum()) == exp_sum
        assert int(((d - truth.astype(np.int64)) ** 2).sum()) == exp_sse


def test_mpng_container_roundtrip():
    from osm_coverage_spark.images import ops

    arr = codec.synth_pixels("v1", 32, 48)
    frames = [arr[0:16], arr[16:32], arr[32:48]]
    blob = ops.build_container(frames)
    out = ops.parse_container(blob)
    assert len(out) == 3
    from osm_coverage_spark.images import png

    for orig, fb in zip(frames, out):
        assert np.array_equal(png.decode_png(fb), orig)


def test_restart_markers_roundtrip():
    """DRI/RSTn support (spec B.2.4.4): restart intervals byte-align the
    stream, reset DC prediction, and decode to exactly the same pixels as
    the marker-free stream — each interval is independently decodable."""
    arr = codec.synth_pixels("jt_rst", 88, 64)  # 11x8 blocks
    plain = jpeg.encode_jpeg(arr, caption="r")
    rst = jpeg.encode_jpeg(arr, caption="r", restart_rows=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    dec_p, _ = jpeg.decode_jpeg(plain)
    dec_r, cap = jpeg.decode_jpeg(rst)
    assert cap == "r"
    assert np.array_equal(dec_p, dec_r)
    assert codec.psnr_db(arr, dec_r) >= 48.0


def test_restart_marker_sequence_numbers_wrap():
    # enough intervals (>8) to exercise the RST0..RST7 modulo cycle
    arr = codec.synth_pixels("jt_rst2", 16, 96)  # 12 MCU rows, 2 MCUs each
    rst = jpeg.encode_jpeg(arr, restart_rows=1)  # 11 markers -> wraps
    dec, _ = jpeg.decode_jpeg(rst)
    plain_dec, _ = jpeg.decode_jpeg(jpeg.encode_jpeg(arr))
    assert np.array_equal(dec, plain_dec)


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    caption=st.text(max_size=24),
    restart=st.sampled_from([None, 1, 3]),
)
def test_jpeg_roundtrip_property(w, h, seed, caption, restart):
    """Any content, any dims (incl. < 8), any unicode caption, with or
    without restart markers: decode(encode(x)) equals the bare transform
    round-trip and the caption survives byte-exactly."""
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = jpeg.encode_jpeg(arr, caption=caption, restart_rows=restart)
    dec, cap = jpeg.decode_jpeg(data)
    assert dec.shape == arr.shape
    assert np.array_equal(dec, _transform_roundtrip(arr))
    assert cap == (caption if caption else "")


def test_qstep_below_two_rejected():
    """qstep=1 coefficients can need magnitude size 11, which the Annex-K
    AC table cannot code — encode must refuse, not emit an undecodable
    stream (r4 ADVICE)."""
    import numpy as np
    import pytest

    from osm_coverage_spark.images import jpeg

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="qstep"):
        jpeg.encode_jpeg(arr, qstep=1)
