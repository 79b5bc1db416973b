"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Real DCT-based lossy codec — no PIL/libjpeg: FFD8 marker stream, DQT,
SOF0 (baseline sequential), DHT canonical Huffman (spec Annex K tables),
interleaved 4:4:4 scan with byte stuffing, COM segment carrying the
caption, APP14 "Adobe" transform=0 declaring RGB component storage
(components are coded independently — no YCbCr matrix — which is the
documented Adobe-RGB variant of baseline JPEG and keeps every channel's
rate-distortion behavior independent of the others).

Encode path: level shift → per-block FDCT (orthonormal 8×8 matrix pair,
vectorized numpy matmul over the whole block stack) → uniform quantizer →
zigzag → DC-predictive / AC run-length Huffman coding (pure-python bit
writer, the only per-coefficient loop). Decode path mirrors it: marker
parse → Huffman decode via a 16-bit peek table → dequant → batched IDCT →
round/clip. The transform stages are factored (`fdct_quant`,
`dequant_idct`) so any single block round-trips through exactly the same
float operations as a full image — the oracle class tables in
sources/image_oracle.py depend on that.

Entropy coding is lossless, so decode(encode(x)) == dequant_idct(
fdct_quant(x)) exactly; tests/test_jpeg.py asserts this. With the default
uniform quantizer step 2, per-coefficient error ≤ 1 ⇒ (orthonormal DCT)
block MSE ≤ 1 ⇒ PSNR ≥ 48.1 dB — comfortably above BASELINE.json's
40 dB gate.

Reference parity: the reference pipeline delegates image handling to
external codec libraries; this module replaces that dependency with an
in-repo implementation (SURVEY.md §2.8 image decode row).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — public standard tables)
# ---------------------------------------------------------------------------

# K.3.1: typical Huffman table for luminance DC coefficient differences.
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

# K.3.2: typical Huffman table for luminance AC coefficients.
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)

DEFAULT_QUANT = 2  # uniform quantizer step — PSNR >= 48 dB on any input
_ENC_CHUNK_INTERVALS = 16  # restart intervals per entropy-coder call


def _zigzag_order() -> list[int]:
    """Flat (row*8+col) indices in JPEG zigzag scan order (spec fig. 5)."""
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left → top-right
        out.extend(r * 8 + c for r, c in diag)
    return out


ZZ = np.array(_zigzag_order(), dtype=np.int64)        # zigzag k -> natural
ZZ_INV = np.argsort(ZZ)                               # natural -> zigzag k

# Orthonormal DCT-II matrix: A @ A.T == I; JPEG FDCT == A @ block @ A.T.
_A = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


# ---------------------------------------------------------------------------
# Transform stages (shared verbatim by the oracle class-table builder)
# ---------------------------------------------------------------------------

def fdct_quant(blocks: np.ndarray, qstep: int = DEFAULT_QUANT) -> np.ndarray:
    """(n, 8, 8) uint8 sample blocks → (n, 8, 8) int32 quantized coefs."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = _A @ shifted @ _A.T
    return np.round(coef / float(qstep)).astype(np.int32)


def dequant_idct(qc: np.ndarray, qstep: int = DEFAULT_QUANT) -> np.ndarray:
    """(n, 8, 8) int32 quantized coefs → (n, 8, 8) uint8 reconstruction."""
    coef = qc.astype(np.float64) * float(qstep)
    pix = _A.T @ coef @ _A + 128.0
    return np.clip(np.round(pix), 0.0, 255.0).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (ny*nx, 8, 8) in raster (by, bx) order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).swapaxes(1, 2).reshape(h, w)
    )


# ---------------------------------------------------------------------------
# Canonical Huffman construction (spec C.2) + fast peek-16 decode tables
# ---------------------------------------------------------------------------

def _canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from BITS/HUFFVAL per spec Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DECODE_CACHE: dict[tuple, list] = {}


def _decode_table(bits, vals) -> list:
    """65536-entry peek table: top-16-bits → (symbol, code length)."""
    key = (tuple(bits), tuple(vals))
    tab = _DECODE_CACHE.get(key)
    if tab is None:
        tab = [None] * 65536
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            base = code << (16 - length)
            entry = (sym, length)
            for off in range(1 << (16 - length)):
                tab[base + off] = entry
        _DECODE_CACHE[key] = tab
    return tab


# magnitude-category lookup (spec F.1.2.1): size(v) = bit_length(|v|)
_SIZE_LUT = np.zeros(4097, dtype=np.int64)
for _i in range(1, 4097):
    _SIZE_LUT[_i] = int(_i).bit_length()


_CODE_LUT_CACHE: dict[tuple, tuple] = {}


def _code_luts(bits, vals, n: int) -> tuple[np.ndarray, np.ndarray]:
    """symbol-indexed (code, length) arrays for vectorized emission.
    Cached: the per-restart-interval encode loop calls this per segment
    (~43x per 296-px image), and a rebuild costs more than the lookup.
    A single-pass segmented encoder was tried and REJECTED: one
    whole-image emission table falls out of cache and measured 2.2 s vs
    1.0 s for the per-interval loop on 20 296-px images — the small
    per-call arrays are cache-hot."""
    key = (tuple(bits), tuple(vals), n)
    ent = _CODE_LUT_CACHE.get(key)
    if ent is None:
        codes = np.zeros(n, dtype=np.uint32)
        lens = np.zeros(n, dtype=np.int64)
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            codes[sym] = code
            lens[sym] = length
        _CODE_LUT_CACHE[key] = ent = (codes, lens)
    return ent


def _pack_bits(values: np.ndarray, lengths: np.ndarray) -> bytes:
    """Single-segment convenience wrapper around `_pack_bits_segments`."""
    return _pack_bits_segments(
        values, lengths, np.zeros(len(values), dtype=np.int64)
    )[0]


def _pack_bits_segments(
    values: np.ndarray, lengths: np.ndarray, seg: np.ndarray
) -> list[bytes]:
    """MSB-first varying-width bitfield packing, vectorized word-wise and
    segment-aware: every field (≤ 63 bits) is left-aligned into the
    big-endian uint64 word(s) its bit range covers and OR-scattered with
    ``np.bitwise_or.at`` (duplicate word hits combine correctly because
    fields never overlap bitwise). ``seg`` is each field's non-decreasing
    restart-segment id; every segment is padded to a byte boundary with
    1-bits (spec F.1.2.3) and byte-stuffed independently, so the returned
    list elements are exactly the per-interval entropy streams. Replaces
    a ≤16-pass per-bit scatter — measured 8× on the interval shape."""
    keep = lengths > 0
    values = values[keep].astype(np.uint64)
    seg = seg[keep].astype(np.int64)
    lengths = lengths[keep].astype(np.int64)
    if not len(lengths):
        return [b""]
    nseg = int(seg[-1]) + 1
    counts = np.bincount(seg, minlength=nseg)
    bits_per_seg = np.bincount(seg, weights=lengths, minlength=nseg).astype(
        np.int64
    )
    padded = ((bits_per_seg + 7) >> 3) << 3
    seg_start = np.cumsum(padded) - padded  # byte-aligned segment origins
    raw_before = np.cumsum(bits_per_seg) - bits_per_seg
    within = np.cumsum(lengths) - lengths - np.repeat(raw_before, counts)
    starts = np.repeat(seg_start, counts) + within  # global bit offsets
    total = int(seg_start[-1] + padded[-1])
    w0 = (starts >> 6).astype(np.int64)
    off = (starts & 63).astype(np.uint64)
    lu = lengths.astype(np.uint64)
    end = off + lu  # bit position past the field within its first word
    spill = end > 64
    # all shift counts kept < 64 on BOTH branches (>=64 is UB in numpy):
    # non-spill rows left-align (value << (64-end)); spill rows keep the
    # top bits in word w0 (value >> (end-64)) and the rest in w0+1.
    rsh = np.where(spill, end - np.uint64(64), np.uint64(0))
    lsh = np.where(spill, np.uint64(0), np.uint64(64) - end)
    nw = total >> 6 if total & 63 == 0 else (total >> 6) + 1
    words = np.zeros(nw, dtype=np.uint64)
    np.bitwise_or.at(words, w0, (values >> rsh) << lsh)
    if spill.any():
        lo = values[spill] << (np.uint64(128) - end[spill])
        np.bitwise_or.at(words, w0[spill] + 1, lo)
    # per-segment 1-bit padding: each pad run (< 8 bits) closes a byte,
    # and a byte never straddles a word, so one OR per padded segment
    padlen = padded - bits_per_seg
    has = padlen > 0
    if has.any():
        pstart = (seg_start + bits_per_seg)[has]
        mask = ((np.int64(1) << padlen[has]) - 1).astype(np.uint64)
        shift = (
            np.uint64(64) - (pstart & 63).astype(np.uint64)
            - padlen[has].astype(np.uint64)
        )
        np.bitwise_or.at(words, (pstart >> 6).astype(np.int64), mask << shift)
    by = words.byteswap().view(np.uint8)[: total >> 3].tobytes()
    offs = np.append(seg_start >> 3, total >> 3)
    return [
        by[offs[i] : offs[i + 1]].replace(b"\xff", b"\xff\x00")
        for i in range(nseg)
    ]


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def encode_jpeg(
    arr: np.ndarray, caption: str = "", qstep: int = DEFAULT_QUANT,
    restart_rows: int | None = None, restart_mcus: int | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JPEG bytes (4:4:4, RGB via APP14).

    Dimensions not divisible by 8 are edge-replicated to the block grid
    (decoder crops back using the true SOF0 dimensions).

    ``restart_rows``: emit a DRI marker and RSTn restart markers every
    that many MCU rows (spec F.1.2.3 / B.2.4.4). Restart intervals reset
    the DC predictors and byte-align the stream, making each interval
    independently decodable — the property real pipelines use for robust
    / parallel decode of a single large image."""
    if qstep < 2:
        # qstep=1 can yield AC magnitudes needing size 11; the Annex-K AC
        # table has no run/size-11 symbols, so the Huffman code would be
        # silently dropped (undecodable stream) — refuse up front (ADVICE)
        raise ValueError(f"qstep must be >= 2 (Annex-K AC table), got {qstep}")
    h, w = arr.shape[:2]
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw), (0, 0)), mode="edge")
    fh, fw = arr.shape[:2]

    # Vectorized transform per component, zigzag, then interleave the
    # component planes into MCU order: row m*3+c is MCU m's component c.
    planes = [
        fdct_quant(_to_blocks(arr[..., c]), qstep).reshape(-1, 64)[:, ZZ]
        for c in range(3)
    ]
    zz_all = np.stack(planes, axis=1).reshape(-1, 64).astype(np.int64)
    interval = 0
    if restart_mcus:
        # DRI is an MCU count (spec B.2.4.4) — any interval is legal, not
        # just whole rows. Near-constant interval sizes keep the restart
        # streams length-balanced, which the vectorized pool decoder's
        # iteration count (= longest stream) depends on.
        interval = restart_mcus
    elif restart_rows:
        interval = (fw // 8) * restart_rows  # MCUs per restart interval
    if interval:
        # Chunk the vectorized coder at _ENC_CHUNK_INTERVALS restart
        # intervals per call: measured optimum (1 interval/call 3.2,
        # 8-16 4.9, whole-image 3.1 Mpx/s on the corpus mix) — the
        # ~6k-row emission table stays cache-hot while the ~45-op numpy
        # dispatch chain amortizes over 16 intervals. Chunk boundaries
        # must lie ON interval boundaries (restarts byte-align the
        # stream; an unrestarted boundary would not be splittable).
        segs = []
        step = _ENC_CHUNK_INTERVALS * interval * 3
        for start in range(0, zz_all.shape[0], step):
            segs.extend(
                _entropy_encode(
                    zz_all[start : start + step], ncomp=3, interval=interval
                )
            )
    else:
        segs = _entropy_encode(zz_all, ncomp=3)
    chunks = []
    for i, seg in enumerate(segs):
        if i:
            chunks.append(bytes([0xFF, 0xD0 + ((i - 1) % 8)]))
        chunks.append(seg)
    stream = b"".join(chunks)

    qtab_zz = np.full(64, qstep, dtype=np.uint8)[ZZ_INV]  # stored in zigzag
    out = bytearray(b"\xff\xd8")  # SOI
    # APP14 Adobe, transform 0 => components are R,G,B (no color matrix)
    out += _marker(0xFFEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0))
    if caption:
        out += _marker(0xFFFE, caption.encode("utf-8"))  # COM
    out += _marker(0xFFDB, b"\x00" + qtab_zz.tobytes())  # DQT id 0
    if interval:
        out += _marker(0xFFDD, struct.pack(">H", interval))  # DRI
    # SOF0 carries the TRUE dimensions (spec A.2.1); the sample grid is
    # ceil(dim/8) blocks and the decoder crops the replicated edge back off.
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += struct.pack(">BBB", cid, 0x11, 0)  # 1x1 sampling, qtab 0
    out += _marker(0xFFC0, sof)  # SOF0 baseline
    out += _marker(
        0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    )  # DHT DC 0
    out += _marker(
        0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )  # DHT AC 0
    sos = b"\x03" + b"".join(
        struct.pack(">BB", cid, 0x00) for cid in (1, 2, 3)
    ) + b"\x00\x3f\x00"
    out += _marker(0xFFDA, sos)
    out += stream
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _entropy_encode(
    zz_all: np.ndarray, ncomp: int, interval: int = 0
) -> list[bytes]:
    """Fully vectorized baseline Huffman entropy coder — ONE pass over
    the whole scan, restart intervals included.

    Every emission (DC/AC Huffman code + appended magnitude bits, ZRL,
    EOB) becomes one row of (sort-key, merged code·magnitude bits,
    length); a single stable argsort puts them in scan order and
    `_pack_bits_segments` assembles every restart interval's stuffed,
    byte-aligned bitstream in one word-scatter — no per-coefficient OR
    per-interval python loop. ``interval`` is the DRI MCU count (0 = no
    restarts); DC predictors reset at each interval start (F.1.2.3).
    Returns the per-interval byte segments (markers NOT included).

    A per-interval loop over a scalar-era packer was the previous shape;
    with the word-OR packer the whole-image emission table is ~8× denser
    and the ~45-op numpy dispatch chain runs once instead of per
    interval — measured 1.9× end-to-end encode on the corpus mix."""
    n_units = zz_all.shape[0]
    dccode, dclen = _code_luts(DC_BITS, DC_VALS, 12)
    accode, aclen = _code_luts(AC_BITS, AC_VALS, 256)
    seg_units = interval * ncomp if interval else n_units  # rows per segment

    # --- DC: per-component predictive differences (interleave-aware),
    # reset to the absolute value at each restart-interval start
    dc = zz_all[:, 0]
    diffs = np.empty(n_units, dtype=np.int64)
    for c in range(ncomp):
        s = dc[c::ncomp]
        d = np.empty_like(s)
        if len(s):
            d[0] = s[0]
            d[1:] = s[1:] - s[:-1]
            if interval:
                resets = np.arange(0, len(s), interval)
                d[resets] = s[resets]
        diffs[c::ncomp] = d
    dsize = _SIZE_LUT[np.abs(diffs)]
    dval = np.where(diffs > 0, diffs, diffs + (1 << dsize) - 1) * (dsize > 0)
    # per-block slot grid: DC at slot 0, AC coef k at 4k (ZRLs just
    # before it), EOB at the end of the block's slot range.
    slot_span = 260
    dc_rows = (
        np.arange(n_units, dtype=np.int64) * slot_span,
        dccode[dsize].astype(np.int64),
        dclen[dsize],
        dval,
        dsize,
    )

    # --- AC: flattened nonzero list with per-block run lengths
    b_idx, k0 = np.nonzero(zz_all[:, 1:])
    k = k0.astype(np.int64) + 1
    v = zz_all[b_idx, k]
    prevk = np.empty_like(k)
    if len(k):
        prevk[0] = 0
        prevk[1:] = np.where(b_idx[1:] == b_idx[:-1], k[:-1], 0)
    run = k - prevk - 1
    nzrl = run // 16
    rrem = run % 16
    size = _SIZE_LUT[np.abs(v)]
    sym = (rrem << 4) | size
    if len(sym) and not aclen[sym].all():
        # a zero-length code means the symbol is absent from the Annex-K
        # AC table (magnitude size > 10) — an undecodable stream if
        # silently packed (ADVICE); fail loudly instead
        bad = sym[aclen[sym] == 0][0]
        raise ValueError(
            f"AC run/size symbol 0x{int(bad):02x} not in Annex-K table "
            "(coefficient magnitude too large — lower qstep?)"
        )
    vval = np.where(v > 0, v, v + (1 << size) - 1)
    ac_rows = (
        b_idx * slot_span + 4 * k,
        accode[sym].astype(np.int64),
        aclen[sym],
        vval,
        size,
    )

    # --- ZRL expansions (≤3 per coefficient): slots right before their k
    tot = int(nzrl.sum())
    if tot:
        rep_b = np.repeat(b_idx, nzrl)
        rep_k = np.repeat(k, nzrl)
        rep_n = np.repeat(nzrl, nzrl)
        jj = np.arange(tot) - np.repeat(np.cumsum(nzrl) - nzrl, nzrl)
        zrl_keys = rep_b * slot_span + 4 * rep_k - (rep_n - jj)
    else:
        zrl_keys = np.empty(0, dtype=np.int64)
    zrl_rows = (
        zrl_keys,
        np.full(tot, int(accode[0xF0]), dtype=np.int64),
        np.full(tot, int(aclen[0xF0]), dtype=np.int64),
        np.zeros(tot, dtype=np.int64),
        np.zeros(tot, dtype=np.int64),
    )

    # --- EOB for every block whose trailing coefficients are zero
    last = np.zeros(n_units, dtype=np.int64)
    if len(k):
        np.maximum.at(last, b_idx, k)
    eob_b = np.nonzero(last < 63)[0]
    eob_rows = (
        eob_b * slot_span + slot_span - 1,
        np.full(len(eob_b), int(accode[0x00]), dtype=np.int64),
        np.full(len(eob_b), int(aclen[0x00]), dtype=np.int64),
        np.zeros(len(eob_b), dtype=np.int64),
        np.zeros(len(eob_b), dtype=np.int64),
    )

    keys = np.concatenate([dc_rows[0], ac_rows[0], zrl_rows[0], eob_rows[0]])
    order = np.argsort(keys, kind="stable")
    cols = [
        np.concatenate([dc_rows[i], ac_rows[i], zrl_rows[i], eob_rows[i]])[order]
        for i in range(1, 5)
    ]
    # merge each Huffman code with its appended magnitude bits into ONE
    # ≤27-bit field (code ≤16 + magnitude ≤11) — halves the field count
    # the packer scatters
    values = (cols[0] << cols[3]) | cols[2]
    lengths = cols[1] + cols[3]
    # the sort key's block index maps each emission to its restart segment
    seg = (keys[order] // slot_span) // seg_units
    return _pack_bits_segments(values, lengths, seg)


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _parse_jpeg(data: bytes) -> dict:
    """Parse all markers up to SOS → header metadata (tables kept as raw
    (bits, vals) tuples so both the scalar peek-16 list and the numpy LUT
    path can build their structures, and so pooled batch decode can group
    images by table signature)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, list] = {}
    ac_tabs: dict[int, list] = {}
    caption = ""
    fh = fw = 0
    restart_interval = 0
    comps: list[tuple[int, int, int]] = []  # (id, qtab, sampling)
    scan_comps: list[tuple[int, int, int]] = []  # (id, dc_tab, ac_tab)
    scan_start = -1
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        tag = data[pos + 1]
        if tag == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if tag == 0xDB:  # DQT (possibly several tables per marker)
            off = 0
            while off < len(body):
                prec, tid = body[off] >> 4, body[off] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8)
                nat = np.zeros(64, dtype=np.int32)
                nat[ZZ] = zz  # stored zigzag → natural order
                qtabs[tid] = nat
                off += 65
        elif tag == 0xC4:  # DHT
            off = 0
            while off < len(body):
                cls, tid = body[off] >> 4, body[off] & 0x0F
                bits = tuple(body[off + 1 : off + 17])
                n = sum(bits)
                vals = tuple(body[off + 17 : off + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = (bits, vals)
                off += 17 + n
        elif tag == 0xC0:  # SOF0
            _, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            comps = [
                (body[6 + 3 * i], body[8 + 3 * i], body[7 + 3 * i])
                for i in range(nc)
            ]
            for _, _, samp in comps:
                if samp != 0x11:
                    raise ValueError("only 4:4:4 (1x1 sampling) supported")
        elif tag in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif tag == 0xFE:  # COM
            caption = body.decode("utf-8", errors="replace")
        elif tag == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif tag == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            scan_start = pos
            break
    if scan_start < 0 or not comps:
        raise ValueError("no scan found")
    eoi = data.rfind(b"\xff\xd9")
    if eoi < 0:
        eoi = len(data)
    gh, gw = -(-fh // 8) * 8, -(-fw // 8) * 8  # padded block grid
    n_blocks = (gh // 8) * (gw // 8)
    return {
        "qtabs": qtabs,
        "dc_tabs": dc_tabs,
        "ac_tabs": ac_tabs,
        "caption": caption,
        "fh": fh,
        "fw": fw,
        "gh": gh,
        "gw": gw,
        "n_blocks": n_blocks,
        "restart_interval": restart_interval,
        "comps": comps,
        "scan_comps": scan_comps,
        "scan_start": scan_start,
        "eoi": eoi,
        # pooling signature: images sharing component count + the exact
        # Huffman table assignment can share one vectorized decode pool
        "sig": (
            len(scan_comps),
            tuple((dc_tabs[d], ac_tabs[a]) for _, d, a in scan_comps),
        ),
    }


def _entropy_scalar(data: bytes, meta: dict) -> list[np.ndarray]:
    """Serial entropy decode (peek-16 LUT, inlined bit reader) of the whole
    scan → per-component zigzag coefficient arrays (n_blocks, 64). The
    right path for single images with few restart intervals, where the
    vectorized pool's per-iteration numpy overhead would dominate."""
    entropy = data[meta["scan_start"] : meta["eoi"]].replace(b"\xff\x00", b"\xff")
    n_blocks = meta["n_blocks"]
    restart_interval = meta["restart_interval"]
    scan_comps = meta["scan_comps"]
    ncomp = len(scan_comps)
    tabs = [
        (_decode_table(*meta["dc_tabs"][d]), _decode_table(*meta["ac_tabs"][a]))
        for _, d, a in scan_comps
    ]

    # hot loop: inlined bit reader (locals only — no method dispatch);
    # rows are collected as flat python lists and bulk-converted after.
    rows: list[list] = [[] for _ in range(ncomp)]
    data = entropy
    dlen = len(data)
    acc = 0
    nbits = 0
    pos = 0
    preds = [0] * ncomp
    for _m in range(n_blocks):
        if restart_interval and _m and _m % restart_interval == 0:
            # byte-align, consume the RSTn marker, reset DC predictors
            drop = nbits % 8
            nbits -= drop
            acc &= (1 << nbits) - 1
            while nbits < 16:
                acc = (acc << 8) | (data[pos] if pos < dlen else 0xFF)
                pos += 1
                nbits += 8
            nbits -= 16
            marker = (acc >> nbits) & 0xFFFF
            acc &= (1 << nbits) - 1
            if not (0xFFD0 <= marker <= 0xFFD7):
                raise ValueError(f"expected RSTn at MCU {_m}, got {marker:#x}")
            preds = [0] * ncomp
        for c in range(ncomp):
            dct, act = tabs[c]
            blk = [0] * 64
            if nbits < 16:
                while nbits < 16:
                    acc = (acc << 8) | (data[pos] if pos < dlen else 0xFF)
                    pos += 1
                    nbits += 8
            sym, length = dct[(acc >> (nbits - 16)) & 0xFFFF]
            nbits -= length
            if sym:
                while nbits < sym:
                    acc = (acc << 8) | (data[pos] if pos < dlen else 0xFF)
                    pos += 1
                    nbits += 8
                nbits -= sym
                v = (acc >> nbits) & ((1 << sym) - 1)
                if v < (1 << (sym - 1)):
                    v -= (1 << sym) - 1
                preds[c] += v
            blk[0] = preds[c]
            k = 1
            while k < 64:
                if nbits < 16:
                    while nbits < 16:
                        acc = (acc << 8) | (data[pos] if pos < dlen else 0xFF)
                        pos += 1
                        nbits += 8
                sym, length = act[(acc >> (nbits - 16)) & 0xFFFF]
                nbits -= length
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 0x0F
                while nbits < size:
                    acc = (acc << 8) | (data[pos] if pos < dlen else 0xFF)
                    pos += 1
                    nbits += 8
                nbits -= size
                v = (acc >> nbits) & ((1 << size) - 1)
                if v < (1 << (size - 1)):
                    v -= (1 << size) - 1
                if k < 64:
                    blk[k] = v
                k += 1
            acc &= (1 << nbits) - 1  # keep the accumulator a small int
            rows[c].append(blk)
    return [np.array(r, dtype=np.int32).reshape(-1, 64) for r in rows]


def _reconstruct(meta: dict, zz_out: list[np.ndarray]) -> np.ndarray:
    """Per-component zigzag coefficients → (fh, fw, 3) pixels (dequant +
    vectorized IDCT + crop to the true SOF0 dimensions)."""
    gh, gw, n_blocks = meta["gh"], meta["gw"], meta["n_blocks"]
    planes = []
    for c in range(len(meta["scan_comps"])):
        nat = np.zeros((n_blocks, 64), dtype=np.int32)
        nat[:, ZZ] = zz_out[c]
        qtab = meta["qtabs"][meta["comps"][c][1]]
        coef = (nat * qtab).reshape(-1, 8, 8).astype(np.float64)
        pix = _A.T @ coef @ _A + 128.0
        blocks = np.clip(np.round(pix), 0.0, 255.0).astype(np.uint8)
        planes.append(_from_blocks(blocks, gh, gw))
    return np.stack(planes, axis=-1)[: meta["fh"], : meta["fw"]]


# ---------------------------------------------------------------------------
# Vectorized entropy decode (r4 verdict #5)
#
# Huffman decode is serial WITHIN a stream (the next code's position
# depends on this code's length), but restart intervals are byte-aligned,
# DC-reset, independently decodable streams — and a mapInPandas batch
# holds many images. So: split every scan at its RSTn markers, pool the
# intervals of ALL images in the batch (grouped by Huffman-table
# signature), and advance EVERY stream one symbol per iteration with
# whole-pool numpy gathers. Per-symbol Python cost drops from ~10
# interpreted ops to ~35 numpy ops / pool_size.
# ---------------------------------------------------------------------------

_NP_DECODE_CACHE: dict[tuple, tuple] = {}
_VEC_MIN_STREAMS = 8  # below this the scalar loop wins


def _np_decode_table(bits, vals) -> tuple[np.ndarray, np.ndarray]:
    """65536-entry numpy peek tables: top-16-bits → (symbol, code length).
    length 0 marks an invalid prefix (unassigned code point)."""
    key = (tuple(bits), tuple(vals))
    ent = _NP_DECODE_CACHE.get(key)
    if ent is None:
        sym = np.zeros(65536, dtype=np.uint8)
        ln = np.zeros(65536, dtype=np.uint8)
        for s, (code, length) in _canonical_codes(bits, vals).items():
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = s
            ln[base : base + span] = length
        _NP_DECODE_CACHE[key] = ent = (sym, ln)
    return ent


def _split_streams(data: bytes, meta: dict) -> tuple[list[np.ndarray], list[int]]:
    """Scan segment → per-restart-interval destuffed byte buffers + MCU
    counts. RSTn markers are byte-aligned and cannot occur inside entropy
    data (a data 0xFF is always stuffed as FF 00), so a byte-level scan
    finds exactly the interval boundaries."""
    stuffed = np.frombuffer(
        data[meta["scan_start"] : meta["eoi"]], dtype=np.uint8
    )
    n_blocks, ri = meta["n_blocks"], meta["restart_interval"]
    if ri:
        m = np.nonzero(
            (stuffed[:-1] == 0xFF) & (stuffed[1:] >= 0xD0) & (stuffed[1:] <= 0xD7)
        )[0]
        expected = -(-n_blocks // ri)
        if len(m) + 1 != expected:
            raise ValueError(
                f"restart marker count mismatch: {len(m)} markers for "
                f"{n_blocks} MCUs at interval {ri}"
            )
        starts = [0] + [int(x) + 2 for x in m]
        ends = [int(x) for x in m] + [len(stuffed)]
        pieces = [stuffed[s:e] for s, e in zip(starts, ends)]
        nm = [ri] * (expected - 1) + [n_blocks - ri * (expected - 1)]
    else:
        pieces, nm = [stuffed], [n_blocks]
    bufs = [
        np.frombuffer(p.tobytes().replace(b"\xff\x00", b"\xff"), dtype=np.uint8)
        for p in pieces
    ]
    return bufs, nm


def _pool_decode(
    bufs: list[np.ndarray],
    nmcu_list: list[int],
    dcrow: np.ndarray,
    acrow: np.ndarray,
    ncomp: int,
    SYM: np.ndarray,
    LEN: np.ndarray,
) -> list[np.ndarray]:
    """Decode a pool of independent entropy streams in lockstep.

    bufs[i]: destuffed bytes of stream i; nmcu_list[i]: MCUs it encodes;
    dcrow/acrow: (S, ncomp) row indices into the stacked LUTs SYM/LEN
    ((T, 65536) uint8). Returns per stream an (nmcu*ncomp, 64) int32 array
    of zigzag coefficients in MCU-interleaved order (row m*ncomp + c).

    One iteration decodes ONE (code, value) pair for every active stream:
    16-bit peek gather → stacked-LUT symbol lookup → value-bit extract →
    sign-extend → one scatter into the flat output — all whole-pool
    numpy. Streams that finish are compacted out.

    Vectorization tricks (each collapses several ops/branches):
    - packed position state ``state = (blk*ncomp + comp)*64 + k``: the
      natural-carry of k past 63 advances comp/blk for free, EOB is
      ``(state | 63) + 1``, ZRL is ``state + 16`` (run 15 + 1), and the
      output slot of ANY symbol is just ``obase + state + run``;
    - EOB/ZRL/DC all write val (0 / 0 / dc-diff) through the same scatter
      — writing a 0 at a not-yet-reached slot of a zeroed buffer is a
      no-op, so no branch masks;
    - DC coefficients store the DIFF; predictors are restored after the
      loop by one cumsum per stream (restart streams reset preds anyway).
    """
    S = len(bufs)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    # 8 bytes of 0xFF padding after each stream: refills past the end read
    # all-ones, exactly like the scalar reader's `else 0xFF` tail
    soff = np.zeros(S, dtype=np.int64)
    soff[1:] = np.cumsum(lens + 8)[:-1]
    total = int((lens + 8).sum())
    B = np.full(total + 8, 0xFF, dtype=np.uint8)
    for i, b in enumerate(bufs):
        B[soff[i] : soff[i] + lens[i]] = b
    B64 = B.astype(np.int64)
    # u32[j] = bytes j..j+3 big-endian: 16-bit peek at bit p of stream i is
    # (u32[soff+(p>>3)] >> (16 - (p&7))) & 0xFFFF; a size<=11 value at p is
    # (u32[...] >> (32 - (p&7) - size)) & mask  (7 + 11 <= 32 always fits)
    u32 = (B64[:-3] << 24) | (B64[1:-2] << 16) | (B64[2:-1] << 8) | B64[3:]

    nmcu = np.asarray(nmcu_list, dtype=np.int64)
    out_sizes = nmcu * ncomp * 64
    # 16 slack slots BETWEEN stream regions: the unmasked scatter of a
    # CORRUPT stream (k+run past 63) can overshoot its own region by at
    # most 15 (+DC 0), so the slack guarantees it never contaminates the
    # next stream's coefficients — valid streams never touch it
    obase = np.zeros(S, dtype=np.int64)
    obase[1:] = np.cumsum(out_sizes + 16)[:-1]
    out = np.zeros(int((out_sizes + 16).sum()), dtype=np.int64)

    dcrow = np.asarray(dcrow, np.int64)
    acrow = np.asarray(acrow, np.int64)
    uniform = (
        len(np.unique(dcrow[0])) == 1 and len(np.unique(acrow[0])) == 1
        and (dcrow == dcrow[0, 0]).all() and (acrow == acrow[0, 0]).all()
    )
    if uniform:
        # single DC + single AC table for the whole pool (the ubiquitous
        # case): stack [AC, DC] so the bool isdc indexes the row directly
        SL2_SYM = np.stack(
            [SYM[acrow[0, 0]], SYM[dcrow[0, 0]]]
        ).astype(np.int64)
        SL2_LEN = np.stack(
            [LEN[acrow[0, 0]], LEN[dcrow[0, 0]]]
        ).astype(np.int64)
    else:
        SYM = SYM.astype(np.int64)
        LEN = LEN.astype(np.int64)

    bitpos = soff * 8  # ABSOLUTE bit position in the pooled buffer
    # per-stream consume limit (r5 ADVICE #3): a VALID stream finishes with
    # bitpos <= its own end (+pad-byte slack); a truncated/corrupt stream
    # that runs past 4 bytes into its 8-byte pad would next PEEK (4-byte
    # gather) into the following stream's bytes and return silently wrong
    # coefficients — raise instead, mirroring the scatter-slack guard
    a_lim = (soff + lens + 4) * 8
    state = np.zeros(S, dtype=np.int64)  # (blk*ncomp + comp)*64 + k
    a_ob = obase.copy()
    a_end = out_sizes.copy()  # finished when state >= nmcu*ncomp*64
    a_dc, a_ac = dcrow.copy(), acrow.copy()
    one = np.int64(1)
    max_iters = 8 * total + 64  # >= 1 bit consumed per iteration per stream
    it = 0
    while len(state):
        it += 1
        if it > max_iters:
            raise ValueError("jpeg entropy decode did not terminate")
        pk = (u32[bitpos >> 3] >> (16 - (bitpos & 7))) & 0xFFFF
        isdc = (state & 63) == 0
        if uniform:
            trow = isdc.view(np.int8)
            sym = SL2_SYM[trow, pk]
            ln = SL2_LEN[trow, pk]
        else:
            comp = (state >> 6) % ncomp
            ar = np.arange(len(state))
            trow = np.where(isdc, a_dc[ar, comp], a_ac[ar, comp])
            sym = SYM[trow, pk]
            ln = LEN[trow, pk]
        if not ln.all():
            raise ValueError("invalid Huffman code in scan")
        p = bitpos + ln
        sz = np.where(isdc, sym, sym & 0x0F)  # EOB 0x00/ZRL 0xF0 → 0
        mask = (one << sz) - 1
        raw = (u32[p >> 3] >> (32 - (p & 7) - sz)) & mask
        bitpos = p + sz
        if (bitpos > a_lim).any():
            raise ValueError("jpeg entropy stream overruns its segment")
        half = (mask + 1) >> 1  # 2^(sz-1), or 0 when sz == 0
        val = raw - (raw < half) * mask
        run = sym >> 4  # DC sym <= 15 → run 0; EOB → 0; ZRL → 15
        # one unmasked scatter covers every case: AC coef writes val at
        # slot k+run, DC writes its diff at slot 0, EOB/ZRL write a 0 at a
        # not-yet-reached slot of a zeroed block (no-op). Valid streams
        # never produce k+run > 63; corrupt ones land in the +16 slack.
        out[a_ob + state + run] = val
        iseob = (~isdc) & (sym == 0x00)
        state = np.where(
            iseob, (state | 63) + 1, state + run + 1
        )  # DC: +1 (k=1); AC/ZRL: k+run+1 with natural carry past 63
        fin = state >= a_end
        if fin.any():
            keep = ~fin
            bitpos, state = bitpos[keep], state[keep]
            a_ob, a_end, a_lim = a_ob[keep], a_end[keep], a_lim[keep]
            if not uniform:
                a_dc, a_ac = a_dc[keep], a_ac[keep]
    res = []
    for i in range(S):
        zz = out[obase[i] : obase[i] + out_sizes[i]].reshape(-1, 64)
        dc = zz[:, 0].copy().reshape(int(nmcu[i]), ncomp)
        np.cumsum(dc, axis=0, out=dc)  # restore DC predictors from diffs
        zz[:, 0] = dc.reshape(-1)
        res.append(zz.astype(np.int32))
    return res


def _zz_by_comp(stream_zz: list[np.ndarray], ncomp: int) -> list[np.ndarray]:
    """Concatenate a single image's interval outputs (MCU-interleaved rows)
    and slice per component — the layout _reconstruct expects."""
    allz = np.concatenate(stream_zz, axis=0) if len(stream_zz) > 1 else stream_zz[0]
    return [allz[c::ncomp] for c in range(ncomp)]


_POOL_MAX_STREAMS = 1024  # swept: 256→0.96, 1024→2.70, 4096→0.86 Mpx/s


def _decode_pooled(datas: list[bytes], metas: list[dict],
                   members: list[int]) -> dict[int, list[np.ndarray]]:
    """Vector-decode the images `members` (identical table signature) as
    one pool → image index → per-comp zigzag arrays.

    Pools are chunked at ~_POOL_MAX_STREAMS streams — a measured optimum:
    smaller chunks repeat the per-stream iteration chain per chunk
    (256 → 0.96 Mpx/s), larger ones push the peek/scatter gathers out of
    cache (4096 → 0.86 Mpx/s); 1024 hits 2.7 Mpx/s (~3x scalar) on the
    corpus size mix."""
    out: dict[int, list[np.ndarray]] = {}
    chunk: list[int] = []
    n_streams = 0
    for i in members:
        s = (
            -(-metas[i]["n_blocks"] // metas[i]["restart_interval"])
            if metas[i]["restart_interval"]
            else 1
        )
        if chunk and n_streams + s > _POOL_MAX_STREAMS:
            out.update(_decode_pool_chunk(datas, metas, chunk))
            chunk, n_streams = [], 0
        chunk.append(i)
        n_streams += s
    if chunk:
        out.update(_decode_pool_chunk(datas, metas, chunk))
    return out


def _decode_pool_chunk(datas: list[bytes], metas: list[dict],
                       members: list[int]) -> dict[int, list[np.ndarray]]:
    ncomp = metas[members[0]]["sig"][0]
    # stacked LUT rows for the distinct tables of this signature
    tab_keys: list[tuple] = []

    def row_of(key: tuple) -> int:
        if key not in tab_keys:
            tab_keys.append(key)
        return tab_keys.index(key)

    m0 = metas[members[0]]
    dcrow1 = [row_of(m0["dc_tabs"][d]) for _, d, _a in m0["scan_comps"]]
    acrow1 = [row_of(m0["ac_tabs"][a]) for _, _d, a in m0["scan_comps"]]
    SYM = np.stack([_np_decode_table(*kk)[0] for kk in tab_keys])
    LEN = np.stack([_np_decode_table(*kk)[1] for kk in tab_keys])

    bufs: list[np.ndarray] = []
    nm: list[int] = []
    spans: list[tuple[int, int, int]] = []  # (img, first_stream, n_streams)
    for i in members:
        b, n = _split_streams(datas[i], metas[i])
        spans.append((i, len(bufs), len(b)))
        bufs.extend(b)
        nm.extend(n)
    Sn = len(bufs)
    dcrow = np.tile(np.array(dcrow1, np.int64), (Sn, 1))
    acrow = np.tile(np.array(acrow1, np.int64), (Sn, 1))
    stream_zz = _pool_decode(bufs, nm, dcrow, acrow, ncomp, SYM, LEN)
    return {
        i: _zz_by_comp(stream_zz[s0 : s0 + ns], ncomp)
        for i, s0, ns in spans
    }


def decode_jpeg(data: bytes) -> tuple[np.ndarray, str]:
    """Baseline JPEG bytes → ((h, w, 3) uint8 RGB, caption from COM).

    Images with enough restart intervals decode through the vectorized
    pool; otherwise the scalar loop (faster for small stream counts).
    Prefer ``decode_jpeg_batch`` for many images — it pools intervals
    across the whole batch."""
    meta = _parse_jpeg(data)
    ncomp = len(meta["scan_comps"])
    n_streams = (
        -(-meta["n_blocks"] // meta["restart_interval"])
        if meta["restart_interval"]
        else 1
    )
    if n_streams >= _VEC_MIN_STREAMS:
        zz = _decode_pooled([data], [meta], [0])[0]
    else:
        zz = _entropy_scalar(data, meta)
    assert len(zz) == ncomp
    return _reconstruct(meta, zz), meta["caption"]


def decode_jpeg_batch(datas: list[bytes]) -> list[tuple[np.ndarray, str]]:
    """Decode many JPEGs at once: restart intervals of ALL images (grouped
    by Huffman-table signature) form one vectorized decode pool, so the
    per-symbol Python cost is shared across the whole batch. Results are
    index-aligned with the input."""
    metas = [_parse_jpeg(d) for d in datas]
    groups: dict[tuple, list[int]] = {}
    for i, m in enumerate(metas):
        groups.setdefault(m["sig"], []).append(i)
    zz_all: dict[int, list[np.ndarray]] = {}
    for members in groups.values():
        n_streams = sum(
            -(-metas[i]["n_blocks"] // metas[i]["restart_interval"])
            if metas[i]["restart_interval"]
            else 1
            for i in members
        )
        if n_streams >= _VEC_MIN_STREAMS:
            zz_all.update(_decode_pooled(datas, metas, members))
        else:
            for i in members:
                zz_all[i] = _entropy_scalar(datas[i], metas[i])
    return [
        (_reconstruct(metas[i], zz_all[i]), metas[i]["caption"])
        for i in range(len(datas))
    ]
