"""Baseline JPEG codec: round-trip closeness, determinism, subsampled
decode against a hand-crafted 4:2:0 stream, and the loud-failure
contract for unsupported profiles. No Spark needed — this pins the
byte-level layer under cpdd_spark.multimodal's decode path, like
test_codecs.py does for PNG/BMP/netpbm."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cpdd_spark.codecs import CodecError
from cpdd_spark.jpeg import (
    HUFF_AC_LUMA,
    HUFF_DC_LUMA,
    _BitWriter,
    _build_encode_table,
    decode_jpeg,
    encode_jpeg,
)


def test_decode_error_contract_under_fuzz():
    """The boundary extract_features(strict=False) relies on: EVERY
    malformed payload raises CodecError (or NotImplementedError), never
    an interpreter-level error — one IndexError from a corrupt entropy
    stream would fail a whole Spark task instead of NULLing one row.
    Seeded fuzz over garbage-after-magic, truncations, and byte flips,
    for every shipped decoder."""
    from cpdd_spark.codecs import (
        decode_bmp, decode_png, decode_pnm, encode_bmp, encode_png, encode_pnm,
    )
    from cpdd_spark.gif import decode_gif, encode_gif
    from cpdd_spark.wav import decode_wav, encode_wav
    from cpdd_spark.webp import decode_webp, encode_webp

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    cases = [
        (decode_jpeg, b"\xff\xd8\xff", encode_jpeg(gray)),
        (decode_gif, b"GIF89a", encode_gif(gray)),
        (decode_webp, b"RIFF\x24\x00\x00\x00WEBP", encode_webp(gray)),
        (decode_wav, b"RIFF\x24\x00\x00\x00WAVE",
         encode_wav((gray.astype(np.int16) - 128).ravel())),
        (decode_png, b"\x89PNG\r\n\x1a\n", encode_png(gray)),
        (decode_bmp, b"BM", encode_bmp(np.dstack([gray] * 3))),
        (decode_pnm, b"P5", encode_pnm(gray)),
    ]
    for decode, magic, good in cases:
        for trial in range(600):
            kind = trial % 3
            if kind == 0:
                tail = rng.integers(
                    0, 256, size=int(rng.integers(0, 300))
                ).astype(np.uint8).tobytes()
                p = magic + tail
            elif kind == 1:
                p = good[: int(rng.integers(0, len(good)))]
            else:
                b = bytearray(good)
                for _ in range(int(rng.integers(1, 6))):
                    b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
                p = bytes(b)
            try:
                decode(p)
            except (CodecError, NotImplementedError):
                pass
            # anything else propagates and fails the test


def test_roundtrip_smooth_rgb_close():
    """JPEG is lossy; on a smooth gradient at quality 90 the round trip
    must stay within a few code values everywhere (DCT quantization
    error, not structural corruption)."""
    x = np.linspace(0, 255, 48)
    img = np.clip(
        np.add.outer(x, x / 2)[:, :, None] + np.array([0, 30, 60])[None, None, :],
        0,
        255,
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


@pytest.mark.parametrize("shape", [(8, 8), (24, 40), (13, 21), (1, 1), (9, 8)])
def test_roundtrip_gray_odd_dims(shape):
    """Non-multiple-of-8 dimensions exercise edge-replicated padding on
    encode and the crop-back on decode."""
    h, w = shape
    g = np.clip(
        np.add.outer(np.linspace(0, 255, h), np.linspace(0, 100, w)), 0, 255
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=95))
    assert dec.shape == (h, w, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 4


def test_quality100_noise_bounded_and_deterministic():
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    enc = encode_jpeg(noisy, quality=100)
    a = decode_jpeg(enc)
    b = decode_jpeg(enc)
    assert a.tobytes() == b.tobytes()  # decode is bit-deterministic
    assert np.abs(a.astype(int) - noisy.astype(int)).max() <= 2
    # encode is deterministic too (fixed tables, float64 DCT)
    assert encode_jpeg(noisy, quality=100) == enc


def test_byte_stuffing_roundtrip():
    """An entropy stream that emits 0xFF bytes must be stuffed with 0x00
    and de-stuffed on read; high-entropy input at max quality reliably
    produces such bytes across 64 random images."""
    rng = np.random.default_rng(11)
    saw_stuffed = False
    for _ in range(64):
        img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
        enc = encode_jpeg(img, quality=100)
        saw_stuffed = saw_stuffed or b"\xff\x00" in enc
        assert np.abs(
            decode_jpeg(enc)[:, :, 0].astype(int) - img.astype(int)
        ).max() <= 2
    assert saw_stuffed


def test_decode_handcrafted_420_subsampled():
    """The encoder only writes 4:4:4, so the subsampled-MCU walk is
    pinned by a hand-crafted 4:2:0 stream: one 16x16 MCU, four Y blocks
    (2x2 sampling) with distinct flat DC values, neutral chroma (1x1).
    Expected pixels: each 8x8 Y block decodes flat to
    round(clip(DC * q / 8 + 128)) and chroma-128 makes RGB == Y."""
    dc_tab = _build_encode_table(*HUFF_DC_LUMA)
    ac_tab = _build_encode_table(*HUFF_AC_LUMA)

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # all-ones quant table (zigzag order == natural for a constant table)
    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0])  # Y: h=2, v=2
        + bytes([2, 0x11, 0])  # Cb: 1x1
        + bytes([3, 0x11, 0]),  # Cr: 1x1
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(HUFF_DC_LUMA[0][1:17]) + bytes(HUFF_DC_LUMA[1]),
    ) + seg(
        0xC4,
        bytes([0x10]) + bytes(HUFF_AC_LUMA[0][1:17]) + bytes(HUFF_AC_LUMA[1]),
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    y_dcs = [64, -64, 32, -32]  # four Y blocks, raster order within the MCU
    pred = 0
    eob_code, eob_len = ac_tab[0x00]

    def put_dc(diff):
        t = int(abs(diff)).bit_length() if diff else 0
        code, ln = dc_tab[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        bw.write(eob_code, eob_len)

    for dc in y_dcs:
        put_dc(dc - pred)
        pred = dc
    put_dc(0)  # Cb (its own predictor starts at 0)
    put_dc(0)  # Cr
    bw.flush()

    payload = b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    dec = decode_jpeg(payload)
    assert dec.shape == (16, 16, 3)
    expect = {0: 64 / 8 + 128, 1: -64 / 8 + 128, 2: 32 / 8 + 128, 3: -32 / 8 + 128}
    for i, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        block = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :]
        assert np.all(np.abs(block.astype(float) - expect[i]) <= 1.0), (i, block[0, 0])


def test_unsupported_profiles_raise_codec_error():
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(CodecError, match="SOI"):
        decode_jpeg(b"XX" + good[2:])
    # rewrite SOF0 -> SOF2 (progressive): must refuse loudly
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(CodecError, match="baseline"):
        decode_jpeg(prog)
    with pytest.raises(CodecError, match="truncated|marker|scan"):
        decode_jpeg(good[: len(good) // 2])
    # garbage after SOI: APP0 with zero length -> truncated segment
    with pytest.raises(CodecError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


def test_multimodal_dispatch_includes_jpeg():
    from cpdd_spark.multimodal import decode_image, sniff_format

    img = np.clip(np.add.outer(np.arange(16) * 8, np.arange(16) * 4), 0, 255).astype(
        np.uint8
    )
    enc = encode_jpeg(img, 92)
    assert sniff_format(enc) == "jpeg"
    dec = decode_image(enc)
    assert dec.shape == (16, 16, 1)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 6


def _gradient_rgb(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 200, h)
    img = np.clip(
        np.add.outer(y, x / 2)[:, :, None] + np.array([0, 30, 60])[None, None, :],
        0, 255,
    )
    return img.astype(np.uint8)


def test_fast_scan_equals_scalar_reference():
    """The LUT/batched default scan decoder must produce BIT-identical
    pixels to the bit-at-a-time from-spec reference (same pattern as the
    PNG unfilter's vectorized-vs-scalar property test) across gray/RGB,
    odd dims, quality extremes, restart intervals, and high-entropy
    streams that exercise byte stuffing."""
    rng = np.random.default_rng(23)
    payloads = [
        encode_jpeg(_gradient_rgb(24, 40), quality=90),
        encode_jpeg(_gradient_rgb(13, 21), quality=35),
        encode_jpeg(rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8), 100),
        encode_jpeg(rng.integers(0, 256, size=(17, 9), dtype=np.uint8), 100),
        encode_jpeg(_gradient_rgb(16, 16), quality=85, restart_interval=1),
        encode_jpeg(rng.integers(0, 256, size=(32, 24), dtype=np.uint8),
                    quality=95, restart_interval=2),
    ]
    for p in payloads:
        fast = decode_jpeg(p)
        ref = decode_jpeg(p, scalar=True)
        assert fast.shape == ref.shape
        assert fast.tobytes() == ref.tobytes()


def test_restart_interval_roundtrip_and_framing():
    """Restart markers change only the entropy framing: pixels decode
    bit-identical to the restart-free stream, DC predictors reset per
    interval, and both scan decoders agree. Also hunts (seeded) for the
    conformant edge the scalar reader must survive: a byte-aligned pad
    byte of 0xFF stuffed as FF 00 immediately before an RSTn."""
    rng = np.random.default_rng(31)
    saw_stuffed_pad_before_rst = False
    for trial in range(400):
        img = rng.integers(0, 256, size=(8, 24), dtype=np.uint8)
        plain = encode_jpeg(img, quality=100)
        rst = encode_jpeg(img, quality=100, restart_interval=1)
        assert any(bytes([0xFF, 0xD0 + m]) in rst for m in range(8))
        a, b, c = decode_jpeg(plain), decode_jpeg(rst), decode_jpeg(rst, scalar=True)
        assert a.tobytes() == b.tobytes() == c.tobytes()
        for m in range(8):
            if b"\xff\x00\xff" + bytes([0xD0 + m]) in rst:
                saw_stuffed_pad_before_rst = True
        if saw_stuffed_pad_before_rst and trial >= 40:
            break
    assert saw_stuffed_pad_before_rst


def test_fill_bytes_before_marker_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; decoders must skip them, in both the marker-segment loop and
    the entropy-terminating marker scan."""
    img = _gradient_rgb(16, 16)
    good = encode_jpeg(img, quality=90)
    # fill byte before the DQT marker (first segment after SOI)
    assert good[2:4] == b"\xff\xdb"
    filled = good[:2] + b"\xff" + good[2:]
    assert decode_jpeg(filled).tobytes() == decode_jpeg(good).tobytes()
    assert decode_jpeg(filled, scalar=True).tobytes() == decode_jpeg(good).tobytes()
    # fill byte before EOI (terminates the entropy scan)
    assert good.endswith(b"\xff\xd9")
    filled_eoi = good[:-2] + b"\xff" + good[-2:]
    assert decode_jpeg(filled_eoi).tobytes() == decode_jpeg(good).tobytes()


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2: a one-component scan is NON-interleaved even when the
    SOF declares 2x2 sampling — MCU is one data unit, raster order over
    ceil(w/8) x ceil(h/8) blocks. A valid 8x8 grayscale with declared
    2x2 sampling therefore contains exactly ONE block, and must decode
    to that block's pixels (not a silently misplaced 16-aligned grid)."""
    dc_tab = _build_encode_table(*HUFF_DC_LUMA)
    ac_tab = _build_encode_table(*HUFF_AC_LUMA)

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x22, 0]))
    dht = seg(
        0xC4, bytes([0x00]) + bytes(HUFF_DC_LUMA[0][1:17]) + bytes(HUFF_DC_LUMA[1])
    ) + seg(
        0xC4, bytes([0x10]) + bytes(HUFF_AC_LUMA[0][1:17]) + bytes(HUFF_AC_LUMA[1])
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = _BitWriter()
    # one block: DC diff = 64, EOB
    t = 7
    code, ln = dc_tab[t]
    bw.write(code, ln)
    bw.write(64, t)
    eob_code, eob_len = ac_tab[0x00]
    bw.write(eob_code, eob_len)
    bw.flush()
    payload = b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    for dec in (decode_jpeg(payload), decode_jpeg(payload, scalar=True)):
        assert dec.shape == (8, 8, 1)
        assert np.all(np.abs(dec[:, :, 0].astype(float) - (64 / 8 + 128)) <= 1.0)


def test_large_decode_not_quadratic():
    """The bit accumulators are masked to live bits: a 256x256 random
    grayscale (a ~100KB entropy stream) must decode in well under a
    second on this host — the unmasked bigint variant took tens of
    seconds at 512x512 (O(n^2) in the scan length)."""
    import time

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, size=(256, 256), dtype=np.uint8)
    enc = encode_jpeg(img, quality=95)
    t0 = time.perf_counter()
    dec = decode_jpeg(enc)
    dt = time.perf_counter() - t0
    assert dec.shape == (256, 256, 1)
    assert dt < 2.0, f"decode took {dt:.2f}s — accumulator masking regressed?"
