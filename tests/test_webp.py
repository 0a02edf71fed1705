"""WebP lossless (VP8L) codec: round-trips, hand-crafted decode pins
for every transform / color cache / LZ77 / meta prefix groups, and the
container error contract.

The encoder is literal-only (no transforms), so the transform and
back-reference decode paths cannot be pinned by round-trips alone —
each gets a hand-crafted bitstream with independently hand-computed
expected pixels, mirroring how tests/test_jpeg.py pins the 4:2:0 MCU
walk with a hand-built stream."""

import struct

import numpy as np
import pytest

import cpdd_spark.webp as webp
from cpdd_spark.codecs import CodecError
from cpdd_spark.webp import decode_webp, encode_webp


# --- round-trips (encoder-path coverage) --------------------------------


@pytest.mark.parametrize("shape", [(1, 1), (3, 7), (24, 32), (16, 1), (1, 16)])
def test_gray_roundtrip_bit_exact(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    assert out.shape == (*shape, 3)
    for c in range(3):
        assert np.array_equal(out[:, :, c], img)


def test_rgb_roundtrip_bit_exact():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    # constant alpha=255 channel exercises the single-symbol prefix code
    assert np.array_equal(out, img)


def test_rgba_roundtrip_bit_exact():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    img[0, 0, 3] = 0  # force alpha channel to survive
    out = decode_webp(encode_webp(img))
    assert out.shape == (8, 8, 4)
    assert np.array_equal(out, img)


def test_constant_image_roundtrip():
    """Every channel histogram is a single symbol — the zero-bit simple
    code on all five prefix codes."""
    for v in (0, 255, 97):
        img = np.full((5, 6), v, dtype=np.uint8)
        out = decode_webp(encode_webp(img))
        assert np.array_equal(out[:, :, 0], img)


def test_two_value_image_roundtrip():
    """Dense equal-length prefix codes: the code-length code collapses
    to one distinct symbol, which must serialize as a zero-bit read."""
    img = np.array([[0, 255] * 8, [255, 0] * 8] * 4, dtype=np.uint8)
    out = decode_webp(encode_webp(img))
    assert np.array_equal(out[:, :, 1], img)


# --- hand-crafted stream helpers ----------------------------------------


def _length_to_prefix(v):
    """Inverse of webp._prefix_value: value -> (code, extra_bits, n_extra)."""
    for code in range(40):
        if code < 4:
            if v == code + 1:
                return code, 0, 0
            continue
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, v - offset - 1, extra
    raise AssertionError(f"no prefix code for value {v}")


def _start(w, h):
    bw = webp._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    return bw


def _wrap(bw):
    vp8l = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _emit_image(bw, tokens, cache_bits=0, num_groups=1, meta=None):
    """Serialize one image's [meta] + cache + prefix-code groups + data.

    tokens: list of (group, kind, *args) with kind in
      ('lit', a, r, g, b) | ('cache', idx) | ('copy', length, dist_value)
    meta: (prefix_bits, meta_tokens) for the main image, or None. For
      sub-images (transform data, palettes, the meta image itself) the
      decoder never reads a meta bit, so pass meta='sub'.
    """
    if meta == "sub":
        pass  # no meta bit in sub-images
    elif meta is None:
        bw.write(0, 1)
    else:
        prefix_bits, meta_tokens = meta
        bw.write(1, 1)
        bw.write(prefix_bits - 2, 3)
        _emit_image(bw, meta_tokens, meta="sub")
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)

    green_size = webp._GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    # histogram per group/channel
    hists = [
        {k: {} for k in ("g", "r", "b", "a", "d")} for _ in range(num_groups)
    ]

    def bump(g, ch, sym):
        hists[g][ch][sym] = hists[g][ch][sym] + 1 if sym in hists[g][ch] else 1

    for tok in tokens:
        grp, kind = tok[0], tok[1]
        if kind == "lit":
            a, r, g, b = tok[2:]
            bump(grp, "g", g)
            bump(grp, "r", r)
            bump(grp, "b", b)
            bump(grp, "a", a)
        elif kind == "cache":
            bump(grp, "g", webp._GREEN_BASE + tok[2])
        else:
            lcode, _, _ = _length_to_prefix(tok[2])
            dcode, _, _ = _length_to_prefix(tok[3])
            bump(grp, "g", 256 + lcode)
            bump(grp, "d", dcode)

    codes = []
    for g in range(num_groups):
        hs = hists[g]
        grp_codes = {}
        for ch, alphabet in (
            ("g", green_size), ("r", 256), ("b", 256), ("a", 256), ("d", 40),
        ):
            counts = hs[ch] if hs[ch] else {0: 1}
            grp_codes[ch] = webp._write_prefix_code(
                bw, webp._huffman_lengths(counts), alphabet
            )
        codes.append(grp_codes)

    for tok in tokens:
        grp, kind = tok[0], tok[1]
        gc = codes[grp]
        if kind == "lit":
            a, r, g, b = tok[2:]
            for ch, sym in (("g", g), ("r", r), ("b", b), ("a", a)):
                c, n = gc[ch][sym]
                bw.write_code(c, n)
        elif kind == "cache":
            c, n = gc["g"][webp._GREEN_BASE + tok[2]]
            bw.write_code(c, n)
        else:
            length, dval = tok[2], tok[3]
            lcode, lx, lnx = _length_to_prefix(length)
            c, n = gc["g"][256 + lcode]
            bw.write_code(c, n)
            bw.write(lx, lnx)
            dcode, dx, dnx = _length_to_prefix(dval)
            c, n = gc["d"][dcode]
            bw.write_code(c, n)
            bw.write(dx, dnx)


def _lit(a, r, g, b, grp=0):
    return (grp, "lit", a, r, g, b)


# --- hand-crafted decode pins -------------------------------------------


def test_handcrafted_subtract_green():
    bw = _start(2, 2)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # subtract-green
    bw.write(0, 1)  # no more transforms
    toks = [
        _lit(255, 10, 100, 20),
        _lit(255, 250, 10, 252),
        _lit(255, 0, 0, 0),
        _lit(255, 7, 200, 9),
    ]
    _emit_image(bw, toks)
    out = decode_webp(_wrap(bw))
    exp = np.array(
        [
            [[(10 + 100) % 256, 100, (20 + 100) % 256],
             [(250 + 10) % 256, 10, (252 + 10) % 256]],
            [[0, 0, 0],
             [(7 + 200) % 256, 200, (9 + 200) % 256]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(out, exp)


def test_handcrafted_predictor_left_mode():
    """Predictor transform, one 4x4 block (size_bits=2), mode 1 (left).
    Spec edge rules: (0,0) predicts opaque black, row 0 predicts left,
    column 0 predicts top."""
    bw = _start(4, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # predictor transform
    bw.write(0, 3)  # size_bits = 2 -> one 4-px tile covers 4x2
    _emit_image(bw, [_lit(0, 0, 1, 0)], meta="sub")  # mode 1 in green
    bw.write(0, 1)  # no more transforms
    res = [
        (0, 5, 6, 7), (1, 2, 3, 4), (2, 2, 2, 2), (3, 3, 3, 3),
        (10, 10, 10, 10), (1, 1, 1, 1), (0, 0, 0, 0), (5, 0, 0, 5),
    ]
    _emit_image(bw, [_lit(*t) for t in res])
    out = decode_webp(_wrap(bw))
    # hand-applied: px[0,0] = res + (255,0,0,0[argb]); row0 left chain;
    # px[1,0] = res + top; rest mode 1 = left chain
    exp_argb = []
    for y in range(2):
        row = []
        for x in range(4):
            a, r, g, b = res[y * 4 + x]
            if x == 0 and y == 0:
                pa, pr, pg, pb = 255, 0, 0, 0
            elif y == 0:
                pa, pr, pg, pb = row[x - 1]
            elif x == 0:
                pa, pr, pg, pb = exp_argb[0][0]
            else:
                pa, pr, pg, pb = row[x - 1]
            row.append(
                ((a + pa) % 256, (r + pr) % 256, (g + pg) % 256, (b + pb) % 256)
            )
        exp_argb.append(row)
    for y in range(2):
        for x in range(4):
            a, r, g, b = exp_argb[y][x]
            px = out[y, x]
            if out.shape[2] == 4:
                assert tuple(px) == (r, g, b, a)
            else:
                assert a == 255 and tuple(px) == (r, g, b)


def test_handcrafted_predictor_mode_grid():
    """Two predictor tiles with different modes (2=top, 4=top-left) on a
    8x2 image with size_bits=2 -> mode image is 2x1."""
    bw = _start(8, 2)
    bw.write(1, 1)
    bw.write(0, 2)
    bw.write(0, 3)  # size_bits=2, tiles of 4 px
    _emit_image(
        bw, [_lit(0, 0, 2, 0), _lit(0, 0, 4, 0)], meta="sub"
    )
    bw.write(0, 1)
    res = [(0, i + 1, 2 * i + 1, 3 * i + 1) for i in range(16)]
    _emit_image(bw, [_lit(*t) for t in res])
    out = decode_webp(_wrap(bw))

    # independent scalar re-application of the spec rules
    px = [[None] * 8 for _ in range(2)]
    for y in range(2):
        for x in range(8):
            a, r, g, b = res[y * 8 + x]
            if x == 0 and y == 0:
                p = (255, 0, 0, 0)
            elif y == 0:
                p = px[0][x - 1]
            elif x == 0:
                p = px[y - 1][0]
            else:
                mode = 2 if x < 4 else 4
                p = px[y - 1][x] if mode == 2 else px[y - 1][x - 1]
            px[y][x] = (
                (a + p[0]) % 256, (r + p[1]) % 256,
                (g + p[2]) % 256, (b + p[3]) % 256,
            )
    for y in range(2):
        for x in range(8):
            a, r, g, b = px[y][x]
            got = out[y, x]
            if out.shape[2] == 4:
                assert tuple(got) == (r, g, b, a)
            else:
                assert a == 255 and tuple(got) == (r, g, b)


def test_handcrafted_color_transform():
    """One color-transform tile: green->red 2, green->blue 3, red->blue
    4 (plus a negative multiplier case, 0xFF = -1)."""
    for g2r, g2b, r2b in ((2, 3, 4), (0xFF, 0x80, 0x7F)):
        bw = _start(2, 1)
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(0, 3)  # size_bits=2 -> single tile
        # cte pixel: red=r2b, green=g2b, blue=g2r
        _emit_image(bw, [_lit(0, r2b, g2b, g2r)], meta="sub")
        bw.write(0, 1)
        toks = [_lit(255, 100, 32, 50), _lit(255, 9, 0xE0, 77)]
        _emit_image(bw, toks)
        out = decode_webp(_wrap(bw))

        def s8(v):
            return v - 256 if v >= 128 else v

        exp = []
        for _, _, a, r, g, b in toks:
            red = (r + ((s8(g2r) * s8(g)) >> 5)) & 0xFF
            blue = (b + ((s8(g2b) * s8(g)) >> 5)) & 0xFF
            blue = (blue + ((s8(r2b) * s8(red)) >> 5)) & 0xFF
            exp.append((red, g, blue))
        assert out.shape == (1, 2, 3)
        assert [tuple(p) for p in out[0]] == exp


def test_handcrafted_palette_subbyte_bundling():
    """Color-indexing with a 2-entry palette: width_bits=3, eight 1-bit
    indices bundled into one packed pixel's green channel, LSB first."""
    bw = _start(8, 1)
    bw.write(1, 1)
    bw.write(3, 2)  # color indexing
    bw.write(2 - 1, 8)  # palette size 2
    # palette sub-image stores DELTAS: black, then white-minus-black
    _emit_image(
        bw, [_lit(0xFF, 0, 0, 0), _lit(0, 0xFF, 0xFF, 0xFF)], meta="sub"
    )
    bw.write(0, 1)  # no more transforms
    bits = 0b10110100  # x=0..7 read LSB-first: 0,0,1,0,1,1,0,1
    _emit_image(bw, [_lit(0, 0, bits, 0)])
    out = decode_webp(_wrap(bw))
    exp_idx = [(bits >> i) & 1 for i in range(8)]
    assert out.shape == (1, 8, 3)
    for x, idx in enumerate(exp_idx):
        assert tuple(out[0, x]) == ((255, 255, 255) if idx else (0, 0, 0))


def test_handcrafted_palette_nibbles():
    """16-entry palette: width_bits=1, two 4-bit indices per packed
    pixel, odd output width exercises the partial last pack."""
    palette = [(255, 10 * i, 255 - 13 * i, (7 * i) % 256) for i in range(16)]
    deltas = []
    prev = (0, 0, 0, 0)
    for p in palette:
        deltas.append(tuple((c - q) % 256 for c, q in zip(p, prev)))
        prev = p
    bw = _start(5, 1)
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(16 - 1, 8)
    _emit_image(bw, [_lit(*d) for d in deltas], meta="sub")
    bw.write(0, 1)
    idxs = [3, 14, 0, 9, 7]
    packed = [idxs[0] | (idxs[1] << 4), idxs[2] | (idxs[3] << 4), idxs[4]]
    _emit_image(bw, [_lit(0, 0, v, 0) for v in packed])
    out = decode_webp(_wrap(bw))
    assert out.shape == (1, 5, out.shape[2])
    for x, i in enumerate(idxs):
        a, r, g, b = palette[i]
        got = tuple(out[0, x])
        assert got == ((r, g, b, a) if out.shape[2] == 4 else (r, g, b))


def test_handcrafted_color_cache():
    """Literal inserts into the cache; a later cache symbol replays it."""
    cache_bits = 4
    p = (0xFF << 24) | (12 << 16) | (34 << 8) | 56
    idx = ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _start(3, 1)
    bw.write(0, 1)  # no transforms
    toks = [_lit(255, 12, 34, 56), _lit(255, 1, 2, 3), (0, "cache", idx)]
    _emit_image(bw, toks, cache_bits=cache_bits)
    out = decode_webp(_wrap(bw))
    assert [tuple(q) for q in out[0]] == [(12, 34, 56), (1, 2, 3), (12, 34, 56)]


def test_handcrafted_lz77_distance_map_and_overlap():
    """Back-references through the 2D distance map (dval=1 -> the pixel
    directly above) and an overlapping dist=1 run."""
    # 3x2: three literals, then copy(length=3, dval=1) replays row 0
    bw = _start(3, 2)
    bw.write(0, 1)
    toks = [
        _lit(255, 1, 2, 3), _lit(255, 4, 5, 6), _lit(255, 7, 8, 9),
        (0, "copy", 3, 1),
    ]
    _emit_image(bw, toks)
    out = decode_webp(_wrap(bw))
    assert np.array_equal(out[1], out[0])
    assert [tuple(q) for q in out[0]] == [(1, 2, 3), (4, 5, 6), (7, 8, 9)]

    # 5x1: literal + overlapping copy (dist=1 -> dval=2 via map (1,0))
    bw = _start(5, 1)
    bw.write(0, 1)
    _emit_image(bw, [_lit(255, 42, 43, 44), (0, "copy", 4, 2)])
    out = decode_webp(_wrap(bw))
    assert all(tuple(q) == (42, 43, 44) for q in out[0])


def test_handcrafted_meta_prefix_groups():
    """Two prefix-code groups selected by a meta image (prefix_bits=2:
    4-px tiles). Each group has disjoint literal alphabets, so a wrong
    group lookup cannot decode to the right pixels."""
    meta_toks = [_lit(0, 0, 0, 0), _lit(0, 0, 1, 0)]  # groups 0, 1
    toks = [
        _lit(255, 10, 11, 12, grp=0), _lit(255, 13, 14, 15, grp=0),
        _lit(255, 10, 11, 12, grp=0), _lit(255, 13, 14, 15, grp=0),
        _lit(255, 200, 201, 202, grp=1), _lit(255, 203, 204, 205, grp=1),
        _lit(255, 200, 201, 202, grp=1), _lit(255, 203, 204, 205, grp=1),
    ]
    bw = _start(8, 1)
    bw.write(0, 1)  # no transforms
    _emit_image(bw, toks, num_groups=2, meta=(2, meta_toks))
    out = decode_webp(_wrap(bw))
    exp = [
        (10, 11, 12), (13, 14, 15), (10, 11, 12), (13, 14, 15),
        (200, 201, 202), (203, 204, 205), (200, 201, 202), (203, 204, 205),
    ]
    assert [tuple(q) for q in out[0]] == exp


# --- error contract ------------------------------------------------------


def test_container_refusals():
    with pytest.raises(CodecError, match="RIFF"):
        decode_webp(b"nope")
    # lossy VP8
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBPVP8 " + struct.pack("<I", 0)
    with pytest.raises(CodecError, match="lossy"):
        decode_webp(lossy)
    # VP8X with animation flag
    vp8x = b"RIFF" + struct.pack("<I", 22) + b"WEBPVP8X" + struct.pack(
        "<I", 10
    ) + bytes([0x02] + [0] * 9)
    with pytest.raises(CodecError, match="animated"):
        decode_webp(vp8x)
    # container with no VP8L chunk at all
    empty = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    with pytest.raises(CodecError, match="no VP8L"):
        decode_webp(empty)
    # oversized dimensions must refuse before allocating
    bw = webp._BitWriter()
    bw.write(16383, 14)
    bw.write(16383, 14)
    bw.write(0, 4)
    with pytest.raises(CodecError, match="size cap"):
        webp._decode_vp8l(b"\x2f" + bw.finish() + b"\x00" * 8)


def test_incomplete_prefix_code_is_refused():
    with pytest.raises(CodecError, match="not complete"):
        webp._decoder_from_lengths([2, 2, 2])  # kraft deficit
    with pytest.raises(CodecError, match="not complete"):
        webp._decoder_from_lengths([1, 1, 1])  # kraft excess
    assert webp._decoder_from_lengths([1, 1]).lut is not None
    assert webp._decoder_from_lengths([0, 3]).single == 1


def test_truncation_raises_codec_error():
    good = encode_webp(np.arange(64, dtype=np.uint8).reshape(8, 8))
    for cut in (13, 21, len(good) - 3):
        with pytest.raises(CodecError):
            decode_webp(good[:cut])


def test_multimodal_dispatch_includes_webp():
    from cpdd_spark.multimodal import decode_image, sniff_format

    img = np.arange(96, dtype=np.uint8).reshape(8, 12)
    payload = encode_webp(img)
    assert sniff_format(payload) == "webp"
    out = decode_image(payload)
    assert np.array_equal(out[:, :, 0], img)
