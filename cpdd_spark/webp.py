"""From-spec WebP lossless (VP8L) codec.

Decoder implements the complete VP8L bitstream per RFC 9649 (the WebP
lossless bitstream specification): LSB-first bit stream, canonical
prefix codes (simple and code-length-coded forms, DEFLATE-style
canonical assignment), meta prefix-code groups, color cache, LZ77
backward references with the 120-entry 2D distance mapping, and all
four transforms (predictor with its 14 modes and edge rules, color
transform, subtract-green, color-indexing with sub-byte pixel
bundling).  Lossy VP8 payloads and animated VP8X containers are
refused with :class:`~cpdd_spark.codecs.CodecError` — same contract as
the progressive-JPEG refusal in cpdd_spark.jpeg (decode-or-refuse, no
silent wrong pixels).

Encoder emits a minimal-but-conformant lossless stream: no transforms,
no color cache, one prefix-code group, literal-only coding with
per-channel optimal prefix codes (complete by Huffman construction,
balanced-code fallback keeps lengths <= 15).  Round-trips are
bit-exact; transform and cache decode paths are pinned by hand-crafted
streams in tests/test_webp.py, mirroring how the 4:2:0 JPEG walk is
pinned.

Reference parity anchor: the reference treats media as opaque byte
streams (matching.c:30-59); this module exists so the decode tier of
the Spark pipeline covers the web corpus' last major raster container.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import CodecError

# code-length-code symbol order (RFC 9649 §5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D offsets for distance codes 1..120 (RFC 9649 §5.2.3); dist = dx + dy*xsize
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_GREEN_BASE = 256 + 24  # literals + length prefix codes; cache symbols follow


class _BitReader:
    """LSB-first bit reader. Accumulator is masked to its live bits on
    every fill — the unmasked-bigint quadratic trap hit in jpeg.py."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise CodecError("truncated VP8L bitstream")
            self.buf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return v

    def read_bit(self) -> int:
        return self.read(1)


def _bit_reverse(code: int, ln: int) -> int:
    rev = 0
    for _ in range(ln):
        rev = (rev << 1) | (code & 1)
        code >>= 1
    return rev


class _PrefixDecoder:
    """Canonical prefix code (DEFLATE convention: codes assigned by
    (length, order), read MSB-first from the LSB-first stream).

    Decoding peeks ``max_len`` buffered bits into a flat LUT of
    ``(symbol, length)`` — one dict-free lookup per symbol instead of a
    Python loop per bit (the same table-driven shape as the jpeg.py
    scan decoder). Kraft completeness is enforced at build time, so
    every LUT slot is populated."""

    __slots__ = ("lut", "single", "max_len", "mask")

    def __init__(self, lut, single, max_len) -> None:
        self.lut = lut
        self.single = single
        self.max_len = max_len
        self.mask = (1 << max_len) - 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        if self.lut is None:
            raise CodecError("symbol read from empty prefix code")
        need = self.max_len
        while br.nbits < need and br.pos < len(br.data):
            br.buf |= br.data[br.pos] << br.nbits
            br.pos += 1
            br.nbits += 8
        # near stream end the peek is zero-padded above br.nbits; the
        # looked-up entry is only valid if its code fits the live bits
        sym, ln = self.lut[br.buf & self.mask]
        if ln > br.nbits:
            raise CodecError("truncated VP8L bitstream")
        br.buf >>= ln
        br.nbits -= ln
        return sym


def _lut_from_codes(codes: list[tuple[int, int, int]], max_len: int) -> list:
    """codes: (length, canonical_code, symbol) triples -> peek LUT."""
    lut = [(0, 0xFF)] * (1 << max_len)
    for ln, code, sym in codes:
        rev = _bit_reverse(code, ln)
        step = 1 << ln
        entry = (sym, ln)
        for slot in range(rev, 1 << max_len, step):
            lut[slot] = entry
    return lut


def _decoder_from_lengths(lengths: list[int]) -> _PrefixDecoder:
    """Build a canonical decoder, enforcing Kraft completeness (the
    single-symbol zero-bit code being the one allowed exception, per
    libwebp/RFC semantics)."""
    nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    if not nonzero:
        return _PrefixDecoder(None, None, 0)
    if len(nonzero) == 1:
        return _PrefixDecoder(None, nonzero[0][1], 0)
    max_len = max(ln for ln, _ in nonzero)
    if max_len > 15:
        raise CodecError(f"prefix code length {max_len} > 15")
    kraft = sum(1 << (max_len - ln) for ln, _ in nonzero)
    if kraft != (1 << max_len):
        raise CodecError("prefix code is not complete (invalid stream)")
    codes = []
    code = 0
    prev_len = 0
    for ln, sym in sorted(nonzero):
        code <<= ln - prev_len
        prev_len = ln
        codes.append((ln, code, sym))
        code += 1
    return _PrefixDecoder(_lut_from_codes(codes, max_len), None, max_len)


def _decoder_from_pairs(pairs: list[tuple[int, int]]) -> _PrefixDecoder:
    """Simple-code decoder: codes assigned in READ order (symbols[0]
    gets code 0), not by symbol value — per RFC 9649 §5.2.1."""
    if len(pairs) == 1:
        return _PrefixDecoder(None, pairs[0][1], 0)
    codes = [(1, i, sym) for i, (_, sym) in enumerate(pairs)]
    return _PrefixDecoder(_lut_from_codes(codes, 1), None, 1)


def _read_code_lengths(
    br: _BitReader, clc: _PrefixDecoder, num_symbols: int
) -> list[int]:
    """Code lengths via the code-length code, mirroring the reference
    decoder's max_symbol read budget and the default-8 repeat base."""
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > num_symbols:
            raise CodecError("max_symbol exceeds alphabet size")
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    prev_len = 8  # spec default when a repeat precedes any literal
    symbol = 0
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = clc.read(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code != 0:
                prev_len = code
        else:
            if code == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code == 17:
                repeat, fill = 3 + br.read(3), 0
            else:  # 18
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > num_symbols:
                raise CodecError("code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        sym0 = br.read(8 if first_8bit else 1)
        pairs = [(0, sym0)]
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 == sym0:
                raise CodecError("duplicate symbol in simple prefix code")
            pairs.append((1, sym1))
        for _, s in pairs:
            if s >= alphabet_size:
                raise CodecError("simple-code symbol exceeds alphabet")
        return _decoder_from_pairs(pairs)
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _decoder_from_lengths(clc_lengths)
    return _decoder_from_lengths(_read_code_lengths(br, clc, alphabet_size))


def _prefix_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """One (sub-)image: [meta-prefix for the main image only] +
    color-cache-info + prefix-code groups + LZ77-coded pixel data.
    Returns w*h ARGB uint32 values in scan order."""
    meta_img = None
    meta_w = 0
    prefix_bits = 0
    num_groups = 1
    if allow_meta and br.read_bit():
        prefix_bits = 2 + br.read(3)
        meta_w = _sub_size(w, prefix_bits)
        meta_h = _sub_size(h, prefix_bits)
        raw = _decode_image(br, meta_w, meta_h, allow_meta=False)
        meta_img = [(p >> 8) & 0xFFFF for p in raw]
        num_groups = max(meta_img) + 1

    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise CodecError(f"invalid color cache size {cache_bits}")

    green_size = _GREEN_BASE + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    n = w * h
    px = [0] * n
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits
    pos = 0
    x = 0
    y = 0
    group = groups[0]
    while pos < n:
        if meta_img is not None:
            group = groups[
                meta_img[(y >> prefix_bits) * meta_w + (x >> prefix_bits)]
            ]
        g_dec, r_dec, b_dec, a_dec, d_dec = group
        s = g_dec.read(br)
        if s < 256:
            r = r_dec.read(br)
            b = b_dec.read(br)
            a = a_dec.read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            px[pos] = p
            if cache is not None:
                cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> cache_shift] = p
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < _GREEN_BASE:
            length = _prefix_value(br, s - 256)
            dval = _prefix_value(br, d_dec.read(br))
            if dval > 120:
                dist = dval - 120
            else:
                dx, dy = _DIST_MAP[dval - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise CodecError("LZ77 distance reaches before image start")
            if pos + length > n:
                raise CodecError("LZ77 copy runs past image end")
            for _ in range(length):
                p = px[pos - dist]
                px[pos] = p
                if cache is not None:
                    cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> cache_shift] = p
                pos += 1
            x = pos % w
            y = pos // w
        else:
            if cache is None:
                raise CodecError("color cache symbol without a cache")
            px[pos] = p = cache[s - _GREEN_BASE]
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return px


# --- inverse transforms ------------------------------------------------


def _avg2(a: int, b: int) -> int:
    """Per-channel average of two packed ARGB pixels (floor)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_subtract_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << shift
    return out


def _clamp_add_subtract_half(ave: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        # C truncation toward zero, as the reference decoder computes it
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= (0 if v < 0 else 255 if v > 255 else v) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for shift in (24, 16, 8, 0):
        cl = (l >> shift) & 0xFF
        ct = (t >> shift) & 0xFF
        ctl = (tl >> shift) & 0xFF
        pred = cl + ct - ctl
        p_l += abs(pred - cl)
        p_t += abs(pred - ct)
    return l if p_l < p_t else t


def _add_pixels(residual: int, pred: int) -> int:
    """Per-channel (residual + pred) mod 256."""
    return (
        (((residual & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00)
        | (((residual & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF)
    )


def _inverse_predictor(
    px: list[int], w: int, h: int, size_bits: int, modes: list[int], mw: int
) -> None:
    for y in range(h):
        row = y * w
        for x in range(w):
            pos = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[pos - 1]
            elif x == 0:
                pred = px[pos - w]
            else:
                mode = modes[(y >> size_bits) * mw + (x >> size_bits)]
                l = px[pos - 1]
                t = px[pos - w]
                tl = px[pos - w - 1]
                # rightmost column: TR is the leftmost pixel of this row
                tr = px[row] if x == w - 1 else px[pos - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l, tr), t)
                elif mode == 6:
                    pred = _avg2(l, tl)
                elif mode == 7:
                    pred = _avg2(l, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(l, t, tl)
                elif mode == 12:
                    pred = _clamp_add_subtract_full(l, t, tl)
                elif mode == 13:
                    pred = _clamp_add_subtract_half(_avg2(l, t), tl)
                else:
                    raise CodecError(f"invalid predictor mode {mode}")
            px[pos] = _add_pixels(px[pos], pred)


def _signed8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """(int8)t * (int8)c >> 5 with arithmetic shift."""
    return (_signed8(t) * _signed8(c & 0xFF)) >> 5


def _inverse_color_transform(
    px: list[int], w: int, h: int, size_bits: int, ctes: list[int], mw: int
) -> None:
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            cte = ctes[(y >> size_bits) * mw + (x >> size_bits)]
            g2r = cte & 0xFF  # blue channel of the transform pixel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            p = px[pos]
            green = (p >> 8) & 0xFF
            red = (((p >> 16) & 0xFF) + _ct_delta(g2r, green)) & 0xFF
            blue = ((p & 0xFF) + _ct_delta(g2b, green)) & 0xFF
            blue = (blue + _ct_delta(r2b, red)) & 0xFF
            px[pos] = (p & 0xFF00FF00) | (red << 16) | blue


def _inverse_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


def _inverse_color_indexing(
    px: list[int], packed_w: int, h: int, width_bits: int,
    palette: list[int], out_w: int,
) -> list[int]:
    if width_bits == 0:
        return [
            palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
            for p in px
        ]
    per = 1 << width_bits
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    out = [0] * (out_w * h)
    for y in range(h):
        for x in range(out_w):
            packed = px[y * packed_w + (x >> width_bits)]
            idx = ((packed >> 8) >> ((x % per) * bpp)) & mask
            out[y * out_w + x] = palette[idx] if idx < len(palette) else 0
    return out


def _decode_vp8l(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise CodecError("bad VP8L signature byte")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise CodecError("unsupported VP8L version")
    if w * h > (1 << 26):
        # 64M px: beyond this the pure-Python symbol loop is not a
        # usable decoder anyway, and a corrupt dimension field must not
        # allocate gigabytes before the stream fails
        raise CodecError(f"{w}x{h} exceeds the pure-Python VP8L size cap")

    # transforms: each type at most once; color-indexing reduces the
    # effective width for everything read after it
    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w
    while br.read_bit():
        t = br.read(2)
        if t in seen:
            raise CodecError(f"duplicate VP8L transform {t}")
        seen.add(t)
        if t in (0, 1):  # predictor / color transform
            size_bits = br.read(3) + 2
            mw = _sub_size(xsize, size_bits)
            mh = _sub_size(h, size_bits)
            sub = _decode_image(br, mw, mh, allow_meta=False)
            if t == 0:
                modes = [(p >> 8) & 0xFF for p in sub]
                transforms.append((0, size_bits, modes, mw, xsize))
            else:
                transforms.append((1, size_bits, sub, mw, xsize))
        elif t == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            psize = br.read(8) + 1
            raw = _decode_image(br, psize, 1, allow_meta=False)
            palette = []
            prev = 0
            for p in raw:
                cur = _add_pixels(p, prev)
                palette.append(cur)
                prev = cur
            width_bits = (
                3 if psize <= 2 else 2 if psize <= 4 else 1 if psize <= 16 else 0
            )
            transforms.append((3, width_bits, palette, xsize))
            xsize = _sub_size(xsize, width_bits)

    px = _decode_image(br, xsize, h, allow_meta=True)

    cur_w = xsize
    for tr in reversed(transforms):
        if tr[0] == 3:
            _, width_bits, palette, orig_w = tr
            px = _inverse_color_indexing(px, cur_w, h, width_bits, palette, orig_w)
            cur_w = orig_w
        elif tr[0] == 2:
            _inverse_subtract_green(px)
        elif tr[0] == 1:
            _, size_bits, ctes, mw, _ = tr
            _inverse_color_transform(px, cur_w, h, size_bits, ctes, mw)
        else:
            _, size_bits, modes, mw, _ = tr
            _inverse_predictor(px, cur_w, h, size_bits, modes, mw)

    arr = np.array(px, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if bool((a == 255).all()):
        return np.ascontiguousarray(np.dstack([r, g, b]))
    return np.ascontiguousarray(np.dstack([r, g, b, a]))


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container -> ``(H, W, 3)`` uint8 pixels (``(H, W, 4)``
    when any alpha < 255). Lossless VP8L decodes natively; lossy VP8 and
    animated VP8X refuse with CodecError (decode-or-refuse contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise CodecError("not a WebP (bad RIFF header)")
    pos = 12
    saw_lossy = False
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise CodecError(f"truncated {fourcc!r} chunk")
        if fourcc == b"VP8L":
            return _decode_vp8l(body)
        if fourcc == b"VP8 ":
            saw_lossy = True
        elif fourcc == b"VP8X":
            if len(body) >= 1 and body[0] & 0x02:  # animation flag
                raise CodecError("animated WebP is not supported")
        elif fourcc in (b"ANIM", b"ANMF"):
            raise CodecError("animated WebP is not supported")
        pos += 8 + size + (size & 1)
    if saw_lossy:
        raise CodecError(
            "lossy (VP8) WebP requires a DCT codec profile not implemented; "
            "only lossless VP8L decodes natively"
        )
    raise CodecError("no VP8L chunk in WebP container")


# --- encoder ------------------------------------------------------------


class _BitWriter:
    """LSB-first bit writer; accumulator masked to live bits."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Emit a canonical prefix code MSB-first (DEFLATE convention):
        one bit-reversed LSB-first write, not a loop per bit."""
        self.write(_bit_reverse(code, length), length)

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _huffman_lengths(counts: dict[int, int]) -> dict[int, int]:
    """Optimal prefix code lengths (complete by construction); balanced
    complete-code fallback when depth would exceed the format's 15."""
    import heapq

    syms = sorted(counts)
    if len(syms) <= 2:
        return {s: len(syms) - 1 for s in syms}
    depths: dict[int, int] = {}
    heap2 = [(counts[s], s, s) for s in syms]
    heapq.heapify(heap2)
    # tiebreak ids for merged nodes must be disjoint from symbol values:
    # on (count, tiebreak) ties the heap would otherwise compare an int
    # leaf against a tuple subtree
    tick = max(syms) + 1
    while len(heap2) > 1:
        c1, _, t1 = heapq.heappop(heap2)
        c2, _, t2 = heapq.heappop(heap2)
        tick += 1
        heapq.heappush(heap2, (c1 + c2, tick, (t1, t2)))

    def assign(tree, depth):
        if isinstance(tree, tuple):
            assign(tree[0], depth + 1)
            assign(tree[1], depth + 1)
        else:
            depths[tree] = max(depth, 1)

    assign(heap2[0][2], 0)
    if max(depths.values()) > 15:
        # balanced complete code: 2^k - n symbols at k-1 bits, rest at k
        n = len(syms)
        k = (n - 1).bit_length()
        short = (1 << k) - n
        depths = {s: (k - 1 if i < short else k) for i, s in enumerate(syms)}
    return depths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, sym in sorted((ln, sym) for sym, ln in lengths.items() if ln > 0):
        code <<= ln - prev_len
        prev_len = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _write_prefix_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Serialize one prefix code; returns symbol -> (code, nbits)."""
    used = sorted(s for s, ln in lengths.items() if ln > 0)
    if not used and len(lengths) == 1:
        # constant channel: the single symbol's optimal length is 0 (a
        # zero-bit code) — serialize it as a one-symbol simple code
        used = sorted(lengths)
    if 1 <= len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        first_8bit = 1 if used[0] > 1 else 0
        bw.write(first_8bit, 1)
        bw.write(used[0], 8 if first_8bit else 1)
        if len(used) == 2:
            bw.write(used[1], 8)
            return {used[0]: (0, 1), used[1]: (1, 1)}
        return {used[0]: (0, 0)}

    bw.write(0, 1)  # code-length-coded
    max_used = max(used)
    emit = [lengths.get(s, 0) for s in range(max_used + 1)]
    clc_counts: dict[int, int] = {}
    for ln in emit:
        clc_counts[ln] = clc_counts.get(ln, 0) + 1
    clc_lengths = _huffman_lengths(clc_counts)
    if len(clc_lengths) == 1:
        # one distinct code length in `emit` (dense equal-length code):
        # serialize the lone CLC symbol with a nonzero length so the
        # decoder sees it; single-symbol codes then read ZERO bits per
        # emitted length (both sides of the convention must agree)
        clc_lengths = {next(iter(clc_lengths)): 1}
    if max(clc_lengths.values()) > 7:
        n = len(clc_lengths)
        k = (n - 1).bit_length()
        short = (1 << k) - n
        clc_lengths = {
            s: (k - 1 if i < short else k)
            for i, s in enumerate(sorted(clc_lengths))
        }
    full_clc = [clc_lengths.get(i, 0) for i in range(19)]
    last = max(i for i in range(19) if full_clc[_CLC_ORDER[i]] > 0)
    num_clc = max(4, last + 1)
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(full_clc[_CLC_ORDER[i]], 3)

    max_symbol = max_used + 1
    if max_symbol < alphabet_size:
        bw.write(1, 1)
        value = max_symbol - 2
        k = 0
        while value >= (1 << (2 + 2 * k)):
            k += 1
        bw.write(k, 3)
        bw.write(value, 2 + 2 * k)
    else:
        bw.write(0, 1)

    clc_codes = _canonical_codes(clc_lengths)
    if len(clc_codes) == 1:
        clc_codes = {next(iter(clc_codes)): (0, 0)}
    for ln in emit:
        code, nb = clc_codes[ln]
        bw.write_code(code, nb)
    return _canonical_codes(lengths)


def encode_webp(arr: np.ndarray) -> bytes:
    """Lossless VP8L encoder: literal-only, per-channel optimal prefix
    codes, no transforms. Accepts ``(H, W)``/``(H, W, 1)`` grayscale,
    ``(H, W, 3)`` RGB, or ``(H, W, 4)`` RGBA uint8; round-trips
    bit-exactly through :func:`decode_webp`."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3, 4):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = arr.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError(f"dimensions {w}x{h} out of VP8L range")
    if ch == 1:
        r = g = b = arr[:, :, 0].ravel()
        a = None
    else:
        r, g, b = (arr[:, :, i].ravel() for i in range(3))
        a = arr[:, :, 3].ravel() if ch == 4 else None
    if a is None:
        a = np.full(h * w, 255, dtype=np.uint8)
    alpha_used = bool((a != 255).any())

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta prefix-code image
    bw.write(0, 1)  # no color cache

    def hist(v: np.ndarray) -> dict[int, int]:
        vals, counts = np.unique(v, return_counts=True)
        return {int(s): int(c) for s, c in zip(vals, counts)}

    g_codes = _write_prefix_code(bw, _huffman_lengths(hist(g)), _GREEN_BASE)
    r_codes = _write_prefix_code(bw, _huffman_lengths(hist(r)), 256)
    b_codes = _write_prefix_code(bw, _huffman_lengths(hist(b)), 256)
    a_codes = _write_prefix_code(bw, _huffman_lengths(hist(a)), 256)
    _write_prefix_code(bw, {0: 1}, 40)  # unused distance code: 1 symbol

    for gv, rv, bv, av in zip(g, r, b, a):
        c, n = g_codes[int(gv)]
        bw.write_code(c, n)
        c, n = r_codes[int(rv)]
        bw.write_code(c, n)
        c, n = b_codes[int(bv)]
        bw.write_code(c, n)
        c, n = a_codes[int(av)]
        bw.write_code(c, n)

    vp8l = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
