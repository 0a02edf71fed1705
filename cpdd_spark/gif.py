"""Pure-Python GIF87a/GIF89a codec (LZW, palette, interlace).

Closes the next slice of the multimodal decode boundary after
codecs.py (PNG/BMP/netpbm) and jpeg.py (baseline JPEG): GIF is the one
remaining image container that still shows up at percent-level rates in
web-scraped corpora. Same contract as its siblings — a from-spec
implementation on stdlib + numpy, no imaging library, correct pixels or
a loud :class:`~cpdd_spark.codecs.CodecError`.

Decoder scope: GIF87a and GIF89a, global and local color tables,
interlaced and sequential scan order, Graphic Control Extension
transparency (decoded to an RGBA alpha channel), first frame of an
animation (the feature tier treats media as stills; subsequent frames
are additional image descriptors and are deliberately not composited).
Malformed streams — truncated blocks, LZW codes past the table, missing
palettes, out-of-range palette indices — raise ``CodecError``.

Encoder scope: single-frame GIF89a from a grayscale ``(H, W)`` /
``(H, W, 1)`` raster (identity 256-gray palette) or an ``(H, W, 3)``
RGB raster with at most 256 distinct colors (exact palettization; more
colors raise ``CodecError`` rather than silently quantizing). Standard
variable-width LZW with a table reset at 4096 entries, so any compliant
reader decodes it.

The LZW inner loops are interpreted Python, like jpeg.py's Huffman walk
— honest for correctness-tier decode of fixture/small media, not a
throughput claim (the Arrow-batched ``mapInPandas`` plumbing around the
kernel is the part that scales; swap the kernel for a native library on
a cluster that has one).

Reference analogue: cpdd streams media files as opaque bytes
(/root/reference/src/cpdd/matching.c:30-59); the decode tier is axis-B
scope from SURVEY.md §2.3 T13, which cpdd never needed.
"""

from __future__ import annotations

import struct

import numpy as np

from cpdd_spark.codecs import CodecError

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (first row, step)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-flavor LZW: LSB-first bit packing, variable code width
    ``min_code_size+1 .. 12``, clear/end-of-information codes. Returns
    exactly ``n_pixels`` palette indices or raises ``CodecError``."""
    if not 2 <= min_code_size <= 11:
        raise CodecError(f"LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table() -> list[bytes]:
        return [bytes((i,)) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    out = bytearray()
    acc = 0  # bit accumulator, LSB-first
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = fresh_table()
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) < n_pixels:
                    raise CodecError(
                        f"LZW end-of-information after {len(out)} of "
                        f"{n_pixels} pixels"
                    )
                return out[:n_pixels]
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise CodecError(f"LZW code {code} past table of {len(table)}")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                # width grows when the NEXT code could address the new slot
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                # a final multi-byte entry may spill past the raster;
                # excess indices are padding, not pixels
                return out[:n_pixels]
    raise CodecError(
        f"LZW stream exhausted after {len(out)} of {n_pixels} pixels"
    )


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0-length terminator)."""
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise CodecError("truncated sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise CodecError("truncated sub-block")
        chunks.append(payload[pos : pos + size])
        pos += size


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to ``(H, W, 3)`` uint8 pixels —
    ``(H, W, 4)`` when the frame's Graphic Control Extension declares a
    transparent index (alpha 0 there, 255 elsewhere)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a GIF (bad signature)")
    if len(payload) < 13:
        raise CodecError("truncated logical screen descriptor")
    _, _, packed, _, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        end = pos + 3 * n_colors
        if end > len(payload):
            raise CodecError("truncated global color table")
        gct = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end

    transparent: int | None = None
    while True:
        if pos >= len(payload):
            raise CodecError("no image descriptor before end of stream")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise CodecError("no image descriptor before GIF trailer")
        if block == 0x21:  # extension: label + sub-block chain
            if pos >= len(payload):
                raise CodecError("truncated extension block")
            label = payload[pos]
            data, pos = _read_subblocks(payload, pos + 1)
            if label == 0xF9 and len(data) >= 4 and data[0] & 0x01:
                transparent = data[3]
            continue
        if block != 0x2C:
            raise CodecError(f"unknown GIF block introducer 0x{block:02x}")
        break

    if pos + 9 > len(payload):
        raise CodecError("truncated image descriptor")
    _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if w == 0 or h == 0:
        raise CodecError(f"degenerate image dimensions {w}x{h}")
    palette = gct
    if ipacked & 0x80:  # local color table wins
        n_colors = 2 << (ipacked & 0x07)
        end = pos + 3 * n_colors
        if end > len(payload):
            raise CodecError("truncated local color table")
        palette = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(-1, 3)
        pos = end
    if palette is None:
        raise CodecError("image has neither global nor local color table")

    if pos >= len(payload):
        raise CodecError("missing LZW minimum code size")
    min_code_size = payload[pos]
    data, _ = _read_subblocks(payload, pos + 1)
    idx = np.frombuffer(
        bytes(_lzw_decode(data, min_code_size, w * h)), dtype=np.uint8
    ).reshape(h, w)
    if int(idx.max(initial=0)) >= len(palette):
        raise CodecError(
            f"palette index {int(idx.max())} >= palette size {len(palette)}"
        )
    if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
        order = np.concatenate(
            [np.arange(first, h, step) for first, step in _INTERLACE_PASSES]
        )
        deinterlaced = np.empty_like(idx)
        deinterlaced[order] = idx
        idx = deinterlaced
    rgb = palette[idx]
    if transparent is None:
        return np.ascontiguousarray(rgb)
    alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
    return np.dstack([rgb, alpha])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Variable-width GIF LZW encode with an initial clear code and a
    table reset at 4096 entries."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes((i,)): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes((b,))
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        # the decoder widens when ITS table reaches 2^width; its table is
        # one entry behind the encoder's at read time, so widen after
        # assigning next_code and before the code that needs the new width
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes((b,))
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr: np.ndarray) -> bytes:
    """Encode a raster as a single-frame GIF89a.

    Grayscale ``(H, W)`` / ``(H, W, 1)`` uses the identity 256-gray
    palette (index == luminance byte, lossless round trip). RGB
    ``(H, W, 3)`` is exactly palettized; more than 256 distinct colors
    raise ``CodecError`` — this is a correctness-tier encoder, not a
    quantizer."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 1:
        a = a[:, :, 0]
    if a.ndim == 2:
        palette = np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3)
        indices = np.ascontiguousarray(a)
    elif a.ndim == 3 and a.shape[2] == 3:
        flat = a.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise CodecError(
                f"{len(palette)} distinct colors exceed GIF's 256-entry "
                "palette (this encoder palettizes exactly, it does not "
                "quantize)"
            )
        palette = np.vstack(
            [palette, np.zeros((256 - len(palette), 3), dtype=np.uint8)]
        )
        indices = inverse.astype(np.uint8).reshape(a.shape[:2])
    else:
        raise CodecError(f"unsupported raster shape {a.shape}")

    h, w = indices.shape
    if h == 0 or w == 0 or w > 0xFFFF or h > 0xFFFF:
        raise CodecError(f"dimensions {w}x{h} out of GIF range")
    out = bytearray(b"GIF89a")
    # 256-entry GCT: size field 7 (2 << 7 == 256), color resolution 8 bits
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | 7, 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    min_code_size = 8
    out.append(min_code_size)
    lzw = _lzw_encode(indices.tobytes(), min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # sub-block terminator + trailer
    return bytes(out)
