"""GIF codec: lossless round trips, LZW symmetry at every code width,
interlaced and transparent decode against hand-built streams, and the
loud-failure contract for malformed payloads. No Spark needed — this
pins the byte-level layer under cpdd_spark.multimodal's decode path,
like test_codecs.py (PNG/BMP/netpbm) and test_jpeg.py do."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cpdd_spark.codecs import CodecError
from cpdd_spark.gif import _lzw_decode, _lzw_encode, decode_gif, encode_gif


@pytest.mark.parametrize(
    "shape", [(1, 1), (3, 32), (13, 21), (64, 32), (200, 300)]
)
def test_gray_roundtrip_lossless(shape):
    """Grayscale uses the identity 256-gray palette, so decode(encode(a))
    replicates the exact bytes into all three channels — including the
    (200, 300) case, which drives LZW through a 4096-entry table reset."""
    rng = np.random.default_rng(hash(shape) % (2**32))
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = decode_gif(encode_gif(a))
    assert dec.shape == (*shape, 3)
    for c in range(3):
        assert (dec[:, :, c] == a).all()


def test_rgb_roundtrip_exact_palettization():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    rgb = pal[rng.integers(0, len(pal), size=(40, 30))]
    assert (decode_gif(encode_gif(rgb)) == rgb).all()


def test_rgb_too_many_colors_refuses():
    """>256 distinct colors: the encoder palettizes exactly, never
    quantizes silently."""
    h = np.arange(300, dtype=np.uint16)
    img = np.stack(
        [(h % 256), (h // 256), np.zeros_like(h)], axis=-1
    ).astype(np.uint8).reshape(300, 1, 3)
    with pytest.raises(CodecError):
        encode_gif(img)


def test_hw1_equals_hw():
    a = np.arange(96, dtype=np.uint8).reshape(8, 12)
    assert encode_gif(a[:, :, None]) == encode_gif(a)


@pytest.mark.parametrize("mcs", list(range(2, 9)))
def test_lzw_symmetry_every_code_size(mcs):
    rng = np.random.default_rng(mcs)
    data = rng.integers(0, 1 << mcs, size=5000).astype(np.uint8).tobytes()
    assert bytes(_lzw_decode(_lzw_encode(data, mcs), mcs, len(data))) == data


def _reencode(payload: bytes, *, interlace: bool = False,
              gce: bytes | None = None) -> bytes:
    """Rebuild an encode_gif stream with an interlace row permutation
    and/or a Graphic Control Extension spliced in — the spec features the
    encoder deliberately doesn't emit, exercised decoder-side."""
    assert payload[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", payload, 6)
    gct_end = 13 + 3 * 256
    gct = payload[13:gct_end]
    # image descriptor (10 bytes incl. introducer) then mcs byte
    desc_end = gct_end + 10
    mcs = payload[desc_end]
    data = bytearray()
    pos = desc_end + 1
    while payload[pos]:
        size = payload[pos]
        data += payload[pos + 1 : pos + 1 + size]
        pos += 1 + size
    idx = np.frombuffer(
        bytes(_lzw_decode(bytes(data), mcs, w * h)), dtype=np.uint8
    ).reshape(h, w)
    ipacked = 0
    if interlace:
        order = np.concatenate(
            [np.arange(f, h, s) for f, s in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        idx = idx[order]  # rows stored in pass order
        ipacked |= 0x40
    out = bytearray(payload[:gct_end])
    if gce is not None:
        out += b"\x21\xf9" + bytes((len(gce),)) + gce + b"\x00"
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ipacked)
    out.append(mcs)
    lzw = _lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_interlaced_decode_matches_sequential():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    seq = encode_gif(a)
    inter = _reencode(seq, interlace=True)
    assert inter != seq
    assert (decode_gif(inter) == decode_gif(seq)).all()


def test_transparency_yields_alpha_channel():
    a = np.array([[0, 7], [7, 0]], dtype=np.uint8)
    # GCE: transparency flag set, transparent index 7
    payload = _reencode(encode_gif(a), gce=b"\x01\x00\x00\x07")
    dec = decode_gif(payload)
    assert dec.shape == (2, 2, 4)
    assert (dec[:, :, 3] == np.where(a == 7, 0, 255)).all()
    assert (dec[:, :, 0] == a).all()
    # GCE present but transparency flag clear -> plain RGB
    opaque = decode_gif(_reencode(encode_gif(a), gce=b"\x00\x00\x00\x07"))
    assert opaque.shape == (2, 2, 3)


def test_malformed_payloads_raise_codec_error():
    good = encode_gif(np.arange(64, dtype=np.uint8).reshape(8, 8))
    cases = {
        "bad signature": b"NOPE" + good[4:],
        "truncated header": b"GIF89a",
        "no image descriptor": b"GIF89a" + b"\x00" * 16,
        "truncated data": good[: len(good) // 2],
    }
    for name, payload in cases.items():
        with pytest.raises(CodecError):
            decode_gif(payload)
    # LZW code past the table
    with pytest.raises(CodecError):
        _lzw_decode(b"\xff\xff\xff\xff", 8, 64)


def test_first_frame_of_animation():
    """Multiple image descriptors (an animation): the decoder returns the
    FIRST frame and ignores the rest — stills semantics, documented."""
    a = np.full((4, 4), 9, dtype=np.uint8)
    b = np.full((4, 4), 200, dtype=np.uint8)
    one, two = encode_gif(a), encode_gif(b)
    # splice frame b's descriptor+data before frame a's trailer
    gct_end = 13 + 3 * 256
    anim = one[:-1] + two[gct_end:]
    assert (decode_gif(anim)[:, :, 0] == a).all()
