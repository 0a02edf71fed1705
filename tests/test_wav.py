"""WAV codec: round trips, bit-depth normalization, chunk-walk
tolerance, and the loud-failure contract. No Spark needed — this pins
the byte-level layer under cpdd_spark.multimodal's audio path, like
test_codecs/test_jpeg/test_gif do for the image containers."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cpdd_spark.codecs import CodecError
from cpdd_spark.wav import decode_wav, encode_wav


def _wav(body: bytes, *, tag: int = 1, channels: int = 1, rate: int = 8000,
         bits: int = 8, extra_chunks: bytes = b"") -> bytes:
    fmt = struct.pack(
        "<HHIIHH", tag, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + extra_chunks
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


@pytest.mark.parametrize("shape", [(1,), (100,), (4096,), (777, 2), (5, 3)])
def test_pcm16_roundtrip(shape):
    rng = np.random.default_rng(hash(shape) % (2**32))
    s = rng.integers(-32768, 32768, size=shape).astype(np.int16)
    dec, rate = decode_wav(encode_wav(s, 16000))
    want = s[:, None] if s.ndim == 1 else s
    assert rate == 16000
    assert dec.shape == want.shape and (dec == want).all()


def test_8bit_recentred():
    d, _ = decode_wav(_wav(bytes(range(256)), bits=8))
    assert d[0, 0] == -32768 and d[128, 0] == 0 and d[255, 0] == 127 << 8


def test_24_and_32_bit_keep_top_16():
    # 24-bit: one sample 0x123456 (LE bytes 56 34 12) -> top 16 = 0x1234
    d, _ = decode_wav(_wav(b"\x56\x34\x12", bits=24))
    assert d[0, 0] == 0x1234
    d, _ = decode_wav(_wav(struct.pack("<i", -(0x7654 << 16)), bits=32))
    assert d[0, 0] == -0x7654


def test_unknown_chunks_skipped_and_extensible_pcm():
    body = struct.pack("<4h", 1, -2, 3, -4)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    d, _ = decode_wav(_wav(body, bits=16, extra_chunks=extra))
    assert (d[:, 0] == [1, -2, 3, -4]).all()
    # EXTENSIBLE wrapping PCM decodes; wrapping anything else refuses
    guid_pcm = struct.pack("<H", 1) + bytes(14)  # subformat tag + GUID tail
    ext_fmt = (
        struct.pack("<HHIIHHHHI", 0xFFFE, 1, 8000, 16000, 2, 16, 22, 16, 1)
        + guid_pcm
    )
    p = (b"RIFF" + struct.pack("<I", 4 + 8 + len(ext_fmt) + 8 + len(body))
         + b"WAVE" + b"fmt " + struct.pack("<I", len(ext_fmt)) + ext_fmt
         + b"data" + struct.pack("<I", len(body)) + body)
    d, _ = decode_wav(p)
    assert (d[:, 0] == [1, -2, 3, -4]).all()
    bad = p.replace(guid_pcm, struct.pack("<H", 2) + bytes(14))
    with pytest.raises(CodecError):
        decode_wav(bad)


def test_malformed_payloads_raise_codec_error():
    good = encode_wav(np.arange(16, dtype=np.int16))
    cases = {
        "bad signature": b"RIFX" + good[4:],
        "truncated": good[:30],
        "no data chunk": good.replace(b"data", b"datx"),
        "compressed tag": _wav(b"abcd", tag=2, bits=8),
        "zero channels": _wav(b"abcd", channels=0, bits=8),
        "odd bit depth": _wav(b"abcd", bits=12),
    }
    for name, payload in cases.items():
        with pytest.raises(CodecError):
            decode_wav(payload)


def test_trailing_partial_frame_dropped():
    body = struct.pack("<3h", 5, 6, 7) + b"\x01"  # 3 samples + 1 stray byte
    d, _ = decode_wav(_wav(body, bits=16))
    assert d.shape == (3, 1)
