"""Pure-Python WAV (RIFF/WAVE PCM) codec.

The multimodal tier treats audio as opaque ``binary`` payloads; this
module gives the AUDIO modality the same footing the image formats got
in codecs.py/jpeg.py/gif.py: a from-spec decoder on stdlib ``struct`` +
numpy with correct samples or a loud
:class:`~cpdd_spark.codecs.CodecError`, and an encoder so fixtures can
render deterministic genuine containers.

Decoder scope: canonical RIFF/WAVE with integer PCM (format tag 1) or
WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping PCM, 8-bit unsigned or
16/24/32-bit signed little-endian samples, any channel count, chunk
walking that tolerates the optional pad byte and unknown chunks
(LIST/fact/cue are skipped, as the spec directs). Compressed formats
(ADPCM, mu-law, MP3-in-WAV) raise ``CodecError`` — decode-or-refuse,
never a silent stand-in. Output is normalized to int16 ``(n_samples,
n_channels)`` (8-bit is re-centered and scaled, 24/32-bit truncate
their low bits), plus the sample rate.

Encoder scope: 16-bit PCM, mono or multi-channel, the canonical
44-byte-header single-``data``-chunk layout every reader accepts.

Reference analogue: cpdd streams media files as opaque bytes
(/root/reference/src/cpdd/matching.c:30-59); the decode tier is axis-B
scope from SURVEY.md §2.3 T13, which cpdd never needed.
"""

from __future__ import annotations

import struct

import numpy as np

from cpdd_spark.codecs import CodecError

_PCM_TAGS = (1, 0xFFFE)  # integer PCM / EXTENSIBLE (subformat checked)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> ``(samples int16 (n, channels), rate)``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError("not a WAV (bad RIFF/WAVE signature)")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        body = payload[pos : pos + size]
        if len(body) < size:
            raise CodecError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
            break  # canonical layout: data is last; nothing else needed
        pos += size + (size & 1)  # chunks are word-aligned (pad byte)
    if fmt is None:
        raise CodecError("missing fmt chunk")
    if data is None:
        raise CodecError("missing data chunk")
    if len(fmt) < 16:
        raise CodecError(f"fmt chunk too short ({len(fmt)} bytes)")
    tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag not in _PCM_TAGS:
        raise CodecError(
            f"compressed WAV (format tag 0x{tag:04x}) — only integer PCM "
            "decodes natively"
        )
    if tag == 0xFFFE:
        # EXTENSIBLE: the real format is the first 2 bytes of the GUID at
        # offset 24 of the fmt body
        if len(fmt) < 26:
            raise CodecError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (sub,) = struct.unpack_from("<H", fmt, 24)
        if sub != 1:
            raise CodecError(f"EXTENSIBLE subformat 0x{sub:04x} is not PCM")
    if channels == 0 or rate == 0:
        raise CodecError(f"degenerate fmt: channels={channels} rate={rate}")
    if bits not in (8, 16, 24, 32):
        raise CodecError(f"unsupported PCM bit depth {bits}")
    bytes_per = bits // 8
    frame = bytes_per * channels
    usable = len(data) - (len(data) % frame)
    if usable == 0:
        raise CodecError("empty data chunk")
    raw = data[:usable]
    if bits == 8:  # unsigned, re-center to int16 range
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
        s = (s - 128) << 8
    elif bits == 16:
        s = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    else:  # 24/32-bit: keep the top 16 bits
        if bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            s = ((b[:, 2].astype(np.int32) << 24)
                 | (b[:, 1].astype(np.int32) << 16)
                 | (b[:, 0].astype(np.int32) << 8)) >> 16
        else:
            s = np.frombuffer(raw, dtype="<i4") >> 16
        s = s.astype(np.int16)
    return s.reshape(-1, channels), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """``(n,)`` or ``(n, channels)`` int16 -> canonical PCM16 WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0:
        raise CodecError(f"cannot encode sample array of shape {samples.shape}")
    n, channels = s.shape
    if sample_rate <= 0:
        raise CodecError(f"invalid sample rate {sample_rate}")
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    out = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return out
