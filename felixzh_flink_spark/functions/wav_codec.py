"""Pure-Python WAV (RIFF PCM) codec — the real audio kernel behind the
multimodal decode stub, companion to `png_codec`.

WAV PCM is uncompressed (public RIFF/WAVE spec), so "decode" is chunk
walking + sample unpacking — no codec library needed. Supports the
canonical integer PCM envelope a fixture/ingest path produces: 8-bit
unsigned and 16/24/32-bit signed little-endian, any channel count,
arbitrary extra chunks (LIST/fact/...) before or after `data`. Anything
else (float PCM, extensible format, A-law...) raises loudly.

Cost model: O(bytes) per file in Python, inside the Arrow-batched
`mapInPandas` stage (`multimodal.wav_pcm_stats`) — the documented slow
path for sample-level work; real deployments swap a native reader in
via `multimodal.require_codec` without touching the Spark plan.
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int = 16_000,
               channels: int = 1, bits: int = 16) -> bytes:
    """Canonical RIFF/WAVE: fmt chunk (PCM) + data chunk. `samples` are
    interleaved frames; length must divide evenly by `channels`."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    width = bits // 8
    lo, hi = ((0, 255) if bits == 8
              else (-(1 << (bits - 1)), (1 << (bits - 1)) - 1))
    body = bytearray()
    for s in samples:
        if not lo <= s <= hi:
            raise ValueError(f"sample {s} out of {bits}-bit range")
        body += (s.to_bytes(1, "little") if bits == 8
                 else s.to_bytes(width, "little", signed=True))
    byte_rate = sample_rate * channels * width
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * width, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + bytes(body))
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, channels, bits, interleaved samples) from a RIFF
    PCM WAV. Walks the chunk stream (word-aligned, unknown chunks
    skipped), so files with LIST/fact/cue chunks decode fine. Raises
    ValueError on non-WAV, non-integer-PCM, or truncated input."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            data = body
        pos += 8 + length + (length & 1)    # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
        "<HHIIHH", fmt[:16])
    if audio_fmt != 1:
        raise ValueError(f"unsupported audio format {audio_fmt} (PCM only)")
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    width = bits // 8
    if len(data) % width:
        raise ValueError("data chunk not sample-aligned")
    if bits == 8:
        samples = list(data)
    else:
        samples = [int.from_bytes(data[i:i + width], "little", signed=True)
                   for i in range(0, len(data), width)]
    return rate, channels, bits, samples
