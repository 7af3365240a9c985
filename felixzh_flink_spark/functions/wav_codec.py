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


def resample_linear(samples: "list[int]", channels: int,
                    src_rate: int, dst_rate: int) -> "list[int]":
    """Linear-interpolation resampling of interleaved integer PCM at a
    rational rate ratio, in EXACT integer arithmetic: output instant t
    of a channel maps to source position t·src/dst, i.e. index
    i = (t·src)//dst with fractional numerator num = (t·src) mod dst,
    and y[t] = floor((s[i]·(dst−num) + s[i+1]·num) / dst) (last sample
    replicated at the tail). The floor is computed in a NON-NEGATIVE
    domain (samples shifted by +2^15 first): Python's // floors while
    DuckDB's // truncates toward zero, so keeping every division
    non-negative is what lets a SQL oracle reproduce the resampled
    stream bit-for-bit. Output length per channel is
    (n_per_channel·dst)//src (duration-preserving floor)."""
    if channels < 1 or len(samples) % channels:
        raise ValueError("sample count must be a multiple of channels")
    if src_rate <= 0 or dst_rate <= 0:
        raise ValueError("rates must be positive")
    n_per = len(samples) // channels
    if n_per == 0:
        return []
    n_out = (n_per * dst_rate) // src_rate
    out = [0] * (n_out * channels)
    for c in range(channels):
        u = [samples[j * channels + c] + 32768 for j in range(n_per)]
        for t in range(n_out):
            pos = t * src_rate
            i = pos // dst_rate
            num = pos % dst_rate
            i1 = min(i + 1, n_per - 1)
            y = (u[i] * (dst_rate - num) + u[i1] * num) // dst_rate
            out[t * channels + c] = y - 32768
    return out
