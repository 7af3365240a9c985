"""Pure-stdlib MJPEG-in-AVI container codec — a REAL video format.

Motion JPEG inside a RIFF/AVI container is the classic
one-JPEG-per-frame video format (still emitted by cameras and
`ffmpeg -c:v mjpeg`). With `functions/jpeg_codec` now decoding real
color JPEGs, this module closes the "video frame decode" gap as far as
a pure-stdlib pipeline honestly can: `encode_mjpeg_avi` writes a
genuine AVI (RIFF header, `hdrl` with avih/strh/strf, `movi` LIST of
`00dc` frame chunks with RIFF even-padding, and an `idx1` index);
`parse_mjpeg_avi` walks the chunk tree back to the frame timing and the
per-frame JPEG payloads, which `multimodal.avi_frame_sample_stats`
then pixel-decodes at sampled instants. Inter-frame-predicted codecs
(H.264 etc.) remain honestly out of scope (`multimodal.require_codec`).

Supported envelope: single 'vids' stream, MJPG fourcc, frame chunks
`00dc`/`00db`. Anything else raises ValueError — wrong-but-plausible
frames are worse than a loud error in a data pipeline.
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + size + body, zero-padded to even length
    (the pad byte is not counted in size)."""
    out = fourcc + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        out += b"\x00"
    return out


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_mjpeg_avi(width: int, height: int, usec_per_frame: int,
                     jpeg_frames: "list[bytes]") -> bytes:
    """Encode JPEG payloads as an MJPEG AVI at a fixed frame duration
    (`usec_per_frame` microseconds, the avih/strh timing contract)."""
    if not jpeg_frames:
        raise ValueError("video needs at least one frame")
    if usec_per_frame <= 0:
        raise ValueError("usec_per_frame must be positive")
    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0x10,      # AVIF_HASINDEX
        n, 0, 1, max_size, width, height, 0, 0, 0, 0)
    # dwScale/dwRate: frame duration = scale/rate seconds = usec/1e6
    strh = (b"vids" + b"MJPG"
            + struct.pack("<10I", 0, 0, 0, usec_per_frame, 1_000_000,
                          0, n, max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<I2i2H6I", 40, width, height, 1, 24,
                       struct.unpack("<I", b"MJPG")[0],
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"movi"
    offsets = []
    for f in jpeg_frames:
        offsets.append(len(movi_body))          # offset of ckid from 'movi'
        movi_body += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))
        for off, f in zip(offsets, jpeg_frames))
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return _chunk(b"RIFF", riff_body)


def parse_mjpeg_avi(payload: bytes
                    ) -> "tuple[int, int, int, list[bytes]]":
    """Parse an MJPEG AVI to (width, height, usec_per_frame,
    [jpeg payload, ...]). Walks the RIFF tree (hdrl for timing and
    geometry, movi for `00dc`/`00db` frame chunks, even-padding
    honored), validates the stream is MJPG video, and checks the frame
    count against the header."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(len(payload), 8 + riff_size)
    width = height = usec = n_frames = None
    frames: list[bytes] = []
    saw_mjpg = False

    def walk(pos: int, stop: int) -> None:
        nonlocal width, height, usec, n_frames, saw_mjpg
        while pos + 8 <= stop:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
            body0, body1 = pos + 8, pos + 8 + size
            if body1 > stop:
                raise ValueError(f"truncated chunk {fourcc!r}")
            if fourcc == b"LIST":
                kind = payload[body0:body0 + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(body0 + 4, body1)
            elif fourcc == b"avih":
                usec, = struct.unpack("<I", payload[body0:body0 + 4])
                n_frames, = struct.unpack("<I",
                                          payload[body0 + 16:body0 + 20])
                width, height = struct.unpack(
                    "<II", payload[body0 + 32:body0 + 40])
            elif fourcc == b"strh":
                if payload[body0:body0 + 4] == b"vids":
                    if payload[body0 + 4:body0 + 8] != b"MJPG":
                        raise ValueError("only MJPG video streams "
                                         "supported")
                    saw_mjpg = True
            elif fourcc in (b"00dc", b"00db"):
                frames.append(payload[body0:body1])
            pos = body1 + (size % 2)             # even padding

    walk(12, end)
    if width is None or usec is None or usec <= 0:
        raise ValueError("missing avih header")
    if not saw_mjpg:
        raise ValueError("no MJPG video stream")
    if not frames:
        raise ValueError("no frame chunks in movi")
    if n_frames is not None and n_frames != len(frames):
        raise ValueError(
            f"header says {n_frames} frames, movi has {len(frames)}")
    return int(width), int(height), int(usec), frames
