"""VMJ1 — a deterministic synthetic video container for offline tests.

A real 100 TB corpus carries MP4/WebM; those demuxers are not in this
container, so the engine's video path is exercised against a trivial
frame-concat container with the SAME operator contract (opaque binary
column in, one row per sampled frame out). A cluster build swaps an
ffmpeg/pyav demux into :func:`demux_video` without touching any plan.

Layout (little-endian):
  magic 'VMJ1' | u16 n_frames | u16 fps | n_frames × (u32 len | payload)

Frame payloads are complete still-image payloads (PNG or the LJQ1 lossy
codec) so the image decode/feature operators compose directly on the
sampled frames.
"""

from __future__ import annotations

import struct

MAGIC = b"VMJ1"


def encode_video(frames: list[bytes], fps: int = 10) -> bytes:
    """Pack still-image payloads into a VMJ1 container."""
    if len(frames) > 0xFFFF:
        raise ValueError("VMJ1 caps at 65535 frames")
    parts = [MAGIC, struct.pack("<HH", len(frames), fps)]
    for f in frames:
        parts.append(struct.pack("<I", len(f)))
        parts.append(f)
    return b"".join(parts)


def demux_video(data: bytes) -> tuple[list[bytes], int]:
    """Unpack a VMJ1 container -> (frame payloads, fps)."""
    if data[:4] != MAGIC:
        raise NotImplementedError(
            "only the VMJ1 synthetic container demuxes offline; "
            "real MP4/WebM demux slots in here on a cluster"
        )
    n, fps = struct.unpack_from("<HH", data, 4)
    off = 8
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        frames.append(data[off:off + ln])
        off += ln
    return frames, fps
