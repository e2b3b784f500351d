"""Minimal multi-frame video container — the third modality's
in-sandbox codec (round 9), completing the PNG (functions/png.py) and
WAV (functions/wav.py) seam closures.

Real video is MP4/H.264 — ffmpeg/pyav territory the container cannot
ship — but the OPERATOR surface a pipeline needs (container parse,
frame extraction, frame sampling, per-frame decode, temporal
fingerprint) does not depend on the codec. `FSTK` is an honest stand-in
with real byte-level structure: magic + frame count + a length-prefixed
index + concatenated intra-coded frames, each frame a REAL PNG decoded
by the pure-stdlib codec. Production swaps the per-frame decode for
ffmpeg behind the same two functions.

Layout:  b"FSTK" | u32 n_frames | u32 len[i] * n | frame bytes...
(big-endian, matching PNG chunk convention).
"""

from __future__ import annotations

import struct

_MAGIC = b"FSTK"


def encode_framestack(frames: list[bytes]) -> bytes:
    """Pack encoded frame payloads (e.g. PNG bytes) into one container."""
    out = bytearray(_MAGIC)
    out.extend(struct.pack(">I", len(frames)))
    for f in frames:
        out.extend(struct.pack(">I", len(f)))
    for f in frames:
        out.extend(f)
    return bytes(out)


def decode_framestack(data: bytes) -> list[bytes]:
    """Unpack a container into its frame payloads. Raises ValueError on
    structural corruption (bad magic, truncated index or body)."""
    if len(data) < 8 or data[:4] != _MAGIC:
        raise ValueError("not a framestack (bad magic)")
    (n,) = struct.unpack(">I", data[4:8])
    pos = 8
    if len(data) < pos + 4 * n:
        raise ValueError("truncated framestack index")
    lens = struct.unpack(f">{n}I", data[pos : pos + 4 * n])
    pos += 4 * n
    frames = []
    for ln in lens:
        if len(data) < pos + ln:
            raise ValueError("truncated framestack body")
        frames.append(data[pos : pos + ln])
        pos += ln
    return frames
