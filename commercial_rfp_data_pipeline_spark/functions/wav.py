"""Minimal pure-Python WAV (RIFF/PCM) codec — the audio sibling of
functions/png.py (round 8): the container has no torchaudio/ffmpeg,
but PCM WAV is just struct parsing, so the audio half of the
multimodal decode seam can be REAL in-sandbox too.

Supports 16-bit PCM, mono or interleaved multi-channel. ``encode_wav``
exists so tests can manufacture byte-distinct re-encodings of the same
signal (e.g. gain-scaled copies) — the class of duplicate perceptual
audio hashing exists to catch.
"""

from __future__ import annotations

import struct


def encode_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """16-bit PCM WAV from interleaved int samples (clipped to int16)."""
    clipped = [max(-32768, min(32767, int(s))) for s in samples]
    data = struct.pack(f"<{len(clipped)}h", *clipped)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    return (
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


def decode_wav(data: bytes) -> dict:
    """Decode 16-bit PCM WAV. Returns {"sample_rate", "n_channels",
    "n_samples", "samples"} with samples as a flat interleaved list of
    ints. Raises ValueError on anything that is not supported PCM."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only 16-bit PCM in-sandbox"
        )
    n = len(raw) // 2
    samples = list(struct.unpack(f"<{n}h", raw[: n * 2]))
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n // max(1, n_channels),
        "samples": samples,
    }


def energy_grid(
    samples: list[int],
    n_channels: int = 1,
    grid: int = 8,
) -> list[int]:
    """Time x frequency-band mean-energy grid — the audio analogue of
    png.luma_grid: the signal (downmixed to mono) is cut into ``grid``
    equal time segments; each segment's spectrum (numpy rfft) is
    folded into ``grid`` equal frequency bands; cell = integer
    log-scaled band energy. 64 cells feed the SAME mean-threshold /
    banding encoders the image path uses, and the mean-threshold makes
    the hash invariant to global gain (energies scale uniformly)."""
    import math

    import numpy as np

    if n_channels > 1:
        usable = (len(samples) // n_channels) * n_channels
        x = (
            np.asarray(samples[:usable], dtype=np.float64)
            .reshape(-1, n_channels)
            .mean(axis=1)
        )
    else:
        x = np.asarray(samples, dtype=np.float64)
    if len(x) < grid * 2:
        raise ValueError("signal too short for the energy grid")
    seg = len(x) // grid
    cells: list[int] = []
    for t in range(grid):
        spec = np.abs(np.fft.rfft(x[t * seg : (t + 1) * seg])) ** 2
        spec = spec[1:]  # drop DC: gain-irrelevant offset
        band = max(1, len(spec) // grid)
        for b in range(grid):
            e = float(spec[b * band : (b + 1) * band].sum())
            # integer log scale: stable under tiny float noise
            cells.append(int(math.floor(10.0 * math.log10(1.0 + e))))
    return cells
