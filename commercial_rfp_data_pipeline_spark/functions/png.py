"""Minimal pure-Python PNG codec (round 8, VERDICT r7 #5).

The container ships no media libraries (no Pillow/ffmpeg), but PNG's
pixel payload is just zlib — which IS in the standard library. This
module implements the subset a perceptual-hash pipeline needs:

- ``decode_png``: signature + IHDR parse, IDAT concat + zlib inflate,
  per-scanline unfilter (all five filter types: None/Sub/Up/Average/
  Paeth), for 8-bit grayscale (color type 0), RGB (2), and RGBA (6).
- ``encode_png``: filter-0 (or filter-2 "Up") scanlines + one zlib
  stream — enough to generate real byte-distinct re-encodings of the
  same pixels for tests and fixtures.

This closes the `decode_image_stub(real=True)` seam with an actual
decoder: perceptual aHash/dHash can run over REAL pixels end to end
in-sandbox. Production swaps this for Pillow behind the same seam.

Pure stdlib (struct, zlib); the per-image work runs inside Arrow
batches on executors — the driver never sees pixel data.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> dict:
    """Decode an 8-bit gray/RGB/RGBA PNG. Returns {"width", "height",
    "channels", "pixels"} with pixels as a flat bytearray of
    width*height*channels samples in scanline order. Raises ValueError
    on anything that is not a supported PNG."""
    if len(data) < 8 or data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", body[:10]
            )
            interlace = body[12]
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or channels is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("bad IDAT length")
    out = bytearray(height * stride)
    prev_row_start = -1
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                out[o + x] = (line[x] + a) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                b = out[prev_row_start + x] if y > 0 else 0
                out[o + x] = (line[x] + b) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                b = out[prev_row_start + x] if y > 0 else 0
                out[o + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - channels] if x >= channels else 0
                b = out[prev_row_start + x] if y > 0 else 0
                c = (
                    out[prev_row_start + x - channels]
                    if (y > 0 and x >= channels)
                    else 0
                )
                out[o + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        prev_row_start = o
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": out,
    }


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filter_type: int = 0,
    compress_level: int = 6,
) -> bytes:
    """Encode 8-bit pixels (flat scanline order) as a PNG. Different
    (filter_type, compress_level) choices yield BYTE-DISTINCT files
    with identical decoded pixels — exactly the re-encoded-duplicate
    class perceptual hashing exists to catch."""
    channels = _CHANNELS[color_type]
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match dimensions")
    if filter_type not in (0, 2):
        raise ValueError("encoder supports filter 0 (None) and 2 (Up)")
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        raw.append(filter_type)
        if filter_type == 0:
            raw.extend(row)
        else:  # Up
            prev = (
                pixels[(y - 1) * stride : y * stride]
                if y > 0
                else bytes(stride)
            )
            raw.extend((row[x] - prev[x]) & 0xFF for x in range(stride))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + _chunk(b"IEND", b"")
    )


def luma_grid(
    width: int, height: int, channels: int, pixels: bytes, grid: int = 8
) -> list[int]:
    """Downsample to a grid x grid mean-LUMA table — the real resize
    kernel of aHash/dHash (ITU-R BT.601 integer luma for RGB; the raw
    sample for grayscale). Returns grid*grid ints in row-major order;
    each cell is the mean luma over its pixel block (floor division —
    exactly restatable arithmetic)."""
    sums = [0] * (grid * grid)
    counts = [0] * (grid * grid)
    for y in range(height):
        gy = y * grid // height
        base = y * width * channels
        for x in range(width):
            gx = x * grid // width
            o = base + x * channels
            if channels == 1:
                luma = pixels[o]
            else:
                # BT.601 integer approximation: (299R + 587G + 114B)/1000
                luma = (
                    299 * pixels[o]
                    + 587 * pixels[o + 1]
                    + 114 * pixels[o + 2]
                ) // 1000
            idx = gy * grid + gx
            sums[idx] += luma
            counts[idx] += 1
    return [s // c if c else 0 for s, c in zip(sums, counts)]
