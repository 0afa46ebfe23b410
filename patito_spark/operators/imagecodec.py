"""Stdlib-only image decoding for the multimodal pipeline.

This sandbox ships no imaging library, but three formats are decodable
with nothing beyond ``struct``/``zlib``/numpy, which makes the
``decode_image`` mapInPandas path a REAL decode stage instead of an
import-gated stub:

- **PPM** (P6 binary, 8-bit RGB) — the interchange format every tool writes
- **BMP** (uncompressed BI_RGB, 24/32-bit, bottom-up or top-down)
- **PNG** (8-bit gray/RGB/RGBA, all five scanline filters, via ``zlib``)

Everything is numpy-vectorized per image; the only per-row Python is the
PNG scanline unfilter loop, which is inherent to the format (each line's
filter depends on the fully reconstructed previous line).  JPEG and other
DCT formats still require PIL — ``decode_image_bytes`` raises
``ValueError`` for signatures it does not know, and the caller decides
whether that's fatal.

Public decoding knowledge only: the PNG filter algorithms follow the
published PNG specification (RFC 2083 §6); BMP follows the Windows
BITMAPINFOHEADER layout; PPM follows the netpbm format description.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_image_bytes", "resize_nearest"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: PNG color type → channel count (palette unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def decode_image_bytes(payload: bytes) -> tuple:
    """Decode PPM/BMP/PNG bytes → ``(width, height, mode, pixels)``.

    ``pixels`` is a ``uint8`` numpy array of shape ``(height, width,
    channels)`` (channels dim kept even for grayscale, for a uniform
    downstream contract).  Raises ``ValueError`` for unknown or
    unsupported payloads — truncation, bad magic, exotic bit depths.
    """
    if payload is None or len(payload) < 8:
        raise ValueError("payload too short to contain an image header")
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    raise ValueError(
        f"unrecognized image signature {payload[:4]!r} "
        "(stdlib decoder supports PPM/P6, BMP/BI_RGB, PNG 8-bit)"
    )


def _decode_ppm(payload: bytes) -> tuple:
    # header = magic, width, height, maxval as whitespace-separated ASCII
    # tokens; '#' comments allowed between tokens (netpbm format spec)
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) < n:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, 3)
    return width, height, "RGB", px


def _decode_bmp(payload: bytes) -> tuple:
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"BMP header size {header_size} unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"BMP bpp={bpp} compression={compression} unsupported "
            "(uncompressed 24/32-bit only)"
        )
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    row_bytes = (width * channels + 3) & ~3  # rows pad to 4-byte boundary
    need = row_bytes * height
    raster = payload[data_offset : data_offset + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(height, row_bytes)
    px = rows[:, : width * channels].reshape(height, width, channels)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A); emit RGB(A)
    if channels == 3:
        px = px[:, :, ::-1]
        mode = "RGB"
    else:
        px = px[:, :, [2, 1, 0, 3]]
        mode = "RGBA"
    return width, height, mode, np.ascontiguousarray(px)


def _decode_png(payload: bytes) -> tuple:
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        chunk = payload[pos + 8 : pos + 8 + length]
        if len(chunk) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = chunk
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"PNG depth={depth} color={color} interlace={interlace} "
            "unsupported (8-bit, non-interlaced, non-palette only)"
        )
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG scanline data")
    # scanline unfilter (PNG spec §6): each line = 1 filter byte + pixels;
    # filters reference the reconstructed previous line, so lines are
    # sequential — but each line body is numpy-vectorized where possible
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = np.empty(stride, dtype=np.uint8)
            left = np.zeros(channels, dtype=np.int32)
            lineI = line.astype(np.int32)
            prevI = prev.astype(np.int32)
            for x in range(0, stride, channels):
                seg = slice(x, x + channels)
                if ftype == 1:
                    val = lineI[seg] + left
                elif ftype == 3:
                    val = lineI[seg] + ((left + prevI[seg]) >> 1)
                else:
                    ul = (
                        prevI[x - channels : x]
                        if x
                        else np.zeros(channels, dtype=np.int32)
                    )
                    p = left + prevI[seg] - ul
                    pa, pb, pc = (
                        np.abs(p - left),
                        np.abs(p - prevI[seg]),
                        np.abs(p - ul),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, prevI[seg], ul),
                    )
                    val = lineI[seg] + pred
                left = val & 0xFF
                cur[seg] = left
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = cur.astype(np.uint16)
    px = out.reshape(height, width, channels)
    return width, height, _PNG_MODE[color], px


def resize_nearest(px: np.ndarray, size: tuple) -> np.ndarray:
    """Nearest-neighbor resize (numpy fancy indexing, no per-pixel Python).

    Index mapping matches the conventional nearest rule
    ``src = floor(dst * src_len / dst_len)``.
    """
    new_w, new_h = size
    h, w = px.shape[:2]
    rows = (np.arange(new_h) * h // new_h).clip(0, h - 1)
    cols = (np.arange(new_w) * w // new_w).clip(0, w - 1)
    return px[rows][:, cols]
