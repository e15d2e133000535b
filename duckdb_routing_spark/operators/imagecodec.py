"""Pure-stdlib image codec: enough PNG/BMP to run the multimodal REAL-decode
path end to end in an image-library-free container.

The multimodal tier (operators/multimodal.py) gates its real decode on the
runtime: decoder='pil' needs pillow in the executor environment. This
container ships no codec libraries and installing any is out of scope, so
that branch could only ever be asserted as a gate — never executed. This
module closes the gap with decoders built ONLY on the standard library
(zlib for PNG's DEFLATE) + numpy:

  - PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
    Average/Paeth per the PNG spec §9); non-interlaced. That covers
    everything the stdlib encoder below and typical ML thumbnail corpora
    emit; exotic inputs raise ValueError with the unsupported feature
    named.
  - BMP: uncompressed 24-bit BI_RGB (the trivial interchange format).
  - A PNG ENCODER (any filter type per row) so tests can round-trip real
    compressed bytes without any external fixture: decode(encode(x)) == x
    exercises every filter's inverse exactly.

Grayscale conversion is integer ITU-R BT.601 luma ((299R + 587G + 114B)
// 1000) and resize is deterministic nearest-neighbor sampling — both
reproducible across platforms (no float filter kernels), which is what the
hash-stable perceptual-hash pipeline needs. This intentionally does NOT
match PIL's convert('L')/BILINEAR output bit-for-bit; the two decoders are
separate, documented choices (PIL for parity with common pipelines where
available, stdlib for a dependency-free real decode).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 (C = samples per pixel, palette expanded
    to RGB). Supports the subset in the module docstring; raises
    ValueError naming any unsupported feature."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        # a truncated/corrupt stream must raise the documented ValueError,
        # not silently shorten data (the zlib/length checks downstream only
        # see the concatenation, not the cut) or leak a struct.error
        if pos + 12 + length > len(payload):
            raise ValueError(
                f"truncated PNG chunk {ctype!r}: declares {length} data bytes "
                f"but only {len(payload) - pos - 12} remain"
            )
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc unchecked)
        if ctype == b"IHDR":
            if len(data) != 13:
                raise ValueError(f"corrupt PNG IHDR: {len(data)} bytes, want 13")
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("unsupported PNG interlacing (Adam7)")
    nch = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    # de-filter scanline by scanline (each row's filter depends on the
    # previous RECONSTRUCTED row, so this loop is inherently sequential)
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(nch, stride):  # sequential by definition
                cur[x] = (int(cur[x]) + int(cur[x - nch])) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                c = int(prev[x - nch]) if x >= nch else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        img[y] = cur
        prev = img[y]
    out = img.reshape(height, width, nch)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        out = palette[out[:, :, 0]]
    return out


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> HxWx3 uint8 (RGB order)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = data_off + y * row_bytes
        row = np.frombuffer(payload, dtype=np.uint8, count=width * 3, offset=off).reshape(
            width, 3
        )
        img[height - 1 - y if flip else y] = row[:, ::-1]  # BGR -> RGB
    return img


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode: PNG or BMP -> HxWxC uint8."""
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise ValueError("unsupported image format (stdlib decoder: PNG or 24-bit BMP)")


def to_gray(img: np.ndarray) -> np.ndarray:
    """HxWxC uint8 -> HxW uint8 via integer BT.601 luma (alpha ignored)."""
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c == 1:
        return img[:, :, 0]
    if c == 2:  # gray + alpha
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def resize_nearest(img: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Deterministic nearest-neighbor resize to (w, h) -> HxW (2-D in,
    2-D out). Integer center sampling: source index = (i + 0.5) * s / d,
    computed in exact integer arithmetic ((2i + 1) * s) // (2d)."""
    w, h = size
    sh, sw = img.shape[:2]
    ys = ((2 * np.arange(h, dtype=np.int64) + 1) * sh) // (2 * h)
    xs = ((2 * np.arange(w, dtype=np.int64) + 1) * sw) // (2 * w)
    return img[np.minimum(ys, sh - 1)][:, np.minimum(xs, sw - 1)]


def decode_gray_patch(payload: bytes, size: tuple[int, int]) -> np.ndarray:
    """payload -> grayscale patch of `size` (w, h) as uint8 HxW — the
    stdlib counterpart of multimodal._pil_gray."""
    return resize_nearest(to_gray(decode_image(payload)), size)


# ---------------------------------------------------------------------------
# PNG encoder — test fixtures without external files
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 -> PNG bytes, every row filtered
    with `filter_type` (0-4) — one encoder argument exercises every
    decoder filter path."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, nch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, nch = 2, 3
        flat = img
    else:
        raise ValueError("encode_png takes HxW gray or HxWx3 RGB")
    h, w = flat.shape[:2]
    stride = w * nch
    rows = flat.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = rows[y]
        left = np.zeros(stride, dtype=np.int32)
        left[nch:] = cur[:-nch]
        ul = np.zeros(stride, dtype=np.int32)
        ul[nch:] = prev[:-nch]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            filt = cur - _paeth(
                left.astype(np.uint8), prev.astype(np.uint8), ul.astype(np.uint8)
            ).astype(np.int32)
        else:
            raise ValueError(f"bad filter {filter_type}")
        out.append(filter_type)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )
