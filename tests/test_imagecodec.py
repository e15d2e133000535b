"""Pure-stdlib image codec (operators/imagecodec.py): exact round trips
through real compressed bytes, every PNG filter path, BMP layout quirks,
and the named-error contract for unsupported features. No Spark session —
these are the decode kernels the multimodal 'stdlib' decoder runs inside
mapInPandas."""

import struct
import zlib

import numpy as np
import pytest

from duckdb_routing_spark.operators import imagecodec as ic


def _img_gray(h=10, w=12):
    return (np.add.outer(np.arange(h) * 7, np.arange(w) * 11) % 256).astype(np.uint8)


def _img_rgb(h=10, w=12):
    base = np.add.outer(np.arange(h) * 5, np.arange(w) * 3)
    return np.stack([(base + c * 37) % 256 for c in range(3)], axis=2).astype(np.uint8)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_gray_every_filter(ftype):
    img = _img_gray()
    out = ic.decode_png(ic.encode_png(img, filter_type=ftype))
    assert out.shape == (10, 12, 1)
    assert (out[:, :, 0] == img).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_rgb_every_filter(ftype):
    img = _img_rgb()
    out = ic.decode_png(ic.encode_png(img, filter_type=ftype))
    assert out.shape == (10, 12, 3)
    assert (out == img).all()


def test_png_random_content_roundtrip():
    rng = np.random.RandomState(7)
    for ftype in range(5):
        img = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
        assert (ic.decode_png(ic.encode_png(img, filter_type=ftype)) == img).all()


def test_png_palette():
    # hand-built color-type-3 PNG: 2x2 image indexing a 3-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    scan = bytes([0, 0, 1]) + bytes([0, 2, 0])  # filter 0 + indices per row
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"PLTE", plte)
        + ic._chunk(b"IDAT", zlib.compress(scan))
        + ic._chunk(b"IEND", b"")
    )
    out = ic.decode_png(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0] and out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255] and out[1, 1].tolist() == [255, 0, 0]


def test_bmp_roundtrip_both_row_orders():
    img = _img_rgb(3, 5)

    def bmp(img, bottom_up):
        h, w = img.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        rows = []
        order = range(h - 1, -1, -1) if bottom_up else range(h)
        for y in order:
            row = img[y, :, ::-1].tobytes()  # RGB -> BGR
            rows.append(row + b"\x00" * (row_bytes - len(row)))
        data = b"".join(rows)
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
                          len(data), 0, 0, 0, 0)
        return hdr + dib + data

    assert (ic.decode_bmp(bmp(img, True)) == img).all()
    assert (ic.decode_bmp(bmp(img, False)) == img).all()


def test_sniffer_and_unsupported_errors():
    img = _img_gray(4, 4)
    assert (ic.decode_image(ic.encode_png(img))[:, :, 0] == img).all()
    with pytest.raises(ValueError, match="unsupported image format"):
        ic.decode_image(b"GIF89a not supported")
    # 16-bit depth PNG rejected BY NAME
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + ic._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        ic.decode_png(png16)
    # Adam7 interlace rejected by name
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    pngi = (
        b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + ic._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlacing"):
        ic.decode_png(pngi)


def test_truncated_and_corrupt_chunks_raise_valueerror_by_name():
    """The docstring's named-error contract must hold for malformed files
    too: a cut-off stream or an over-long chunk length raises ValueError
    ('truncated PNG chunk ...'), never struct.error or a silent short
    read that surfaces later as a confusing zlib/length error."""
    png = ic.encode_png(_img_gray(4, 4))
    # cut mid-IHDR: the 13-byte IHDR payload is truncated
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        ic.decode_png(png[:16])
    # cut mid-IDAT (removes IEND's 12 bytes + 1 byte of IDAT's CRC, so the
    # cut lands INSIDE a chunk, not on a chunk boundary)
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        ic.decode_png(png[:-13])
    # chunk length running past the payload (corrupt length field)
    bad = bytearray(png)
    bad[8:12] = struct.pack(">I", 10_000)  # IHDR claims 10k bytes
    with pytest.raises(ValueError, match="truncated PNG chunk"):
        ic.decode_png(bytes(bad))
    # IHDR present but wrong size
    short_ihdr = (
        b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", b"\x00" * 5) + ic._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IHDR"):
        ic.decode_png(short_ihdr)


def test_gray_conversion_and_resize_determinism():
    img = _img_rgb(8, 8)
    g = ic.to_gray(img)
    # integer BT.601: spot-check one pixel exactly
    r, gg, b = (int(img[3, 4, c]) for c in range(3))
    assert int(g[3, 4]) == (299 * r + 587 * gg + 114 * b) // 1000
    small = ic.resize_nearest(g, (4, 4))
    assert small.shape == (4, 4)
    # nearest-neighbor center sampling: row/col source index formula
    assert int(small[0, 0]) == int(g[((2 * 0 + 1) * 8) // 8, ((2 * 0 + 1) * 8) // 8])


def test_pil_agreement_when_available():
    """When pillow IS present (optional `make pil-check` environment), the
    stdlib decoder must agree with PIL on raw pixel content of its own
    PNGs (decode only — gray/resize pipelines are documented as separate)."""
    pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    img = _img_rgb()
    png = ic.encode_png(img, filter_type=4)
    with Image.open(BytesIO(png)) as im:
        assert (np.asarray(im.convert("RGB")) == img).all()
    assert (ic.decode_png(png) == img).all()


def test_png_rgba_and_gray_alpha_decode():
    """Color types 6 (RGBA) and 4 (gray+alpha) decode correctly from
    hand-built filter-0 PNGs; grayscale conversion ignores alpha."""
    # 2x2 RGBA
    px = [
        [10, 20, 30, 255], [40, 50, 60, 128],
        [70, 80, 90, 0], [200, 210, 220, 255],
    ]
    rows = b""
    for y in range(2):
        rows += b"\x00" + bytes(sum((px[y * 2 + x] for x in range(2)), []))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(rows)) + ic._chunk(b"IEND", b"")
    )
    out = ic.decode_png(png)
    assert out.shape == (2, 2, 4)
    assert out[0, 1].tolist() == [40, 50, 60, 128]
    g = ic.to_gray(out)
    r, gg, b, _a = px[1]
    assert int(g[0, 1]) == (299 * r + 587 * gg + 114 * b) // 1000

    # 2x1 gray+alpha (type 4): luma = the gray channel, alpha ignored
    rows = b"\x00" + bytes([77, 255, 200, 0])
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + ic._chunk(b"IHDR", ihdr)
        + ic._chunk(b"IDAT", zlib.compress(rows)) + ic._chunk(b"IEND", b"")
    )
    out = ic.decode_png(png)
    assert out.shape == (1, 2, 2)
    assert ic.to_gray(out).tolist() == [[77, 200]]
