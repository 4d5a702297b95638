"""Pure-stdlib BMP (Windows DIB) codec — 24-bit uncompressed BI_RGB.

BMP files are the third stdlib-decodable image format in the sniffing
chain (after PNG and baseline JPEG): a 14-byte file header, a 40-byte
BITMAPINFOHEADER, then the bottom-up BGR pixel array with rows padded
to 4 bytes — the exact DIB layout the AVI codec already walks
(operators/avi.py frames ARE these pixel arrays), so the row
conversion is shared, not re-implemented.

Reference provenance: the reference repo has no media handling at all;
this exists for the engine's multimodal-column mandate (decode /
feature-extract over opaque binary columns).
"""

from __future__ import annotations

import struct

from biocypher_metta_spark.operators.avi import _dib_to_rgb, _row_stride


def bmp_encode(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB bytes -> 24-bit BI_RGB BMP file."""
    if width < 1 or height < 1:
        raise ValueError("width and height must be >= 1")
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    stride = _row_stride(width)
    pix = bytearray(stride * height)
    for y in range(height):
        dst = (height - 1 - y) * stride        # top-down -> bottom-up
        for x in range(width):
            s = (y * width + x) * 3
            d = dst + x * 3
            pix[d] = rgb[s + 2]                # RGB -> BGR
            pix[d + 1] = rgb[s + 1]
            pix[d + 2] = rgb[s]
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       0, len(pix), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pix), 0, 0,
                         offset)
    return header + info + bytes(pix)


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """BMP bytes -> (width, height, 3, top-down RGB bytes). Raises
    ValueError on anything but 24-bit uncompressed BI_RGB with a
    positive (bottom-up) height — the format's overwhelmingly common
    shape; compressed/paletted variants fail loudly per the modality
    error contract."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"DIB header size {hdr_size} unsupported")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported (planes={planes}, "
            f"bpp={bpp}, compression={compression})")
    if width < 1 or height < 1:
        raise ValueError("top-down or degenerate BMP unsupported")
    need = offset + _row_stride(width) * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel array")
    return width, height, 3, _dib_to_rgb(data, offset, width, height)
