"""Pure-numpy image codecs (no PIL/libjpeg needed).

Real decode support for the uncompressed interchange formats that a
training-data pipeline controls end-to-end:

- **BMP** (Windows V3+ headers, 24/32-bit uncompressed BGR(A), bottom-up or
  top-down row order)
- **PPM/PGM** (binary P6/P5, maxval <= 255)

plus matching encoders so fixtures and round-trip tests need no external
libraries. Compressed formats (JPEG/PNG) still require PIL and fall back to
the clearly-marked stub path in ``operators/multimodal.py``.

Everything returns/accepts ``uint8`` arrays shaped (height, width, 3).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# BMP (uncompressed 24/32-bit)


def bmp_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (bottom-up, BGR)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("bmp_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    row_size = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    img_size = row_size * h
    bgr = arr[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


def bmp_decode(raw: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP -> (h, w, 3) uint8 RGB."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", raw, 10)[0]
    hdr_size = struct.unpack_from("<I", raw, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    compression = struct.unpack_from("<I", raw, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h_signed < 0
    h = abs(h_signed)
    bytes_pp = bpp // 8
    row_size = (w * bytes_pp + 3) & ~3
    px = np.frombuffer(raw, dtype=np.uint8, count=row_size * h, offset=data_offset)
    px = px.reshape(h, row_size)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# ---------------------------------------------------------------------------
# PPM / PGM (binary, maxval <= 255)


def ppm_encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary P6 PPM."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("ppm_encode expects (h, w, 3) uint8")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _pnm_header(raw: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse magic, width, height, maxval; return them + pixel offset.
    Handles arbitrary whitespace and '#' comments per the PNM spec."""
    magic = raw[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    return magic, fields[0], fields[1], fields[2], pos


def pnm_decode(raw: bytes) -> np.ndarray:
    """Binary P6 (RGB) or P5 (gray, replicated to RGB) -> (h, w, 3) uint8."""
    magic, w, h, maxval, off = _pnm_header(raw)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    if magic == b"P6":
        px = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=off)
        return np.ascontiguousarray(px.reshape(h, w, 3))
    if magic == b"P5":
        px = np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=off)
        return np.ascontiguousarray(np.repeat(px.reshape(h, w, 1), 3, axis=2))
    raise ValueError(f"unsupported PNM magic {magic!r}")


# ---------------------------------------------------------------------------


def decode_image(raw: bytes) -> np.ndarray:
    """Sniff and decode a supported payload -> (h, w, 3) uint8 RGB.
    BMP and binary PPM/PGM decode natively (pure numpy); anything else
    needs PIL and raises ImportError-wrapped ValueError without it."""
    if raw[:2] == b"BM":
        return bmp_decode(raw)
    if raw[:2] in (b"P6", b"P5"):
        return pnm_decode(raw)
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    except ImportError:
        raise ValueError(
            "payload is not BMP/PPM/PGM and PIL is unavailable for compressed "
            "formats (JPEG/PNG)"
        ) from None
