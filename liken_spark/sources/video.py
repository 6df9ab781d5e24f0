"""Pure-numpy Y4M (YUV4MPEG2) video codec — no ffmpeg/pyav needed.

Y4M is the public uncompressed interchange container (mjpegtools spec): an
ASCII stream header ``YUV4MPEG2 W<w> H<h> F<n>:<d> ... [C<space>]\\n``
followed by frames, each a ``FRAME[ params]\\n`` line plus raw planar YUV.
Because frames are fixed-size, sampling every n-th frame is pure offset
arithmetic — only the sampled frames' bytes are ever touched, which is the
property ``operators/multimodal.frame_sample`` needs (decode cost scales
with frames *kept*, not clip length).

Supported colorspaces: C420 (+jpeg/mpeg2/paldv tags), C444, Cmono. The
encoder emits C444 (RGB, no chroma loss beyond the YUV rounding) or Cmono
(grayscale, bit-exact round-trip). Compressed codecs (H.264 etc.) remain
behind the clearly-marked NotImplementedError in multimodal.frame_sample.

Same pattern as the BMP/PPM codecs in sources/image.py.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2 "


def _rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w, 3) uint8 full-range BT.601 YUV."""
    f = rgb.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    u = (f[..., 2] - y) * 0.564 + 128.0
    v = (f[..., 0] - y) * 0.713 + 128.0
    return np.clip(np.stack([y, u, v], axis=-1).round(), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 full-range BT.601 YUV -> (h, w, 3) uint8 RGB."""
    f = yuv.astype(np.float64)
    y, u, v = f[..., 0], f[..., 1] - 128.0, f[..., 2] - 128.0
    r = y + 1.403 * v
    g = y - 0.344 * u - 0.714 * v
    b = y + 1.773 * u
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def y4m_encode(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """Encode frames to Y4M: (n, h, w, 3) uint8 RGB -> C444, or
    (n, h, w) uint8 grayscale -> Cmono (bit-exact round-trip)."""
    if frames.dtype != np.uint8 or frames.ndim not in (3, 4):
        raise ValueError("y4m_encode expects (n, h, w[, 3]) uint8")
    mono = frames.ndim == 3
    n, h, w = frames.shape[:3]
    cs = b"Cmono" if mono else b"C444"
    out = [_MAGIC + b"W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps[0], fps[1], cs)]
    for k in range(n):
        out.append(b"FRAME\n")
        if mono:
            out.append(frames[k].tobytes())
        else:
            yuv = _rgb_to_yuv(frames[k])
            # planar: full Y plane, then U, then V
            out.append(np.ascontiguousarray(yuv.transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def _parse_header(raw: bytes) -> tuple[int, int, str, int]:
    """-> (width, height, colorspace, header_end_offset)."""
    if not raw.startswith(_MAGIC):
        raise ValueError("not a Y4M payload")
    nl = raw.index(b"\n")
    w = h = None
    cs = "C420"  # spec default when no C tag present
    for tok in raw[len(_MAGIC) : nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C"):
            cs = tok.decode("ascii")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    return w, h, cs, nl + 1


def _frame_bytes(w: int, h: int, cs: str) -> int:
    if cs.startswith("C420"):  # C420 / C420jpeg / C420mpeg2 / C420paldv
        return w * h + 2 * ((w // 2) * (h // 2))
    if cs == "C444":
        return 3 * w * h
    if cs == "Cmono":
        return w * h
    raise ValueError(f"unsupported Y4M colorspace {cs}")


def _decode_frame(buf: bytes, w: int, h: int, cs: str) -> np.ndarray:
    """One raw planar frame -> (h, w, 3) uint8 RGB."""
    if cs == "Cmono":
        y = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
        return np.repeat(y[..., None], 3, axis=-1)
    if cs == "C444":
        yuv = np.frombuffer(buf, dtype=np.uint8).reshape(3, h, w).transpose(1, 2, 0)
        return _yuv_to_rgb(yuv)
    # C420*: half-res chroma planes, nearest-neighbor upsample
    y = np.frombuffer(buf, dtype=np.uint8, count=w * h).reshape(h, w)
    cw, ch = w // 2, h // 2
    u = np.frombuffer(buf, dtype=np.uint8, count=cw * ch, offset=w * h).reshape(ch, cw)
    v = np.frombuffer(buf, dtype=np.uint8, count=cw * ch, offset=w * h + cw * ch).reshape(ch, cw)
    yi = np.minimum(np.arange(h) // 2, ch - 1)
    xi = np.minimum(np.arange(w) // 2, cw - 1)
    yuv = np.stack([y, u[yi][:, xi], v[yi][:, xi]], axis=-1)
    return _yuv_to_rgb(yuv)


def y4m_frame_offsets(raw: bytes) -> tuple[int, int, str, list[int]]:
    """-> (width, height, colorspace, [payload offset of each frame]).

    Offsets point past each FRAME header line; computing them touches only
    the header lines (one short scan per frame), never the frame payloads."""
    w, h, cs, pos = _parse_header(raw)
    fsz = _frame_bytes(w, h, cs)
    offsets = []
    n = len(raw)
    while pos < n:
        if raw[pos : pos + 5] != b"FRAME":
            raise ValueError(f"corrupt Y4M: expected FRAME marker at offset {pos}")
        nl = raw.index(b"\n", pos)  # FRAME lines may carry parameters
        offsets.append(nl + 1)
        pos = nl + 1 + fsz
    return w, h, cs, offsets


def y4m_decode(raw: bytes, every_n: int = 1) -> tuple[list[int], np.ndarray]:
    """Decode every ``every_n``-th frame: -> (frame indices, (k, h, w, 3)
    uint8 RGB). Only the sampled frames' payload bytes are decoded."""
    w, h, cs, offsets = y4m_frame_offsets(raw)
    fsz = _frame_bytes(w, h, cs)
    idx = list(range(0, len(offsets), max(1, every_n)))
    frames = np.stack(
        [_decode_frame(raw[offsets[i] : offsets[i] + fsz], w, h, cs) for i in idx]
    ) if idx else np.zeros((0, h, w, 3), dtype=np.uint8)
    return idx, frames
