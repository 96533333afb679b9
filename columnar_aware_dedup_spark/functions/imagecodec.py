"""Pure-stdlib image codec for the multimodal kernels: PPM (P6) and
uncompressed 24-bit BMP.

The production decode path is PIL/libav; neither imports in this sandbox, so
until r02 the "real kernel" claim was untestable here (VERDICT r02 finding
#4). These two formats are simple enough to decode from the public format
specs with ``struct``-level code — which makes the real (non-fake) kernel
path executable and testable in any environment:

- **PPM P6** (netpbm): ``P6 <w> <h> <maxval>`` header with ``#`` comments,
  then ``w*h*3`` raw RGB bytes. Concatenated P6 images form our minimal
  deterministic "video" container (one frame per image), giving the frame
  sampler a real multi-frame path.
- **BMP** (Windows V3+, ``BM`` magic): pixel offset at byte 10, width/height
  at 18/22, 24 bpp, BI_RGB only; BGR pixel order, 4-byte row padding,
  bottom-up rows unless height is negative.

Decoded frames are ``(width, height, rgb)`` with ``rgb`` a
``bytes`` of ``w*h*3`` in row-major RGB order — the exact shape a PIL/libav
kernel produces, so swapping the decoder never changes downstream code.
"""

from __future__ import annotations

import struct

import numpy as np


def _ppm_tokens(data: bytes, pos: int, n: int) -> tuple[list[int], int] | None:
    """Read ``n`` whitespace-separated integer tokens (skipping ``#``
    comments) starting at ``pos``; None on malformed input."""
    out: list[int] = []
    ln = len(data)
    while len(out) < n:
        while pos < ln and data[pos : pos + 1].isspace():
            pos += 1
        if pos < ln and data[pos] == ord("#"):
            while pos < ln and data[pos] not in (10, 13):
                pos += 1
            continue
        tok = bytearray()
        while pos < ln and not data[pos : pos + 1].isspace():
            tok += data[pos : pos + 1]
            pos += 1
        if not tok.isdigit():
            return None
        out.append(int(tok))
    if pos >= ln or not data[pos : pos + 1].isspace():
        return None
    return out, pos + 1  # consume the single whitespace after maxval


def decode_ppm(data: bytes, pos: int = 0) -> tuple[int, int, bytes, int] | None:
    """Decode one P6 image at ``pos`` -> (width, height, rgb, end_pos)."""
    if data[pos : pos + 2] != b"P6":
        return None
    parsed = _ppm_tokens(data, pos + 2, 3)
    if parsed is None:
        return None
    (w, h, maxval), body = parsed
    if w <= 0 or h <= 0 or maxval != 255:
        return None
    end = body + w * h * 3
    if end > len(data):
        return None
    return w, h, data[body:end], end


def decode_bmp(data: bytes) -> tuple[int, int, bytes] | None:
    """Decode an uncompressed 24-bit BMP -> (width, height, rgb)."""
    if data[:2] != b"BM" or len(data) < 54:
        return None
    pix_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if w <= 0 or h == 0 or bpp != 24 or comp != 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if pix_off + stride * h > len(data):
        return None
    raw = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        raw = raw[::-1]
    return w, h, raw[:, :, ::-1].tobytes()  # BGR -> RGB


def decode_frames(data: bytes) -> list[tuple[int, int, bytes]]:
    """All frames of a payload: every concatenated P6 image, or the single
    BMP; empty list when the payload is not a stdlib-decodable image."""
    frames: list[tuple[int, int, bytes]] = []
    pos = 0
    while True:
        f = decode_ppm(data, pos)
        if f is None:
            break
        w, h, rgb, pos = f
        frames.append((w, h, rgb))
        if pos >= len(data):
            break
    if frames and pos >= len(data):
        return frames
    if not frames:
        bmp = decode_bmp(data)
        if bmp is not None:
            return [bmp]
    return frames if frames else []


def encode_ppm(w: int, h: int, rgb: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + rgb


def synth_frames(doc_id: int) -> bytes:
    """Deterministic multi-frame P6 container whose every pixel byte is
    closed-form in ``doc_id`` — the image analogue of
    ``audiocodec.synth_samples`` (same oracle trick: a SQL
    ``generate_series`` can regenerate byte ``i`` of frame ``f`` as
    ``(doc_id*7 + f*13 + i) % 256``, so the decode path is hash-checkable
    end to end with no image library on either side).

    Geometry also derives from ``doc_id`` so the corpus exercises varied
    shapes: width ``4 + d%5``, height ``3 + d%4``, frames ``1 + d%4``.
    """
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    n_frames = 1 + doc_id % 4
    i = np.arange(w * h * 3, dtype=np.int64)
    out = bytearray()
    for f in range(n_frames):
        rgb = ((doc_id * 7 + f * 13 + i) % 256).astype(np.uint8).tobytes()
        out += encode_ppm(w, h, rgb)
    return bytes(out)


def synth_scene_frames(doc_id: int) -> bytes:
    """Like :func:`synth_frames`, but with a PLANTED SCENE CUT: from frame
    ``cut = 1 + doc_id % 3`` onward every pixel jumps by +128 (mod 256), so
    cross-cut per-pixel differences are 115..141 while within-scene ones
    are 13 or 243 (mean <= ~96 even at the worst wrap overlap of the
    smallest 36-byte frames) — a separable detection signal that is
    still closed-form for the SQL oracle. Geometry: width ``4 + d%5``,
    height ``3 + d%4``, frames ``4 + d%4`` (always >= 4, so every container
    has at least three boundaries and exactly one cut)."""
    w = 4 + doc_id % 5
    h = 3 + doc_id % 4
    n_frames = 4 + doc_id % 4
    cut = 1 + doc_id % 3
    i = np.arange(w * h * 3, dtype=np.int64)
    out = bytearray()
    for f in range(n_frames):
        base = doc_id * 7 + f * 13 + (128 if f >= cut else 0)
        rgb = ((base + i) % 256).astype(np.uint8).tobytes()
        out += encode_ppm(w, h, rgb)
    return bytes(out)


#: geometry of the perceptual-hash fixture images (fixed so the 8x8
#: nearest-neighbor sample map is a constant both engines share).
AHASH_W, AHASH_H = 16, 12
#: pixel values stay in 0..202 (pattern mod 200 + shift <= 3): the per-doc
#: brightness shift must never clamp, or shift-invariance of the hash bits
#: (strict inequalities shift with both sides) would break.
AHASH_MOD = 200


def synth_class_frame(doc_id: int) -> bytes:
    """One P6 frame with a PLANTED DUPLICATE CLASS and a per-doc global
    brightness shift: docs sharing ``doc_id % 41`` show the same underlying
    pattern ``(cls*7 + i) % 200`` shifted by ``1 + doc_id % 3`` — so their
    BYTES (and md5) differ, but every average-hash bit compares a cell
    value against the global mean and a uniform shift moves both sides
    equally, leaving the hash identical. Cross-class patterns differ
    everywhere. Closed-form for the SQL oracle, like :func:`synth_frames`.
    """
    cls = doc_id % 41
    delta = 1 + doc_id % 3
    i = np.arange(AHASH_W * AHASH_H * 3, dtype=np.int64)
    rgb = ((cls * 7 + i) % AHASH_MOD + delta).astype(np.uint8).tobytes()
    return encode_ppm(AHASH_W, AHASH_H, rgb)


def mean_luma(rgb: bytes) -> float:
    """Rec.601 luma over RGB bytes, normalized to [0, 1], 6 decimals."""
    n = len(rgb) // 3
    if n == 0:
        return 0.0
    px = np.frombuffer(rgb, dtype=np.uint8, count=n * 3).reshape(n, 3)
    s = px.sum(axis=0, dtype=np.int64)
    acc = 0.299 * float(s[0]) + 0.587 * float(s[1]) + 0.114 * float(s[2])
    return round(acc / (255.0 * n), 6)


def resize_nearest(
    w: int, h: int, rgb: bytes, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample to (tw, th) — the stdlib resize kernel
    (numpy fancy-indexed; same source-pixel map as the former loop)."""
    px = np.frombuffer(rgb, dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    sy = np.minimum(h - 1, np.arange(th) * h // th)
    sx = np.minimum(w - 1, np.arange(tw) * w // tw)
    return px[sy][:, sx].tobytes()
