"""GIF87a/89a codec — pure stdlib/numpy, from the GIF89a specification.

The third real compressed image format next to PNG (operators/
multimodal.py) and JPEG (operators/jpeg.py): web-crawl corpora carry
GIFs in volume, and a decode-everything pass needs the real LZW, not a
stub. Implemented from the public spec (GIF89a, CompuServe 1990):

- full block walk: header, logical screen descriptor, global/local
  color tables, extension blocks (graphic control, comment,
  application) skipped via their sub-block chains, image descriptors,
  trailer;
- variable-width LZW with the GIF code-size growth rule (decoder grows
  at ``next == 1 << width``, encoder one step later at
  ``next == (1 << width) + 1`` — the classic off-by-one both sides
  must agree on), CLEAR/EOI handling, and the KwKwK self-reference
  case;
- 4-pass interlace reordering;
- multi-frame (animated) decode with frame compositing: sub-rectangle
  placement, disposal methods 1 (leave), 2 (restore background) and
  3 (restore previous), and graphic-control transparency.

The encoder is a real LZW compressor (emits CLEAR + rebuilds its table
before the 12-bit ceiling), so writer and reader form a genuine test
pair; interlaced output is supported to keep the decoder's reorder on
the tested path. Like the JPEG/PNG modules, corrupt input raises a
descriptive ValueError, never garbage output.

Spark-side the decode rides the same Arrow-batched ``mapInPandas``
image stages (multimodal.image_features / image_ahash) via
decode_image's magic sniffing.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif"]

_MAX_WIDTH = 12  # GIF LZW code width ceiling (spec appendix F)
# allocation guard: a corrupt 13-byte header can declare a 65535x65535
# logical screen (a ~12 GB canvas) before any block validates — cap
# total pixels at 64 MP with a descriptive error instead
_MAX_PIXELS = 1 << 26


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> bytes:
    """GIF-flavor LZW: variable width starting at mcs+1, LSB-first bit
    packing, CLEAR resets the table, EOI ends the stream."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def fresh():
        return [bytes([i]) for i in range(1 << mcs)] + [b"", b""]

    table = fresh()
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    acc = n = pos = 0
    while True:
        while n < width:
            if pos >= len(data):
                # streams may omit an explicit EOI; accept a clean end
                return bytes(out[:n_pixels])
            acc |= data[pos] << n
            n += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = fresh()
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            seq = table[code]
        elif code == len(table) and prev is not None:
            seq = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"corrupt GIF: LZW code {code} out of range")
        out += seq
        if prev is not None:
            table.append(prev + seq[:1])
            if len(table) == (1 << width) and width < _MAX_WIDTH:
                width += 1
        prev = seq
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"corrupt GIF: LZW stream yields {len(out)} of {n_pixels} pixels"
        )
    return bytes(out[:n_pixels])


def _lzw_encode(pixels: bytes, mcs: int) -> bytes:
    """Mirror of _lzw_decode — emits CLEAR first (per spec
    recommendation) and again before the table would cross the 12-bit
    ceiling, growing its width one step later than the decoder."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = n = 0

    def emit(code: int, width: int):
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(1 << mcs)}

    table = fresh()
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    w = b""
    for b in pixels:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < _MAX_WIDTH:
            width += 1
        if next_code > (1 << _MAX_WIDTH) - 2:  # reset well before 4096
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = mcs + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at pos; return (data,
    position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: unterminated sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > len(payload):
            raise ValueError("corrupt GIF: truncated sub-block")
        chunks.append(payload[pos : pos + size])
        pos += size


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame to (h, w, 3) uint8 RGB on the logical-screen
    canvas, composited per the GIF89a disposal model."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF payload: {payload[:6]!r}")
    if len(payload) < 13:
        raise ValueError("corrupt GIF: truncated logical screen descriptor")
    sw, sh = struct.unpack("<HH", payload[6:10])
    if sw * sh > _MAX_PIXELS:
        raise ValueError(
            f"corrupt GIF: logical screen {sw}x{sh} exceeds the "
            f"{_MAX_PIXELS}-pixel allocation guard"
        )
    packed, bg_index, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("corrupt GIF: truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("corrupt GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(payload):
            raise ValueError("corrupt GIF: truncated image descriptor")
        left, top, w, h = struct.unpack("<HHHH", payload[pos : pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if ct.size != 3 * n:
                raise ValueError("corrupt GIF: truncated local color table")
            ct = ct.reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("corrupt GIF: image with no color table")
        if left + w > sw or top + h > sh:
            raise ValueError("corrupt GIF: frame exceeds logical screen")
        if pos >= len(payload):
            raise ValueError("corrupt GIF: truncated before LZW code size")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = np.frombuffer(
            _lzw_decode(data, mcs, w * h), dtype=np.uint8
        ).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("corrupt GIF: palette index out of range")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore background
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and saved is not None:  # restore previous
            canvas = saved
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("corrupt GIF: no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 RGB — the decode_image contract."""
    return decode_gif_frames(payload)[0]


def encode_gif(
    img: np.ndarray, interlace: bool = False, transparent_rgb=None
) -> bytes:
    """Encode one (h, w, 3) RGB or (h, w, 1) grayscale raster as a
    GIF89a with a global color table built from the image's distinct
    colors (≤256 required — GIF is palettized by design; quantization
    is the caller's job, e.g. via thumbnail/posterize upstream)."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) uint8, got {img.shape}")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if transparent_rgb is not None:
        t = np.asarray(transparent_rgb, dtype=np.uint8)
        if not (palette == t).all(axis=1).any():
            palette = np.vstack([palette, t])
    if len(palette) > 256:
        raise ValueError(f"GIF needs <=256 distinct colors, got {len(palette)}")
    # color-table size must be a power of two >= 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    n_ct = 1 << bits
    ct = np.zeros((n_ct, 3), dtype=np.uint8)
    ct[: len(palette)] = palette

    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        order = [
            r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
        ]
        idx = idx[order]

    mcs = max(2, bits)
    lzw = _lzw_encode(idx.tobytes(), mcs)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((bits - 1) & 0x07), 0, 0])  # GCT flag+size, bg, aspect
    out += ct.tobytes()
    if transparent_rgb is not None:
        t = np.asarray(transparent_rgb, dtype=np.uint8)
        t_idx = int(np.where((palette == t).all(axis=1))[0][0])
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, t_idx, 0])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    out += bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
