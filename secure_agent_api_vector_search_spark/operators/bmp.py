"""BMP / DIB and ICO decoders — pure stdlib/numpy, from the public
Windows bitmap format layout.

Rounding out the decode-everything image stack: BMPs appear in
document dumps and legacy crawls, ICO favicons in any web crawl. The
BMP path covers the BITMAPINFOHEADER family (40/52/56/108/124-byte
headers), bottom-up AND top-down rows, 1/4/8-bit palettized (BGRA
color table), 16-bit (555 and BI_BITFIELDS masks), 24-bit BGR, 32-bit
BGRA, and RLE8/RLE4 compression (end-of-line, end-of-bitmap, delta
escapes). The ICO path walks the icon directory and decodes each
entry: PNG-compressed entries route through decode_png, classic
entries are headerless DIBs whose height is doubled to cover the AND
mask (applied as alpha for <32-bit images).

The writer emits uncompressed palettized/24-bit BMPs and classic ICOs,
so the readers have a genuine test pair; RLE decoding is additionally
pinned by a hand-built RLE8 stream in tests. Corrupt input raises a
descriptive ValueError — the shared codec-module contract.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_bmp", "encode_bmp", "decode_ico", "encode_ico"]

# allocation guard: corrupt headers can declare ~1-TB index grids
# (2^20 x 2^20 RLE) before any pixel data validates
_MAX_PIXELS = 1 << 26


def _mask_chan(vals: np.ndarray, mask: int) -> np.ndarray:
    """Extract one BI_BITFIELDS channel: shift to the mask's low bit and
    rescale its bit width to 0..255 (0-mask channels come back 0)."""
    if mask == 0:
        return np.zeros(vals.shape, dtype=np.uint8)
    shift = (mask & -mask).bit_length() - 1
    width = int(mask >> shift).bit_length()
    v = (vals & mask) >> shift
    return (v * 255 // ((1 << width) - 1)).astype(np.uint8)


def _decode_dib(
    payload: bytes, off: int, ico_mask: bool = False
) -> np.ndarray:
    """Decode a DIB (BITMAPINFOHEADER-family) starting at ``off``.
    With ``ico_mask`` the header height covers an appended 1-bit AND
    mask (ICO convention) applied as transparency."""
    if off + 40 > len(payload):
        raise ValueError("corrupt BMP: truncated info header")
    hdr_size, w, h_raw = struct.unpack("<Iii", payload[off : off + 12])
    if hdr_size < 40:
        raise ValueError(f"corrupt BMP: unsupported header size {hdr_size}")
    planes, bpp, compression = struct.unpack(
        "<HHI", payload[off + 12 : off + 20]
    )
    clr_used = struct.unpack("<I", payload[off + 32 : off + 36])[0]
    if ico_mask:
        h_raw //= 2
    top_down = h_raw < 0
    h = abs(h_raw)
    if w <= 0 or h == 0 or w * h > _MAX_PIXELS:
        raise ValueError(
            f"corrupt BMP: dimensions {w}x{h_raw} (allocation guard "
            f"{_MAX_PIXELS} pixels)"
        )
    if planes != 1:
        raise ValueError(f"corrupt BMP: planes {planes}")

    table_off = off + hdr_size
    masks = None
    if compression == 3:  # BI_BITFIELDS: masks precede/replace table
        if hdr_size == 40:
            raw_masks = payload[table_off : table_off + 12]
            if len(raw_masks) != 12:
                raise ValueError("corrupt BMP: truncated bitfield masks")
            masks = struct.unpack("<III", raw_masks)
            table_off += 12
        elif hdr_size >= 52:  # V2+ headers carry the masks in-header
            raw_masks = payload[off + 40 : off + 52]
            if len(raw_masks) != 12:
                raise ValueError("corrupt BMP: truncated bitfield masks")
            masks = struct.unpack("<III", raw_masks)
        else:
            # 40 < hdr_size < 52: no room for in-header masks; reading
            # past the declared header would pick up palette/pixel bytes
            # as channel masks (silently wrong colors)
            raise ValueError(
                f"corrupt BMP: BI_BITFIELDS header size {hdr_size} has "
                "no room for channel masks"
            )
    elif compression not in (0, 1, 2):
        raise ValueError(f"corrupt BMP: unsupported compression {compression}")

    palette = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        raw = payload[table_off : table_off + 4 * n]
        if len(raw) != 4 * n:
            raise ValueError("corrupt BMP: truncated color table")
        bgra = np.frombuffer(raw, dtype=np.uint8).reshape(n, 4)
        palette = bgra[:, [2, 1, 0]].copy()  # BGRX -> RGB
        table_off += 4 * n

    data_off = table_off if ico_mask else struct.unpack("<I", payload[10:14])[0]

    def rows_bottom_up(img: np.ndarray) -> np.ndarray:
        return img if top_down else img[::-1]

    if compression in (1, 2):  # RLE8 / RLE4
        if bpp != (8 if compression == 1 else 4):
            raise ValueError("corrupt BMP: RLE/bpp mismatch")
        idx = _decode_rle(payload[data_off:], w, h, rle4=compression == 2)
        if palette is None or idx.max(initial=0) >= len(palette):
            raise ValueError("corrupt BMP: palette index out of range")
        return rows_bottom_up(palette[idx])

    stride = (w * bpp + 31) // 32 * 4
    need = stride * h
    raw = payload[data_off : data_off + need]
    if len(raw) != need:
        raise ValueError("corrupt BMP: truncated pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    if bpp == 24:
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        out = rows_bottom_up(img.copy())
    elif bpp == 32:
        # V4+ headers declare an alpha mask at off+52; 40-byte
        # BI_BITFIELDS headers don't (the alpha byte then keeps the
        # historical opaque-BGRA reading, am treated as the full byte).
        am = 0xFF000000
        if masks is not None and hdr_size >= 56:
            am = struct.unpack("<I", payload[off + 52 : off + 56])[0]
        if masks is not None and (
            tuple(masks) != (0xFF0000, 0x00FF00, 0x0000FF) or am != 0xFF000000
        ):
            # BI_BITFIELDS with a non-BGRA layout (RGBA/BGRX variants
            # some tools write), or a V4+ header whose declared alpha
            # mask differs from plain BGRA (am == 0 means NO alpha
            # channel → 3-channel output, not a transparent image):
            # decode through the declared masks.
            if hdr_size < 56:
                am = 0  # undeclared: nonstandard-mask BMPs emit RGB
            vals = (
                np.frombuffer(raw, dtype="<u4")
                .reshape(h, stride // 4)[:, :w]
                .astype(np.uint64)
            )
            chans = [_mask_chan(vals, m) for m in (*masks, am)]
            if am:
                img = np.stack(chans, axis=2)
            else:
                img = np.stack(chans[:3], axis=2)
            out = rows_bottom_up(img)
        else:
            px = rows[:, : w * 4].reshape(h, w, 4)
            img = px[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
            out = rows_bottom_up(img.copy())
    elif bpp == 16:
        vals = rows.view("<u2")[:, :w].astype(np.uint32)
        rm, gm, bm = masks if masks else (0x7C00, 0x03E0, 0x001F)
        img = np.stack(
            [_mask_chan(vals, rm), _mask_chan(vals, gm), _mask_chan(vals, bm)],
            axis=2,
        )
        out = rows_bottom_up(img)
    elif bpp in (1, 4, 8):
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            hi = rows >> 4
            lo = rows & 0x0F
            idx = np.stack([hi, lo], axis=2).reshape(h, -1)[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :w]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("corrupt BMP: palette index out of range")
        out = rows_bottom_up(palette[idx].copy())
    else:
        raise ValueError(f"corrupt BMP: unsupported bpp {bpp}")

    if ico_mask and bpp < 32:
        mask_off = data_off + need if compression == 0 else None
        if mask_off is not None:
            mstride = (w + 31) // 32 * 4
            mraw = payload[mask_off : mask_off + mstride * h]
            if len(mraw) == mstride * h:
                mbits = np.unpackbits(
                    np.frombuffer(mraw, dtype=np.uint8).reshape(h, mstride),
                    axis=1,
                )[:, :w]
                alpha = np.where(rows_bottom_up(mbits) == 0, 255, 0).astype(
                    np.uint8
                )
                if not (alpha == 255).all():
                    return np.dstack([out[:, :, :3], alpha])
    return out


def _decode_rle(data: bytes, w: int, h: int, rle4: bool) -> np.ndarray:
    """RLE8/RLE4 (bottom-up storage order) -> (h, w) index array."""
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data):
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count:  # encoded run
            if rle4:
                pair = [(val >> 4) & 0x0F, val & 0x0F]
                run = [pair[i & 1] for i in range(count)]
            else:
                run = [val] * count
            if y >= h or x + count > w:
                raise ValueError("corrupt BMP: RLE run overflows row")
            idx[y, x : x + count] = run
            x += count
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("corrupt BMP: truncated RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal pixels, word-aligned
            n_bytes = (val + 1) // 2 if rle4 else val
            chunk = data[pos : pos + n_bytes]
            if len(chunk) != n_bytes:
                raise ValueError("corrupt BMP: truncated RLE literals")
            pos += n_bytes + (n_bytes & 1)
            if rle4:
                vals = []
                for b in chunk:
                    vals.extend([(b >> 4) & 0x0F, b & 0x0F])
                vals = vals[:val]
            else:
                vals = list(chunk)
            if y >= h or x + val > w:
                raise ValueError("corrupt BMP: RLE literals overflow row")
            idx[y, x : x + val] = vals
            x += val
    return idx


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP file to (h, w, 3|4) uint8 RGB(A)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (no BM magic)")
    if len(payload) < 26:
        raise ValueError("corrupt BMP: truncated file header")
    img = _decode_dib(payload, 14)
    # BMP's RLE index storage is bottom-up but _decode_rle fills
    # top-to-bottom in storage order; _decode_dib flipped already
    return img


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (h, w, 1|3) uint8 as an uncompressed bottom-up BMP —
    8-bit palettized when the image is grayscale, 24-bit BGR
    otherwise."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) uint8, got {img.shape}")
    h, w, c = img.shape
    if c == 1:  # 8-bit palettized grayscale
        stride = (w + 3) // 4 * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w] = img[::-1, :, 0]
        table = b"".join(bytes([i, i, i, 0]) for i in range(256))
        data_off = 14 + 40 + 1024
        pixels = rows.tobytes()
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels), 2835, 2835, 256, 0
        )
        head = struct.pack(
            "<2sIHHI", b"BM", data_off + len(pixels), 0, 0, data_off
        )
        return head + info + table + pixels
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    data_off = 14 + 40
    pixels = rows.tobytes()
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", data_off + len(pixels), 0, 0, data_off)
    return head + info + pixels


def decode_ico(payload: bytes, entry: int | None = None) -> np.ndarray:
    """Decode one image from an ICO container (the largest entry by
    default). PNG-compressed entries route through the PNG decoder;
    classic entries are headerless DIBs with the doubled-height AND
    mask applied as alpha."""
    from secure_agent_api_vector_search_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
    )

    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    n = struct.unpack("<H", payload[4:6])[0]
    if n == 0:
        raise ValueError("corrupt ICO: no images")
    entries = []
    for i in range(n):
        e = payload[6 + 16 * i : 22 + 16 * i]
        if len(e) != 16:
            raise ValueError("corrupt ICO: truncated directory")
        ew, eh = e[0] or 256, e[1] or 256
        size, off = struct.unpack("<II", e[8:16])
        entries.append((ew * eh, size, off))
    if entry is None:
        entry = max(range(n), key=lambda i: entries[i][0])
    _, size, off = entries[entry]
    if off + size > len(payload):
        raise ValueError("corrupt ICO: entry beyond file end")
    body = payload[off : off + size]
    if body[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(body)
    return _decode_dib(payload, off, ico_mask=True)


def encode_ico(img: np.ndarray) -> bytes:
    """Encode (h, w, 1|3) uint8 as a single-entry classic ICO
    (headerless 24-bit DIB + all-opaque AND mask)."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) uint8, got {img.shape}")
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    h, w, _ = img.shape
    if h > 256 or w > 256:
        raise ValueError("ICO entries are at most 256x256")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    mstride = (w + 31) // 32 * 4
    mask = np.zeros((h, mstride), dtype=np.uint8)  # all-zero = opaque
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0,
        len(rows.tobytes()) + len(mask.tobytes()), 0, 0, 0, 0,
    )
    body = info + rows.tobytes() + mask.tobytes()
    head = b"\x00\x00\x01\x00\x01\x00"
    dir_entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 24, len(body), 22
    )
    return head + dir_entry + body
