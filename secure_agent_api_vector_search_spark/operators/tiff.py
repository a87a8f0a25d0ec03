"""Baseline TIFF codec — pure stdlib/numpy, from the public TIFF 6.0
specification.

Scanned-document corpora are TIFF-heavy; the decode-everything stack
needs the baseline profile for real: both byte orders (II/MM), the IFD
tag walk (inline vs offset values, all the baseline field types),
multi-strip assembly, photometric interpretations 0/1 (grayscale,
min-is-white inverted), 2 (RGB, with an extra alpha sample), and 3
(palette via the 16-bit ColorMap), and three compressions —
uncompressed, PackBits (the byte-oriented RLE), and TIFF-variant LZW
(MSB-first bit packing, Clear/EOI codes, the spec's EARLY-CHANGE code
width rule — one code earlier than GIF's — and the optional
horizontal-differencing predictor). JPEG-in-TIFF and the CCITT fax
codecs are rejected BY NAME (the documented seam).

The writer emits all three compressions with configurable strip
heights, so reader and writer form a genuine test pair across strip
boundaries and LZW width changes; the uncompressed path is also
interop-tested on the real python.tiff this container's stdlib test
data ships. Corrupt input raises a descriptive ValueError — the shared
codec-module contract.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff"]

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_COMPRESSION_NAMES = {
    2: "CCITT Group 3 1D", 3: "CCITT Group 3 fax", 4: "CCITT Group 4 fax",
    6: "old-style JPEG", 7: "JPEG", 8: "Adobe Deflate", 32946: "Deflate",
}


# ---------------------------------------------------------------------------
# LZW (TIFF variant: MSB-first, early change)
# ---------------------------------------------------------------------------

_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = n = pos = 0
    prev: bytes | None = None
    while len(out) < expected:
        while n < width:
            if pos >= len(data):
                return bytes(out[:expected])  # tolerate missing EOI
            acc = (acc << 8) | data[pos]
            pos += 1
            n += 8
        code = (acc >> (n - width)) & ((1 << width) - 1)
        n -= width
        if code == _CLEAR:
            reset()
            prev = None
            continue
        if code == _EOI:
            break
        if code < len(table):
            seq = table[code]
        elif code == len(table) and prev is not None:
            seq = prev + prev[:1]
        else:
            raise ValueError(f"corrupt TIFF: LZW code {code} out of range")
        out += seq
        if prev is not None:
            table.append(prev + seq[:1])
            # EARLY CHANGE: grow one code before the table fills the
            # current width (TIFF 6.0 §13: "LZW compression ... uses
            # codes that are one smaller" than the naive rule)
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = seq
    if len(out) < expected:
        raise ValueError(
            f"corrupt TIFF: LZW strip yields {len(out)} of {expected} bytes"
        )
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = n = 0

    def emit(code: int, width: int):
        nonlocal acc, n
        acc = (acc << width) | code
        n += width
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # encoder mirror of the early-change rule, one step later
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code > 4093:
            emit(_CLEAR, width)
            table = fresh()
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# PackBits
# ---------------------------------------------------------------------------


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        h = data[pos]
        pos += 1
        if h < 128:  # literal run of h+1 bytes
            chunk = data[pos : pos + h + 1]
            if len(chunk) != h + 1:
                raise ValueError("corrupt TIFF: truncated PackBits literals")
            out += chunk
            pos += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if pos >= len(data):
                raise ValueError("corrupt TIFF: truncated PackBits run")
            out += bytes([data[pos]]) * (257 - h)
            pos += 1
        # h == 128: no-op
    if len(out) < expected:
        raise ValueError(
            f"corrupt TIFF: PackBits strip yields {len(out)} of {expected}"
        )
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i + 1
        while (
            j < n and j - i < 128
            and not (j + 1 < n and data[j] == data[j + 1])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _tag_values(bo: str, payload: bytes, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"corrupt TIFF: unknown field type {typ}")
    total = size * cnt
    if total > 4:
        off = struct.unpack(bo + "I", raw)[0]
        buf = payload[off : off + total]
        if len(buf) != total:
            raise ValueError("corrupt TIFF: tag value beyond file end")
    else:
        buf = raw[:total]
    if typ == 3:
        return list(struct.unpack(bo + f"{cnt}H", buf))
    if typ == 4:
        return list(struct.unpack(bo + f"{cnt}I", buf))
    if typ == 1:
        return list(buf)
    if typ == 5:
        vals = struct.unpack(bo + f"{2 * cnt}I", buf)
        return [(vals[2 * i], vals[2 * i + 1]) for i in range(cnt)]
    return list(buf)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode the first IFD of a baseline TIFF to (h, w, 1|3|4) uint8."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload (no II*/MM* magic)")
    if len(payload) < 8:
        raise ValueError("corrupt TIFF: truncated header")
    ifd_off = struct.unpack(bo + "I", payload[4:8])[0]
    if ifd_off + 2 > len(payload):
        raise ValueError("corrupt TIFF: IFD offset beyond file end")
    n = struct.unpack(bo + "H", payload[ifd_off : ifd_off + 2])[0]
    tags: dict[int, list] = {}
    for i in range(n):
        e = payload[ifd_off + 2 + 12 * i : ifd_off + 14 + 12 * i]
        if len(e) != 12:
            raise ValueError("corrupt TIFF: truncated IFD entry")
        tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
        tags[tag] = _tag_values(bo, payload, typ, cnt, e[8:])

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"corrupt TIFF: missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if not (0 < w and 0 < h and w * h <= 1 << 26):
        raise ValueError(
            f"corrupt TIFF: dimensions {w}x{h} (allocation guard "
            "67108864 pixels)"
        )
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"corrupt TIFF: only 8 bits/sample supported, got {bits}")
    compression = one(259, 1)
    photometric = one(262)
    predictor = one(317, 1)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("corrupt TIFF: missing/mismatched strip tables")
    rows_per_strip = one(278, h)

    if compression in _COMPRESSION_NAMES:
        raise NotImplementedError(
            f"TIFF compression {_COMPRESSION_NAMES[compression]!r} decode "
            "not implemented (documented seam: baseline/PackBits/LZW only)"
        )
    if compression not in (1, 5, 32773):
        raise ValueError(f"corrupt TIFF: unknown compression {compression}")

    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = payload[off : off + cnt]
        if len(raw) != cnt:
            raise ValueError("corrupt TIFF: strip beyond file end")
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = n_rows * w * spp
        if compression == 1:
            if len(raw) < expected:
                raise ValueError("corrupt TIFF: short uncompressed strip")
            data = raw[:expected]
        elif compression == 5:
            data = _lzw_decode(raw, expected)
        else:
            data = _packbits_decode(raw, expected)
        strip = np.frombuffer(data, dtype=np.uint8).reshape(n_rows, w, spp)
        if predictor == 2:  # horizontal differencing
            strip = np.cumsum(strip.astype(np.uint16), axis=1).astype(np.uint8)
        elif predictor != 1:
            raise ValueError(f"corrupt TIFF: unknown predictor {predictor}")
        rows.append(strip)
    img = np.concatenate(rows, axis=0)

    if photometric == 3:  # palette
        cmap = tags.get(320)
        if not cmap or len(cmap) != 3 * 256 or spp != 1:
            raise ValueError("corrupt TIFF: bad palette")
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, 256).T >> 8).astype(
            np.uint8
        )
        return pal[img[:, :, 0]]
    if photometric == 0:  # min-is-white grayscale
        return (255 - img[:, :, :1]).copy()
    if photometric == 1:
        return img[:, :, :1].copy()
    if photometric == 2:
        if spp == 3:
            return img.copy()
        if spp == 4:
            return img.copy()  # RGBA
        raise ValueError(f"corrupt TIFF: RGB with {spp} samples")
    raise ValueError(f"corrupt TIFF: unsupported photometric {photometric}")


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: bool = False,
) -> bytes:
    """Encode (h, w, 1|3) uint8 as little-endian baseline TIFF with the
    given compression ('none' | 'packbits' | 'lzw'), optional
    horizontal-differencing predictor (LZW only), and configurable
    strip height (default: single strip)."""
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) uint8, got {img.shape}")
    if compression not in ("none", "packbits", "lzw"):
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and compression != "lzw":
        raise ValueError("predictor is an LZW option")
    h, w, spp = img.shape
    rows_per_strip = rows_per_strip or h
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]

    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        strip = img[y0 : y0 + rows_per_strip]
        if predictor:
            s16 = strip.astype(np.int16)
            diff = s16.copy()
            diff[:, 1:] = s16[:, 1:] - s16[:, :-1]
            strip = (diff % 256).astype(np.uint8)
        raw = strip.tobytes()
        if compression == "none":
            strips.append(raw)
        elif compression == "packbits":
            strips.append(_packbits_encode(raw))
        else:
            strips.append(_lzw_encode(raw))

    n_strips = len(strips)
    # layout: header(8) | strip data | [strip tables] | IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    extra = bytearray()

    def arr_value(values: list[int], typ_size: int, pack: str) -> tuple[int, bytes]:
        """(inline-or-offset word, appended bytes) for an array tag."""
        nonlocal pos
        raw = b"".join(struct.pack("<" + pack, v) for v in values)
        if len(raw) <= 4:
            return int.from_bytes(raw.ljust(4, b"\x00"), "little"), b""
        off = pos + len(extra)
        extra.extend(raw)
        return off, raw

    entries: list[tuple[int, int, int, int]] = []

    def tag(t: int, typ: int, cnt: int, val: int):
        entries.append((t, typ, cnt, val))

    off_word, _ = arr_value(strip_offsets, 4, "I")
    cnt_word, _ = arr_value([len(s) for s in strips], 4, "I")
    tag(256, 3, 1, w)
    tag(257, 3, 1, h)
    if spp == 3:
        bits_word, _ = arr_value([8, 8, 8], 2, "H")
        tag(258, 3, 3, bits_word)
    else:
        tag(258, 3, 1, 8)
    tag(259, 3, 1, comp_code)
    tag(262, 3, 1, 2 if spp == 3 else 1)
    tag(273, 4, n_strips, off_word)
    tag(277, 3, 1, spp)
    tag(278, 3, 1, rows_per_strip)
    tag(279, 4, n_strips, cnt_word)
    if predictor:
        tag(317, 3, 1, 2)
    entries.sort()

    ifd_off = pos + len(extra)
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    for s in strips:
        out += s
    out += extra
    out += struct.pack("<H", len(entries))
    for t, typ, cnt, val in entries:
        out += struct.pack("<HHII", t, typ, cnt, val & 0xFFFFFFFF)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
