"""BMP/DIB and ICO decoders (operators/bmp.py): round trips across bit
depths, RLE streams, row orders, real-file interop (the container's
python.bmp and idle.ico), and descriptive corruption errors."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import bmp as B
from secure_agent_api_vector_search_spark.operators.multimodal import decode_image


def _rand(h, w, c=3, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def test_bmp_24bit_roundtrip_with_stride_padding():
    for w in (7, 8, 17):  # 7/17 force stride padding
        img = _rand(5, w, seed=w)
        assert np.array_equal(B.decode_bmp(B.encode_bmp(img)), img)


def test_bmp_8bit_palettized_grayscale():
    g = _rand(9, 11, c=1, seed=5)
    out = B.decode_bmp(B.encode_bmp(g))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))


def test_bmp_top_down_rows():
    """A negative height means top-down storage — flip must not apply."""
    img = _rand(6, 4, seed=7)
    payload = bytearray(B.encode_bmp(img))
    # negate the height field and un-flip the pixel rows
    h = struct.unpack("<i", payload[14 + 8 : 14 + 12])[0]
    struct.pack_into("<i", payload, 14 + 8, -h)
    stride = (4 * 3 + 3) // 4 * 4
    rows = np.frombuffer(payload[54:], dtype=np.uint8).reshape(h, stride)
    payload[54:] = rows[::-1].tobytes()
    assert np.array_equal(B.decode_bmp(bytes(payload)), img)


def test_bmp_rle8_with_all_escapes():
    """Hand-built RLE8: runs, end-of-line, absolute literals, delta,
    end-of-bitmap — pinned against the expected index grid."""
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    rle = bytes([
        4, 10, 0, 0,          # row 0 (stored bottom-up): run of 4
        2, 20, 2, 30, 0, 0,   # row 1: two runs
        3, 40, 1, 50, 0, 1,   # row 2: run 3 + run 1, end of bitmap
    ])
    info = struct.pack("<IiiHHIIiiII", 40, 4, 3, 1, 8, 1, len(rle), 0, 0, 256, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + 1024 + len(rle), 0, 0,
                       14 + 40 + 1024)
    out = B.decode_bmp(head + info + pal + rle)
    expect = np.zeros((3, 4, 3), np.uint8)
    expect[2] = 10
    expect[1, :2] = 20
    expect[1, 2:] = 30
    expect[0, :3] = 40
    expect[0, 3] = 50
    assert np.array_equal(out, expect)


def test_ico_roundtrip_and_dispatch():
    img = _rand(13, 17, seed=11)
    ico = B.encode_ico(img)
    assert np.array_equal(B.decode_ico(ico), img)
    assert np.array_equal(decode_image(ico), img)
    assert np.array_equal(decode_image(B.encode_bmp(img)), img)


def test_bmp_real_file_interop():
    files = glob.glob(
        "/root/.pyenv/versions/*/lib/python3*/test/imghdrdata/python.bmp"
    )
    if not files:
        pytest.skip("stdlib bmp sample not present")
    img = B.decode_bmp(open(files[0], "rb").read())
    assert img.shape == (16, 16, 4)  # real file is 32-bit BGRA
    assert img.dtype == np.uint8


def test_ico_real_file_all_entries_decode():
    """idle.ico carries classic DIB entries AND a 256x256 PNG entry —
    the directory walk must decode every one, routing PNG through the
    PNG decoder."""
    files = glob.glob("/root/.pyenv/versions/*/lib/python3*/idlelib/Icons/idle.ico")
    if not files:
        pytest.skip("idle.ico not present")
    payload = open(files[0], "rb").read()
    n = struct.unpack("<H", payload[4:6])[0]
    assert n >= 2
    sizes = set()
    for i in range(n):
        img = B.decode_ico(payload, entry=i)
        assert img.ndim == 3 and img.dtype == np.uint8
        sizes.add(img.shape[:2])
    assert (256, 256) in sizes  # the PNG-compressed entry
    # default = largest entry
    assert B.decode_ico(payload).shape[:2] == (256, 256)


def test_bmp_corruption_is_descriptive():
    with pytest.raises(ValueError, match="not a BMP"):
        B.decode_bmp(b"XX" + b"\x00" * 60)
    img = _rand(5, 5, seed=13)
    payload = B.encode_bmp(img)
    with pytest.raises(ValueError, match="corrupt BMP"):
        B.decode_bmp(payload[:40])
    with pytest.raises(ValueError, match="not an ICO"):
        B.decode_ico(b"\x00\x00\x02\x00" + b"\x00" * 20)  # CUR, not ICO
    trunc = bytearray(B.encode_ico(img))
    struct.pack_into("<I", trunc, 6 + 8, 1 << 24)  # entry size overruns
    with pytest.raises(ValueError, match="corrupt ICO"):
        B.decode_ico(bytes(trunc))


def test_bmp_32bpp_bitfields_nonstandard_masks():
    """A 32-bpp BI_BITFIELDS BMP with RGBA-byte-order masks (R low
    byte) must decode through the declared masks, not the assumed
    BGRA layout (ADVICE r9)."""
    h, w = 3, 5
    img = _rand(h, w, seed=21)
    # pack pixels as little-endian uint32 with R in the LOW byte
    vals = (
        img[:, :, 0].astype(np.uint32)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | (img[:, :, 2].astype(np.uint32) << 16)
    )
    pix = vals[::-1].astype("<u4").tobytes()  # bottom-up rows
    masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
    head = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + 12 + len(pix), 0, 0, 14 + 40 + 12
    )
    out = B.decode_bmp(head + info + masks + pix)
    assert np.array_equal(out, img)


def test_bmp_32bpp_bitfields_v4_alpha_mask():
    """A BITMAPV4 (108-byte header) bitfields BMP with a declared alpha
    mask decodes to RGBA through all four masks."""
    h, w = 2, 3
    img = _rand(h, w, c=4, seed=22)
    vals = (
        (img[:, :, 0].astype(np.uint32) << 24)   # R high byte
        | (img[:, :, 1].astype(np.uint32) << 16)
        | (img[:, :, 2].astype(np.uint32) << 8)
        | img[:, :, 3].astype(np.uint32)          # A low byte
    )
    pix = vals[::-1].astype("<u4").tobytes()
    v4 = struct.pack("<IiiHHIIiiII", 108, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
    v4 += struct.pack("<IIII", 0xFF000000, 0x00FF0000, 0x0000FF00, 0x000000FF)
    v4 += b"\x00" * (108 - len(v4))
    head = struct.pack("<2sIHHI", b"BM", 14 + 108 + len(pix), 0, 0, 14 + 108)
    out = B.decode_bmp(head + v4 + pix)
    assert out.shape == (h, w, 4)
    assert np.array_equal(out, img)


def test_bmp_v4_standard_masks_zero_alpha_mask_is_rgb():
    """A BITMAPV4 bitfields BMP with STANDARD BGR color masks but a
    declared alpha mask of 0 has no alpha channel: it must decode to
    3-channel RGB through the masks path, not publish the reserved
    byte (often 0) as full transparency (code-review r10)."""
    h, w = 2, 3
    img = _rand(h, w, seed=31)
    vals = (
        (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    )  # standard BGRA byte order with reserved byte 0
    pix = vals[::-1].astype("<u4").tobytes()
    v4 = struct.pack("<IiiHHIIiiII", 108, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
    v4 += struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, 0)
    v4 += b"\x00" * (108 - len(v4))
    head = struct.pack("<2sIHHI", b"BM", 14 + 108 + len(pix), 0, 0, 14 + 108)
    out = B.decode_bmp(head + v4 + pix)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, img)


def test_bmp_v4_standard_masks_standard_alpha_keeps_fast_path():
    """Standard masks + am=0xFF000000 is exactly the BGRA layout — the
    fast path must keep round-tripping RGBA."""
    h, w = 2, 2
    img = _rand(h, w, c=4, seed=32)
    vals = (
        (img[:, :, 3].astype(np.uint32) << 24)
        | (img[:, :, 0].astype(np.uint32) << 16)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | img[:, :, 2].astype(np.uint32)
    )
    pix = vals[::-1].astype("<u4").tobytes()
    v4 = struct.pack("<IiiHHIIiiII", 108, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
    v4 += struct.pack("<IIII", 0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000)
    v4 += b"\x00" * (108 - len(v4))
    head = struct.pack("<2sIHHI", b"BM", 14 + 108 + len(pix), 0, 0, 14 + 108)
    out = B.decode_bmp(head + v4 + pix)
    assert out.shape == (h, w, 4)
    assert np.array_equal(out, img)


def test_bmp_bitfields_undersized_header_rejected():
    """BI_BITFIELDS with 40 < hdr_size < 52 has no room for in-header
    masks; reading past the declared header would treat palette/pixel
    bytes as channel masks (ADVICE r10).  Must reject via the decoder's
    ValueError contract, and a truncated mask block must not surface a
    raw struct.error."""
    h, w = 2, 2
    img = _rand(h, w, seed=31)
    vals = (
        img[:, :, 2].astype(np.uint32)
        | (img[:, :, 1].astype(np.uint32) << 8)
        | (img[:, :, 0].astype(np.uint32) << 16)
    )
    pix = vals[::-1].astype("<u4").tobytes()
    # declared header size 44: no in-header masks, no post-header masks
    info = struct.pack("<IiiHHIIiiII", 44, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
    info += b"\x00" * 4  # the 4 declared-but-maskless extra header bytes
    head = struct.pack("<2sIHHI", b"BM", 14 + len(info) + len(pix), 0, 0, 14 + len(info))
    with pytest.raises(ValueError, match="no room for channel masks"):
        B.decode_bmp(head + info + pix)
    # hdr_size == 40 with the mask block truncated: ValueError, not struct.error
    info40 = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 3, len(pix), 0, 0, 0, 0)
    head40 = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8, 0, 0, 14 + 40 + 12)
    with pytest.raises(ValueError, match="truncated bitfield masks"):
        B.decode_bmp(head40 + info40 + b"\x00" * 8)
