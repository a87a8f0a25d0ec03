"""GIF codec (operators/gif.py): LZW round trips across palette sizes
and table-reset boundaries, interlace, animation compositing/disposal,
transparency, descriptive corruption errors, and interop with real
GIFs produced by real encoders (the tk/idlelib icons this container's
Python ships)."""

from __future__ import annotations

import glob
import struct
import sys

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import gif as G
from secure_agent_api_vector_search_spark.operators.multimodal import decode_image


def _paletted(h, w, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


@pytest.mark.parametrize("n_colors", [2, 5, 64, 256])
def test_gif_roundtrip_palette_sizes(n_colors):
    img = _paletted(23, 31, n_colors, seed=n_colors)
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)


def test_gif_roundtrip_interlaced():
    img = _paletted(37, 19, 16, seed=3)
    payload = G.encode_gif(img, interlace=True)
    assert payload[:6] == b"GIF89a"
    assert np.array_equal(G.decode_gif(payload), img)


def test_gif_grayscale_input_expands_channels():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    out = G.decode_gif(G.encode_gif(g))
    assert np.array_equal(out, np.repeat(g, 3, axis=2))


def test_gif_lzw_table_reset_on_noise():
    """256-color noise at 200x300 pushes the LZW table past the reset
    threshold several times — decode must stay exact across CLEARs."""
    img = _paletted(200, 300, 256, seed=9)
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)


def test_gif_too_many_colors_rejected():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)  # ~4k colors
    with pytest.raises(ValueError, match="256 distinct colors"):
        G.encode_gif(img)


def test_gif_decode_image_dispatch():
    img = _paletted(12, 12, 8, seed=5)
    assert np.array_equal(decode_image(G.encode_gif(img)), img)


def test_gif_transparency_composites_over_background():
    """A transparent-color frame must leave the canvas (background)
    visible where the transparent index sits."""
    img = np.zeros((4, 4, 3), np.uint8)
    img[:2] = [10, 20, 30]
    img[2:] = [200, 201, 202]  # this color declared transparent
    payload = G.encode_gif(img, transparent_rgb=(200, 201, 202))
    out = G.decode_gif(payload)
    assert np.array_equal(out[:2], img[:2])
    # transparent region shows the background (color-table entry 0)
    assert (out[2:] == out[2, 0]).all()


def _animated_two_frames() -> tuple[bytes, np.ndarray, np.ndarray]:
    """Hand-build a 2-frame animation: full red frame, then a 2x2 green
    sub-rectangle at (1,1) with disposal=1 (leave in place)."""
    f1 = G.encode_gif(np.full((4, 4, 3), [200, 0, 0], np.uint8))
    f2 = G.encode_gif(np.full((2, 2, 3), [0, 200, 0], np.uint8))

    def image_block(payload: bytes) -> bytes:
        i = payload.index(b"\x2c")
        return payload[i:-1]  # strip trailer, keep descriptor+data

    # splice: header+LSD+GCT of f1, GCE(disposal=1), image1, then
    # image2's descriptor repositioned to (1,1) with its local table
    head = f1[: 13 + 3 * 2]  # GIF89a + LSD + 2-entry GCT
    img1 = image_block(f1)
    img2 = bytearray(image_block(f2))
    # make frame 2's color table LOCAL: copy f2's global table in
    f2_ct = f2[13 : 13 + 6]
    struct.pack_into("<HH", img2, 1, 1, 1)  # left=1, top=1
    img2[9] = 0x80 | 0x00  # local color table, 2 entries
    img2 = bytes(img2[:10]) + f2_ct + bytes(img2[10:])
    gce = bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])  # disposal=1
    payload = head + gce + img1 + gce + img2 + b"\x3b"
    expect1 = np.full((4, 4, 3), [200, 0, 0], np.uint8)
    expect2 = expect1.copy()
    expect2[1:3, 1:3] = [0, 200, 0]
    return payload, expect1, expect2


def test_gif_animation_composites_subrectangle():
    payload, e1, e2 = _animated_two_frames()
    frames = G.decode_gif_frames(payload)
    assert len(frames) == 2
    assert np.array_equal(frames[0], e1)
    assert np.array_equal(frames[1], e2)
    # decode_gif = first frame
    assert np.array_equal(G.decode_gif(payload), e1)


def test_gif_corruption_is_descriptive():
    with pytest.raises(ValueError, match="not a GIF"):
        G.decode_gif(b"NOTGIF" + b"\x00" * 20)
    img = _paletted(9, 9, 4, seed=2)
    payload = G.encode_gif(img)
    with pytest.raises(ValueError, match="corrupt GIF"):
        G.decode_gif(payload[:20])  # truncated mid-stream
    # out-of-range LZW code: corrupt the compressed bytes hard
    bad = bytearray(payload)
    i = bad.index(b"\x2c") + 11
    for j in range(i, min(i + 12, len(bad) - 2)):
        bad[j] = 0xFF
    with pytest.raises(ValueError, match="corrupt GIF"):
        G.decode_gif(bytes(bad))


def test_gif_real_file_interop():
    """Decode GIFs produced by real encoders (idlelib ships in this
    container's stdlib). Shapes are known constants of those files."""
    icons = glob.glob(sys.prefix + "/lib/python3*/idlelib/Icons/idle_16.gif")
    if not icons:
        pytest.skip("idlelib icons not present")
    img = G.decode_gif(open(icons[0], "rb").read())
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8
    # re-encode our decode and decode again: exact (GIF is lossless
    # and 16x16 icons stay under 256 colors)
    assert np.array_equal(G.decode_gif(G.encode_gif(img)), img)
