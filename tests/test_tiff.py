"""Baseline TIFF codec (operators/tiff.py): round trips across
compressions, strip layouts, the LZW early-change boundary, the
horizontal predictor, photometric variants, real-file interop, and
the by-name rejection seams."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import tiff as T
from secure_agent_api_vector_search_spark.operators.multimodal import decode_image


def _rand(h, w, c=3, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw"])
def test_tiff_roundtrip_compressions(comp):
    img = _rand(37, 29)
    assert np.array_equal(T.decode_tiff(T.encode_tiff(img, compression=comp)), img)


def test_tiff_multi_strip_and_predictor():
    img = _rand(23, 17, seed=7)
    p = T.encode_tiff(img, compression="lzw", rows_per_strip=5, predictor=True)
    assert np.array_equal(T.decode_tiff(p), img)
    g = _rand(16, 23, c=1, seed=9)
    p2 = T.encode_tiff(g, compression="packbits", rows_per_strip=3)
    assert np.array_equal(T.decode_tiff(p2), g)


def test_tiff_lzw_early_change_boundaries():
    """200x300 RGB noise drives the LZW table through every width
    change (511/1023/2047) and past 4093 into Clear resets — the
    early-change rule must stay consistent on both sides."""
    img = _rand(200, 300, seed=11)
    assert np.array_equal(
        T.decode_tiff(T.encode_tiff(img, compression="lzw")), img
    )


def test_tiff_packbits_runs_compress():
    """A grayscale image with long byte runs must actually shrink
    under PackBits (RGB pixel repeats are R,G,B,R,G,B byte patterns —
    NOT byte runs — so the run source must be single-channel)."""
    img = np.repeat(_rand(10, 5, c=1, seed=13), 8, axis=1)
    p_none = T.encode_tiff(img)
    p_pb = T.encode_tiff(img, compression="packbits")
    assert len(p_pb) < len(p_none)
    assert np.array_equal(T.decode_tiff(p_pb), img)


def test_tiff_decode_image_dispatch():
    img = _rand(12, 12, seed=17)
    assert np.array_equal(decode_image(T.encode_tiff(img)), img)


def test_tiff_real_file_interop_matches_bmp_twin():
    """python.tiff and python.bmp in the stdlib test data are the SAME
    16x16 RGBA image — both decoders must agree pixel-for-pixel."""
    tiffs = glob.glob(
        "/root/.pyenv/versions/*/lib/python3*/test/imghdrdata/python.tiff"
    )
    bmps = glob.glob(
        "/root/.pyenv/versions/*/lib/python3*/test/imghdrdata/python.bmp"
    )
    if not tiffs or not bmps:
        pytest.skip("stdlib image samples not present")
    from secure_agent_api_vector_search_spark.operators.bmp import decode_bmp

    t_img = T.decode_tiff(open(tiffs[0], "rb").read())
    b_img = decode_bmp(open(bmps[0], "rb").read())
    assert t_img.shape == (16, 16, 4)
    assert np.array_equal(t_img, b_img)


def test_tiff_min_is_white_inverts():
    g = _rand(6, 6, c=1, seed=19)
    payload = bytearray(T.encode_tiff(g))
    i = payload.index(struct.pack("<HHI", 262, 3, 1))
    payload[i + 8] = 0  # photometric: min-is-white
    out = T.decode_tiff(bytes(payload))
    assert np.array_equal(out, 255 - g)


def test_tiff_rejections_are_descriptive():
    with pytest.raises(ValueError, match="not a TIFF"):
        T.decode_tiff(b"II+\x00" + b"\x00" * 20)
    g = _rand(5, 5, c=1, seed=21)
    payload = bytearray(T.encode_tiff(g))
    i = payload.index(struct.pack("<HHI", 259, 3, 1))
    payload[i + 8] = 7  # JPEG-in-TIFF
    with pytest.raises(NotImplementedError, match="JPEG"):
        T.decode_tiff(bytes(payload))
    payload[i + 8] = 4  # CCITT G4
    with pytest.raises(NotImplementedError, match="CCITT"):
        T.decode_tiff(bytes(payload))
    with pytest.raises(ValueError, match="truncated|beyond"):
        T.decode_tiff(bytes(T.encode_tiff(g))[:30])
