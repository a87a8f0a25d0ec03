"""AVI/RIFF container (operators/avi.py): chunk walk with word
alignment, stream-header codec dispatch, movi frame extraction, and
descriptive rejection seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import avi as AV
from secure_agent_api_vector_search_spark.operators.multimodal import decode_video


def _flat_frames(n: int = 6, seed: int = 5) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    vals = rng.integers(120, 230, (2, 3), dtype=np.uint8)
    base = np.repeat(np.repeat(vals, 8, 0), 8, 1)[:, :, None]
    return [
        np.clip(base.astype(np.int32) + 4 * t, 0, 255).astype(np.uint8)
        for t in range(n)
    ]


def test_avi_lossless_roundtrip():
    frames = _flat_frames(6)
    out = AV.decode_avi(AV.encode_avi_mjpeg(frames))
    assert len(out) == 6
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_avi_odd_chunk_padding():
    """Restart markers perturb JPEG sizes; odd-sized chunks must be
    word-aligned without corrupting the walk."""
    frames = _flat_frames(5)
    payload = AV.encode_avi_mjpeg(frames, quality=93, restart_interval=1)
    sizes = []
    pos = payload.index(b"movi") + 4
    while payload[pos : pos + 4] == b"00dc":
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        sizes.append(size)
        pos += 8 + size + (size & 1)
    assert len(sizes) == 5
    assert any(s & 1 for s in sizes), "fixture should produce odd chunks"
    out = AV.decode_avi(payload)
    assert len(out) == 5
    assert np.array_equal(out[0], frames[0])


def test_avi_decode_video_sniff():
    frames = _flat_frames(4)
    out = decode_video(AV.encode_avi_mjpeg(frames))
    assert len(out) == 4
    assert np.array_equal(out[3], frames[3])


def test_avi_track_summary():
    payload = AV.encode_avi_mjpeg(_flat_frames(7))
    s = AV.avi_track_summary(payload)
    assert s["video_fourcc"] == "MJPG"
    assert s["n_frames"] == 7
    assert s["decodable"] is True


def test_avi_rejects_compressed_codecs_by_name():
    payload = bytearray(AV.encode_avi_mjpeg(_flat_frames(2)))
    i = payload.index(b"MJPG")  # strh fccHandler
    payload[i : i + 4] = b"XVID"
    with pytest.raises(NotImplementedError, match="XVID"):
        AV.decode_avi(bytes(payload))
    payload[i : i + 4] = b"zzzz"
    with pytest.raises(ValueError, match="unknown video fourcc"):
        AV.decode_avi(bytes(payload))


def test_avi_corruption_is_descriptive():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        AV.decode_avi(b"RIFF\x10\x00\x00\x00WAVEdata\x00\x00\x00\x00")
    payload = AV.encode_avi_mjpeg(_flat_frames(2))
    bad = bytearray(payload)
    i = bad.index(b"movi") - 8  # the movi LIST's size field
    struct.pack_into("<I", bad, i + 4, 1 << 24)
    with pytest.raises(ValueError, match="overruns"):
        AV.decode_avi(bytes(bad))


def test_avi_encode_empty_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        AV.encode_avi_mjpeg([])
