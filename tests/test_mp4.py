"""ISO-BMFF container (operators/mp4.py): box walk, sample-table
expansion, per-sample JPEG decode, and the descriptive rejection seams.
The writer/reader pair is exercised across chunking layouts, and the
reader is additionally fed hand-patched co64/largesize variants so the
64-bit paths are tested, not just written."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import mp4 as M4
from secure_agent_api_vector_search_spark.operators.multimodal import decode_video


def _flat_frames(n: int = 7, seed: int = 7) -> list[np.ndarray]:
    """Block-flat frames that survive baseline JPEG losslessly."""
    rng = np.random.default_rng(seed)
    vals = rng.integers(120, 230, (3, 4), dtype=np.uint8)
    base = np.repeat(np.repeat(vals, 8, 0), 8, 1)[:, :, None]
    return [
        np.clip(base.astype(np.int32) + 4 * t, 0, 255).astype(np.uint8)
        for t in range(n)
    ]


def test_mp4_lossless_roundtrip_ragged_chunks():
    frames = _flat_frames(7)
    payload = M4.encode_mp4_mjpeg(frames, samples_per_chunk=3)  # 3+3+1
    out = M4.decode_mp4(payload)
    assert len(out) == 7
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("n,spc", [(2, 10), (6, 2), (1, 1), (5, 1)])
def test_mp4_chunking_layouts(n, spc):
    frames = _flat_frames(n)
    out = M4.decode_mp4(M4.encode_mp4_mjpeg(frames, samples_per_chunk=spc))
    assert len(out) == n
    assert np.array_equal(out[-1], frames[-1])


def test_mp4_track_summary_no_decode():
    payload = M4.encode_mp4_mjpeg(_flat_frames(5), samples_per_chunk=2)
    s = M4.mp4_track_summary(payload)
    assert s["sample_format"] == "jpeg"
    assert s["n_samples"] == 5
    assert s["decodable"] is True
    assert s["sample_bytes"] > 0


def test_decode_video_sniffs_mp4():
    frames = _flat_frames(4)
    out = decode_video(M4.encode_mp4_mjpeg(frames))
    assert len(out) == 4
    assert np.array_equal(out[2], frames[2])


def _patch_stco_to_co64(payload: bytes) -> bytes:
    """Rewrite the stco box as co64 (64-bit chunk offsets). The box
    grows, which sits AFTER mdat in our layout, so sample offsets are
    unaffected."""
    i = payload.index(b"stco") - 4
    size = struct.unpack(">I", payload[i : i + 4])[0]
    body = payload[i + 8 : i + size]
    n = struct.unpack(">I", body[4:8])[0]
    offs = struct.unpack(f">{n}I", body[8 : 8 + 4 * n])
    new_body = body[:4] + struct.pack(">I", n) + b"".join(
        struct.pack(">Q", o) for o in offs
    )
    new_box = struct.pack(">I", 8 + len(new_body)) + b"co64" + new_body
    out = payload[:i] + new_box + payload[i + size :]
    # fix every enclosing box size on the moov→stbl spine (+8 bytes)
    grown = len(new_box) - size
    pos = out.index(b"moov") - 4
    for fourcc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.index(fourcc, pos) - 4
        sz = struct.unpack(">I", out[j : j + 4])[0]
        out = out[:j] + struct.pack(">I", sz + grown) + out[j + 4 :]
        pos = j + 8
    return out


def test_mp4_co64_offsets():
    frames = _flat_frames(6)
    payload = _patch_stco_to_co64(M4.encode_mp4_mjpeg(frames, samples_per_chunk=2))
    out = M4.decode_mp4(payload)
    assert len(out) == 6
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)


def test_mp4_largesize_box():
    """A box with size==1 + 64-bit largesize must parse. moov is the
    last box and no stco offset points into it, so growing its header
    by 8 bytes leaves every sample range valid."""
    frames = _flat_frames(3)
    payload = M4.encode_mp4_mjpeg(frames)
    i = payload.index(b"moov") - 4
    size = struct.unpack(">I", payload[i : i + 4])[0]
    big = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", size + 8) + payload[i + 8 :]
    patched = payload[:i] + big
    out = M4.decode_mp4(patched)
    assert len(out) == 3
    assert np.array_equal(out[0], frames[0])


def test_mp4_rejects_compressed_codecs_by_name():
    payload = bytearray(M4.encode_mp4_mjpeg(_flat_frames(2)))
    i = payload.find(b"jpeg", payload.find(b"stsd"))
    payload[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="avc1"):
        M4.decode_mp4(bytes(payload))
    payload[i : i + 4] = b"zzzz"
    with pytest.raises(ValueError, match="unknown sample format"):
        M4.decode_mp4(bytes(payload))


def test_mp4_corruption_is_descriptive():
    with pytest.raises(ValueError, match="no ftyp"):
        M4.decode_mp4(b"\x00\x00\x00\x08free")
    payload = M4.encode_mp4_mjpeg(_flat_frames(2))
    # truncate mid-moov: the box walk must flag the overrun
    with pytest.raises(ValueError, match="corrupt MP4|truncated"):
        M4.decode_mp4(payload[: len(payload) - 20])
    # a box whose declared size overruns its container
    i = payload.index(b"stsz") - 4
    bad = bytearray(payload)
    bad[i : i + 4] = struct.pack(">I", 1 << 24)
    with pytest.raises(ValueError, match="overruns"):
        M4.decode_mp4(bytes(bad))


def test_mp4_encode_empty_rejected():
    with pytest.raises(ValueError, match="at least one frame"):
        M4.encode_mp4_mjpeg([])
