"""AVI (RIFF) container — pure stdlib, from the public RIFF/AVI layout.

Motion-JPEG's native habitat: cameras and scanners overwhelmingly wrap
MJPEG in AVI ('MJPG' fourcc), not elementary streams. With the
from-scratch JPEG codec (operators/jpeg.py) in hand, the container
layer is a RIFF chunk walk: LIST/hdrl stream headers (strh/strf) to
learn the codec fourcc, LIST/movi for the frame chunks ('##dc'/'##db',
word-aligned), per-frame JPEG decode. Compressed codecs (H.264 'H264',
Xvid, VP8x...) are rejected BY NAME — the same documented-seam contract
as operators/mp4.py.

The writer emits a minimal valid AVI (avih + strh/strf + movi + idx1),
so writer and reader are a real test pair; decode_video sniffs
RIFF+'AVI ' alongside RAWV, raw MJPEG, and ISO-BMFF.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_avi_mjpeg", "decode_avi", "avi_track_summary"]

_MJPEG_FOURCC = {b"MJPG", b"mjpg", b"dmb1", b"jpeg"}
_KNOWN_COMPRESSED = {b"H264", b"h264", b"X264", b"XVID", b"xvid", b"DIVX",
                     b"divx", b"VP80", b"VP90", b"FMP4", b"WMV3"}


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each RIFF chunk in
    buf[start:end]; chunks are word-aligned (odd sizes pad one byte)."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(f"corrupt AVI: chunk {fourcc!r} overruns container")
        yield fourcc, body, body + size
        pos = body + size + (size & 1)
    if pos < end:
        raise ValueError("corrupt AVI: trailing bytes are not a chunk")


def _lists(buf: bytes, start: int, end: int, list_type: bytes):
    """Yield (payload_start, payload_end) of every LIST chunk of the
    given type (payload excludes the 4-byte type tag)."""
    for fourcc, s, e in _chunks(buf, start, end):
        if fourcc == b"LIST" and buf[s : s + 4] == list_type:
            yield s + 4, e


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    quality: int = 95,
    fps: int = 10,
    restart_interval: int = 0,
) -> bytes:
    """Write frames as a single-video-stream AVI with 'MJPG' samples
    ('00dc' chunks, word-aligned) plus the standard idx1 index."""
    from secure_agent_api_vector_search_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("a video needs at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    samples = [
        encode_jpeg(f, quality=quality, restart_interval=restart_interval)
        for f in frames
    ]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # microseconds per frame
            0, 0, 0x10,        # max bytes/sec, padding, flags (HASINDEX)
            len(samples), 0, 1, 0,  # total frames, initial, streams, bufsize
            w, h, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(samples), 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h),
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = chunk(
        b"strf",
        struct.pack("<IiiHH", 40, w, h, 1, 24) + b"MJPG"
        + struct.pack("<IiiII", w * h * 3, 0, 0, 0, 0),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi_body = b"".join(chunk(b"00dc", s) for s in samples)
    movi = lst(b"movi", movi_body)
    # idx1: offsets are relative to the start of the movi LIST type tag
    idx_entries = []
    off = 4
    for s in samples:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(s)))
        off += 8 + len(s) + (len(s) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _video_fourcc(payload: bytes, start: int, end: int) -> bytes:
    """The first video stream's codec fourcc from LIST/hdrl (strh)."""
    for h_s, h_e in _lists(payload, start, end, b"hdrl"):
        for s_s, s_e in _lists(payload, h_s, h_e, b"strl"):
            for fourcc, c_s, c_e in _chunks(payload, s_s, s_e):
                if fourcc == b"strh" and payload[c_s : c_s + 4] == b"vids":
                    return payload[c_s + 4 : c_s + 8]
    raise ValueError("corrupt AVI: no video stream header (strh/vids)")


def decode_avi(payload: bytes) -> list[np.ndarray]:
    """Decode an AVI's video frames. MJPEG fourccs decode for real
    (operators/jpeg.py per '##dc' chunk); compressed codecs raise
    NotImplementedError by name."""
    from secure_agent_api_vector_search_spark.operators.jpeg import (
        decode_jpeg_batch,
    )

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (no RIFF/AVI magic)")
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fourcc = _video_fourcc(payload, 12, end)
    if fourcc in _KNOWN_COMPRESSED:
        raise NotImplementedError(
            f"AVI video codec {fourcc.decode('latin1')!r} decode not "
            "implemented (documented seam: only Motion-JPEG decodes)"
        )
    if fourcc not in _MJPEG_FOURCC:
        raise ValueError(f"corrupt AVI: unknown video fourcc {fourcc!r}")
    samples = []
    for m_s, m_e in _lists(payload, 12, end, b"movi"):
        for cc, c_s, c_e in _chunks(payload, m_s, m_e):
            if cc[2:4] in (b"dc", b"db"):
                samples.append(payload[c_s:c_e])
    if not samples:
        raise ValueError("corrupt AVI: no video frame chunks in movi")
    # one vectorized entropy pass across all frames' restart segments
    # (jpeg._lane_engine; serial fallback below the lane threshold)
    return decode_jpeg_batch(samples)


def avi_track_summary(payload: bytes) -> dict:
    """Container-level metadata without decoding samples — the cheap
    first pass, mirroring mp4_track_summary."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (no RIFF/AVI magic)")
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fourcc = _video_fourcc(payload, 12, end)
    n = 0
    total = 0
    for m_s, m_e in _lists(payload, 12, end, b"movi"):
        for cc, c_s, c_e in _chunks(payload, m_s, m_e):
            if cc[2:4] in (b"dc", b"db"):
                n += 1
                total += c_e - c_s
    return {
        "video_fourcc": fourcc.decode("latin1"),
        "n_frames": n,
        "frame_bytes": total,
        "decodable": fourcc in _MJPEG_FOURCC,
    }
