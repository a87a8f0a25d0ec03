"""MPEG-audio frame walk (operators/mp3.py): header table lookups,
frame-size arithmetic across versions/layers, tag skipping, resync,
VBR detection, and the descriptive PCM-decode seam."""

from __future__ import annotations

import pytest

from secure_agent_api_vector_search_spark.operators import mp3 as M3


def test_cbr_stream_summary():
    p = M3.encode_mp3_frames([(128, 0)] * 10)
    s = M3.mp3_summary(p)
    assert s["n_frames"] == 10
    assert s["sample_rate"] == 44100
    assert s["bitrate_kbps_mean"] == 128.0
    assert not s["vbr"]
    assert s["layer"] == 3 and s["version"] == "1"
    assert s["duration_sec"] == pytest.approx(10 * 1152 / 44100, abs=0)


def test_vbr_and_padding_frames():
    p = M3.encode_mp3_frames([(128, 0), (192, 1), (64, 0)])
    s = M3.mp3_summary(p)
    assert s["n_frames"] == 3
    assert s["vbr"]
    assert s["bitrate_kbps_mean"] == pytest.approx((128 + 192 + 64) / 3)


def test_mpeg2_layer3_samples_per_frame():
    p = M3.encode_mp3_frames([(64, 0)] * 4, version="2", layer=3, mono=True)
    s = M3.mp3_summary(p)
    assert s["version"] == "2" and s["mono"]
    # MPEG-2 Layer III frames carry 576 samples at 22.05 kHz
    assert s["duration_sec"] == pytest.approx(4 * 576 / 22050, abs=0)


def test_layer1_slot_arithmetic():
    """Layer I sizes count 4-byte slots: (12*bitrate/rate + pad) * 4."""
    p = M3.encode_mp3_frames([(256, 1), (256, 0)], layer=1)
    s = M3.mp3_summary(p)
    assert s["layer"] == 1 and s["n_frames"] == 2
    assert s["duration_sec"] == pytest.approx(2 * 384 / 44100, abs=0)


def test_id3v2_skip_and_id3v1_trailer():
    body = M3.encode_mp3_frames([(128, 0)] * 3, id3v2_bytes=100)
    p = body + b"TAG" + b"\x00" * 125
    assert M3.mp3_summary(p)["n_frames"] == 3


def test_resync_past_leading_garbage():
    p = b"\x12\x34" * 50 + M3.encode_mp3_frames([(96, 0)] * 2)
    assert M3.mp3_summary(p)["n_frames"] == 2


def test_resync_limit_bounds_the_scan():
    p = b"\x00" * 8192 + M3.encode_mp3_frames([(96, 0)])
    with pytest.raises(ValueError, match="no frame sync"):
        M3.mp3_summary(p, resync_limit=1024)
    assert M3.mp3_summary(p, resync_limit=10000)["n_frames"] == 1


def test_truncated_final_frame_not_counted():
    p = M3.encode_mp3_frames([(128, 0)] * 3)
    assert M3.mp3_summary(p[:-10])["n_frames"] == 2


def test_xing_header_marks_vbr():
    p = bytearray(M3.encode_mp3_frames([(128, 0)] * 4))
    p[10:14] = b"Xing"  # inside the first frame's side-info region
    s = M3.mp3_summary(bytes(p))
    assert s["has_xing"] and s["vbr"]


def test_garbage_rejected_descriptively():
    with pytest.raises(ValueError, match="no frame sync"):
        M3.mp3_summary(b"\x00" * 5000)


def test_pcm_decode_is_a_named_seam():
    p = M3.encode_mp3_frames([(128, 0)] * 2)
    with pytest.raises(NotImplementedError, match="MP3 PCM decode"):
        M3.decode_mp3(p)


def test_invalid_bitrate_for_table_rejected():
    with pytest.raises(ValueError, match="invalid for"):
        M3.encode_mp3_frames([(129, 0)])
