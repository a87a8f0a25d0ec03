"""media_metadata (VERDICT r10 gap 1): structural metadata for
boundary codecs — lossy-VP8 frame tag (RFC 6386 §9.1), H.264 SPS
(Exp-Golomb, §7.3.2.1.1), and a dispatch that NEVER raises the decode
seam's NotImplementedError."""

from __future__ import annotations

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import media_meta as MM
from secure_agent_api_vector_search_spark.operators import multimodal as M


def _lossy_webp(w: int, h: int) -> bytes:
    tag = 1 << 4  # key frame, show_frame, version 0
    body = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + b"\xaa" * 12)
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    chunk += b"\x00" * (len(body) & 1)
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def test_vp8_frame_tag_key_and_interframe():
    t = MM.vp8_frame_tag(
        (1 << 4).to_bytes(3, "little") + b"\x9d\x01\x2a"
        + (0x4000 | 640).to_bytes(2, "little")  # scale 1, width 640
        + (480).to_bytes(2, "little"))
    assert t["key_frame"] and t["width"] == 640 and t["height"] == 480
    assert t["h_scale"] == 1 and t["v_scale"] == 0
    # inter frame: bit0 set, no dimensions
    t2 = MM.vp8_frame_tag(b"\x31\x02\x00" + b"\x00" * 8)
    assert not t2["key_frame"] and t2["width"] is None
    with pytest.raises(ValueError, match="start code"):
        MM.vp8_frame_tag((1 << 4).to_bytes(3, "little") + b"\x00\x01\x2a"
                         + b"\x00" * 4)


@pytest.mark.parametrize("wm,hm,crop", [(1, 1, 0), (40, 30, 3), (8, 5, 1),
                                        (120, 68, 2)])
def test_h264_sps_roundtrips_fixture_writer(wm, hm, crop):
    info = MM.h264_sps(M.sps_fixture_bytes(wm, hm, crop))
    assert info["width"] == 16 * wm - 2 * crop
    assert info["height"] == 16 * hm
    assert info["profile_idc"] == 66 and info["frame_mbs_only"]


def test_h264_emulation_prevention_strip():
    # 00 00 03 0x drops the 03; 00 00 03 FF does not
    assert MM._strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert MM._strip_emulation(b"\x00\x00\x03\xff") == b"\x00\x00\x03\xff"
    assert MM._strip_emulation(b"\x00\x00\x03") == b"\x00\x00"


def test_media_metadata_never_raises_notimplemented_on_boundary_codecs():
    """The whole point: lossy formats yield structure rows where the
    decode operators raise by name."""
    from secure_agent_api_vector_search_spark.operators.webp import decode_webp

    lossy = _lossy_webp(912, 514)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    r = MM.media_metadata(lossy)
    assert r == {"format": "webp", "codec": "vp8", "width": 912,
                 "height": 514, "n_frames": 1, "decodable": False,
                 "profile": None}


def test_media_metadata_avc1_reads_sps_through_avcc():
    from secure_agent_api_vector_search_spark.operators.mp4 import (
        decode_mp4,
        encode_mp4_codec_stub,
    )

    sps = M.sps_fixture_bytes(10, 8, 2)
    avcc_body = (b"\x01\x42\x00\x1e\xff\xe1"
                 + len(sps).to_bytes(2, "big") + sps + b"\x00")
    avcc = (8 + len(avcc_body)).to_bytes(4, "big") + b"avcC" + avcc_body
    payload = encode_mp4_codec_stub(b"avc1", 156, 128, [b"x" * 20] * 4,
                                    config_box=avcc)
    with pytest.raises(NotImplementedError):
        decode_mp4(payload)
    r = MM.media_metadata(payload)
    assert (r["codec"], r["width"], r["height"], r["n_frames"],
            r["decodable"], r["profile"]) == ("avc1", 156, 128, 4,
                                              False, "66.30")


def test_media_metadata_decodable_formats():
    from secure_agent_api_vector_search_spark.operators.mp4 import (
        encode_mp4_mjpeg,
    )
    from secure_agent_api_vector_search_spark.operators.webp import (
        encode_webp_lossless,
    )

    img = np.tile(np.arange(24, dtype=np.uint8).reshape(2, 4, 3), (4, 2, 1))
    r = MM.media_metadata(encode_webp_lossless(img))
    assert (r["codec"], r["width"], r["height"], r["decodable"]) == (
        "vp8l", 8, 8, True)
    r = MM.media_metadata(encode_mp4_mjpeg([img[:, :, :1]] * 3))
    assert (r["codec"], r["n_frames"], r["decodable"]) == ("jpeg", 3, True)
    r = MM.media_metadata(M.encode_png(img))
    assert (r["format"], r["width"], r["decodable"]) == ("png", 8, True)


def test_media_metadata_mp3_and_unknown():
    from secure_agent_api_vector_search_spark.operators.mp3 import (
        encode_mp3_frames,
    )

    payload = encode_mp3_frames([(128, 0), (128, 0), (192, 1)])
    r = MM.media_metadata(payload)
    assert r["format"] == "mp3" and r["n_frames"] == 3 and not r["decodable"]
    with pytest.raises(ValueError, match="unrecognized"):
        MM.media_metadata(b"\x00\x01\x02\x03 garbage")


def test_media_metadata_other_boundary_fourccs_and_ico():
    """Any compressed MP4 video codec — not just avc1 — must yield a
    metadata row with dims from the VisualSampleEntry; ICO reports its
    largest entry's dims plus the directory count."""
    from secure_agent_api_vector_search_spark.operators.bmp import encode_ico
    from secure_agent_api_vector_search_spark.operators.mp4 import (
        decode_mp4,
        encode_mp4_codec_stub,
    )

    for cc in (b"hvc1", b"vp09", b"av01"):
        payload = encode_mp4_codec_stub(cc, 320, 240, [b"z" * 16] * 2)
        r = MM.media_metadata(payload)
        assert (r["codec"], r["width"], r["height"], r["n_frames"],
                r["decodable"]) == (cc.decode(), 320, 240, 2, False)
        with pytest.raises((NotImplementedError, ValueError)):
            decode_mp4(payload)
    img = np.tile(np.arange(12, dtype=np.uint8).reshape(1, 4, 3), (8, 2, 1))
    r = MM.media_metadata(encode_ico(img))
    assert (r["format"], r["width"], r["height"], r["decodable"]) == (
        "ico", 8, 8, True)


def _wav_bytes(data: bytes, ch: int, rate: int, bits: int) -> bytes:
    width = bits // 8
    return b"".join((
        b"RIFF", (36 + len(data)).to_bytes(4, "little"), b"WAVEfmt ",
        (16).to_bytes(4, "little"), (1).to_bytes(2, "little"),
        ch.to_bytes(2, "little"), rate.to_bytes(4, "little"),
        (rate * ch * width).to_bytes(4, "little"),
        (ch * width).to_bytes(2, "little"), bits.to_bytes(2, "little"),
        b"data", len(data).to_bytes(4, "little"), data,
    ))


def test_media_metadata_wav_uses_parsed_sample_width():
    """8/16/32-bit PCM all parse (_PCM_DTYPES = {1,2,4}); frame count
    and codec label must come from the parsed width, not a hardcoded
    16-bit assumption (ADVICE r11)."""
    for bits, codec in ((8, "pcm_u8"), (16, "pcm_s16le"), (32, "pcm_s32le")):
        width = bits // 8
        n, ch = 120, 2
        r = MM.media_metadata(_wav_bytes(b"\x40" * (n * ch * width), ch,
                                         8000, bits))
        assert (r["format"], r["codec"], r["n_frames"], r["decodable"]) == (
            "wav", codec, n, True)


def test_media_metadata_vp8x_decodable_from_frame_codecs():
    """A VP8X container's decodable flag must reflect the image chunks
    inside it — lossless animation decodes, lossy animation does not
    (ADVICE r11: the container fourcc alone said True for both)."""
    from secure_agent_api_vector_search_spark.operators.webp import (
        decode_webp_frames,
        encode_webp_animation,
    )

    frames = [np.full((8, 10, 3), 40 * (i + 1), dtype=np.uint8)
              for i in range(3)]
    anim = encode_webp_animation(frames)
    r = MM.media_metadata(anim)
    assert (r["codec"], r["width"], r["height"], r["n_frames"],
            r["decodable"]) == ("vp8l", 10, 8, 3, True)
    assert len(decode_webp_frames(anim)) == 3

    # hand-build an animated container whose frames are lossy VP8
    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    tag = 1 << 4
    vp8_body = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
                + (16).to_bytes(2, "little") + (8).to_bytes(2, "little")
                + b"\xaa" * 12)
    anmf = ((0).to_bytes(3, "little") + (0).to_bytes(3, "little")
            + (15).to_bytes(3, "little") + (7).to_bytes(3, "little")
            + (100).to_bytes(3, "little") + b"\x00")
    chunks = chunk(b"VP8X", bytes([0x02, 0, 0, 0])
                   + (15).to_bytes(3, "little") + (7).to_bytes(3, "little"))
    chunks += chunk(b"ANIM", (0).to_bytes(4, "little") + (0).to_bytes(2, "little"))
    chunks += chunk(b"ANMF", anmf + chunk(b"VP8 ", vp8_body))
    chunks += chunk(b"ANMF", anmf + chunk(b"VP8 ", vp8_body))
    riff = b"WEBP" + chunks
    lossy_anim = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    with pytest.raises(NotImplementedError):
        decode_webp_frames(lossy_anim)
    r = MM.media_metadata(lossy_anim)
    assert (r["codec"], r["width"], r["height"], r["n_frames"],
            r["decodable"]) == ("vp8", 16, 8, 2, False)


def test_media_metadata_truncated_headers_raise_valueerror():
    """Truncated payloads whose magic matches must raise ValueError
    (the package-wide corrupt-payload contract), never struct.error."""
    for payload in (b"\x89PNG\r\n\x1a\n\x00\x00",      # 10-byte PNG
                    b"BM",                                 # bare BMP magic
                    b"GIF89a\x10",                        # truncated GIF
                    b"RIFF\x08\x00\x00\x00WEBP"):        # WebP, no chunks
        with pytest.raises(ValueError):
            MM.media_metadata(payload)
