"""VP8L lossless WebP codec (operators/webp.py): every decoder path is
round-trip tested against the genuine two-pass encoder — plain
literals, simple vs normal prefix codes, LZ77 runs, color cache, meta
prefix groups, all four transforms (with every sub-byte bundling
width and all 14 predictor modes), plus descriptive rejection seams."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import webp as W
from secure_agent_api_vector_search_spark.operators.multimodal import decode_image


def _rand(h, w, c=3, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def test_webp_plain_roundtrip_rgb_and_alpha():
    img = _rand(13, 17)
    assert np.array_equal(W.decode_webp(W.encode_webp_lossless(img)), img)
    rgba = _rand(9, 7, 4, seed=5)
    out = W.decode_webp(W.encode_webp_lossless(rgba))
    assert out.shape == (9, 7, 4)
    assert np.array_equal(out, rgba)


def test_webp_grayscale_expands():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    assert np.array_equal(
        W.decode_webp(W.encode_webp_lossless(g)), np.repeat(g, 3, axis=2)
    )


def test_webp_subtract_green_transform():
    img = _rand(21, 19, seed=7)
    assert np.array_equal(
        W.decode_webp(W.encode_webp_lossless(img, subtract_green=True)), img
    )


def test_webp_lz77_runs():
    runs = np.repeat(_rand(8, 5, seed=11), 4, axis=1)
    p = W.encode_webp_lossless(runs, lz_runs=True)
    assert np.array_equal(W.decode_webp(p), runs)
    # the stream must actually be smaller than the literal form
    assert len(p) < len(W.encode_webp_lossless(runs))


def test_webp_color_cache():
    few = (_rand(16, 16, seed=13) % 4) * 60
    p = W.encode_webp_lossless(few, cache_bits=4)
    assert np.array_equal(W.decode_webp(p), few)
    # cache + LZ77 interact (the decoder inserts copied pixels too)
    tall = np.repeat(few, 3, axis=0)
    p2 = W.encode_webp_lossless(tall, cache_bits=4, lz_runs=True)
    assert np.array_equal(W.decode_webp(p2), tall)


@pytest.mark.parametrize("n,label", [(2, "1bit"), (4, "2bit"), (13, "4bit"), (40, "none")])
def test_webp_palette_bundling_widths(n, label):
    rng = np.random.default_rng(n)
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(n) * (250 // max(n - 1, 1))  # force distinct
    img = pal[rng.integers(0, n, (11, 27))]
    p = W.encode_webp_lossless(img, use_palette=True)
    assert np.array_equal(W.decode_webp(p), img)


@pytest.mark.parametrize("mode", list(range(14)))
def test_webp_all_predictor_modes(mode):
    img = _rand(37, 33, seed=mode + 1)
    p = W.encode_webp_lossless(img, predictor_mode=mode)
    assert np.array_equal(W.decode_webp(p), img)


@pytest.mark.parametrize("cte", [(0, 0, 0), (16, -16, 8), (-128, 127, 33)])
def test_webp_color_transform(cte):
    img = _rand(19, 23, seed=sum(abs(c) for c in cte) + 1)
    p = W.encode_webp_lossless(img, color_cte=cte)
    assert np.array_equal(W.decode_webp(p), img)


def test_webp_meta_prefix_groups():
    rng = np.random.default_rng(23)
    img = np.zeros((20, 64, 3), dtype=np.uint8)
    img[:, :32] = rng.integers(0, 64, (20, 32, 3))
    img[:, 32:] = rng.integers(192, 256, (20, 32, 3))
    p = W.encode_webp_lossless(img, meta_split=True)
    assert np.array_equal(W.decode_webp(p), img)


def test_webp_decode_image_dispatch():
    img = _rand(12, 12, seed=29)
    assert np.array_equal(decode_image(W.encode_webp_lossless(img)), img)


def test_webp_lossy_rejected_by_name():
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="VP8"):
        W.decode_webp(lossy)


def test_webp_corruption_is_descriptive():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        W.decode_webp(b"RIFF\x04\x00\x00\x00WAVE")
    p = W.encode_webp_lossless(_rand(9, 9, seed=31))
    with pytest.raises(ValueError, match="corrupt|exhausted"):
        W.decode_webp(p[: len(p) - 6])
    bad = bytearray(p)
    i = bad.index(b"VP8L") + 8
    bad[i] = 0x00  # break the VP8L signature byte
    with pytest.raises(ValueError, match="signature"):
        W.decode_webp(bytes(bad))


def test_webp_too_many_palette_colors_rejected():
    img = _rand(64, 64, seed=37)  # ~4k distinct colors
    with pytest.raises(ValueError, match="<=256 colors"):
        W.encode_webp_lossless(img, use_palette=True)


def test_webp_real_file_lossy_rejected_cleanly():
    """The real python.webp this container's stdlib test data ships is
    a VP8X-wrapped LOSSY file (ALPH + VP8 chunks): the decoder must
    walk the extended container and reject the codec BY NAME — never
    crash on or mis-decode a real file."""
    import glob

    files = glob.glob(
        "/root/.pyenv/versions/*/lib/python3*/test/imghdrdata/python.webp"
    )
    if not files:
        pytest.skip("stdlib webp sample not present")
    payload = open(files[0], "rb").read()
    with pytest.raises(NotImplementedError, match="VP8"):
        W.decode_webp(payload)


def test_webp_animation_roundtrip_and_video_dispatch():
    """Animated WebP (VP8X + ANIM/ANMF with real VP8L frames): frames
    round trip exactly and decode_video dispatches on the RIFF/WEBP
    magic alongside RAWV/MJPEG/MP4/AVI."""
    from secure_agent_api_vector_search_spark.operators.multimodal import (
        decode_video,
    )

    rng = np.random.default_rng(43)
    frames = [rng.integers(0, 256, (10, 14, 3), dtype=np.uint8) for _ in range(5)]
    payload = W.encode_webp_animation(frames)
    out = W.decode_webp_frames(payload)
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    out2 = decode_video(payload)
    assert len(out2) == 5 and np.array_equal(out2[3], frames[3])
    # a single-image WebP is a one-frame video through the same entry
    assert len(W.decode_webp_frames(W.encode_webp_lossless(frames[0]))) == 1


def test_webp_animation_corruption_and_guards():
    rng = np.random.default_rng(47)
    frames = [rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)]
    payload = bytearray(W.encode_webp_animation(frames))
    # declare an oversized canvas: the allocation guard must fire
    i = payload.index(b"VP8X") + 8 + 4
    payload[i : i + 3] = (0xFFFFFF).to_bytes(3, "little")
    with pytest.raises(ValueError, match="allocation guard"):
        W.decode_webp_frames(bytes(payload))
    with pytest.raises(ValueError, match="at least one frame"):
        W.encode_webp_animation([])


def _anim_container(canvas_wh, frames):
    """Hand-build a VP8X+ANIM+ANMF container from (x, y, img, flags)
    tuples — the repo encoder always writes full-canvas flags=0x00, so
    disposal/blend tests need explicit header bytes."""
    w, h = canvas_wh

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    chunks = bytearray()
    vp8x = bytes([0x02, 0, 0, 0])
    vp8x += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    chunks += chunk(b"VP8X", vp8x)
    chunks += chunk(b"ANIM", struct.pack("<IH", 0, 0))
    for fx, fy, img, flags in frames:
        vp8l = W.encode_webp_lossless(img)[12:]
        anmf = (
            (fx // 2).to_bytes(3, "little") + (fy // 2).to_bytes(3, "little")
            + (img.shape[1] - 1).to_bytes(3, "little")
            + (img.shape[0] - 1).to_bytes(3, "little")
            + (100).to_bytes(3, "little") + bytes([flags])
        )
        chunks += chunk(b"ANMF", anmf + vp8l)
    riff = b"WEBP" + bytes(chunks)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_webp_anmf_dispose_flag_is_bit0():
    """Container spec: ANMF flags byte is Reserved(6)|B(1)|D(1) — D
    (dispose to transparent black AFTER the frame) is bit 0x01, not
    0x02. A full-canvas red frame with D=1 followed by a partial blue
    patch must leave the uncovered region transparent."""
    red = np.zeros((8, 8, 3), np.uint8)
    red[:, :, 0] = 255
    blue = np.zeros((4, 4, 4), np.uint8)
    blue[:, :, 2] = 255
    blue[:, :, 3] = 255
    out = W.decode_webp_frames(
        _anim_container((8, 8), [(0, 0, red, 0x01), (0, 0, blue, 0x02)])
    )
    assert len(out) == 2
    assert np.array_equal(out[0][:, :, :3][0, 0], [255, 0, 0])
    # frame 2: disposed canvas, blue patch at (0,0), rest transparent
    assert out[1].shape[2] == 4
    assert tuple(out[1][0, 0]) == (0, 0, 255, 255)
    assert tuple(out[1][6, 6]) == (0, 0, 0, 0)


def test_webp_anmf_blend_flag_is_bit1():
    """B (bit 0x02) SET means overwrite; CLEAR (the default) means
    alpha-composite. A half-transparent white patch over a black
    canvas must mix to gray when B=0 and overwrite when B=2."""
    black = np.zeros((4, 4, 4), np.uint8)
    black[:, :, 3] = 255
    half = np.full((4, 4, 4), 255, np.uint8)
    half[:, :, 3] = 128
    blended = W.decode_webp_frames(
        _anim_container((4, 4), [(0, 0, black, 0x00), (0, 0, half, 0x00)])
    )[1]
    # over: (255*128/255 + 0*(1-128/255)) / 1.0 = 128; all-opaque
    # frames collapse to RGB
    assert tuple(blended[0, 0]) == (128, 128, 128)
    overwritten = W.decode_webp_frames(
        _anim_container((4, 4), [(0, 0, black, 0x00), (0, 0, half, 0x02)])
    )[1]
    assert tuple(overwritten[0, 0]) == (255, 255, 255, 128)


def test_webp_frames_lossy_still_rejects_by_name():
    """A VP8X container holding only a lossy VP8 still must raise the
    same by-name NotImplementedError from decode_webp_frames that
    decode_webp emits — not the generic no-frames ValueError."""
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    vp8x = bytes([0x00, 0, 0, 0]) + (7).to_bytes(3, "little") + (7).to_bytes(3, "little")
    chunks = chunk(b"VP8X", vp8x) + chunk(b"VP8 ", b"\x00" * 20)
    riff = b"WEBP" + chunks
    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError, match="VP8"):
        W.decode_webp_frames(payload)


# ---------------------------------------------------------------------------
# batch lane engine (decode_webp_batch)
# ---------------------------------------------------------------------------


def _photo(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy // 3 + xx // 3) % 256
    return np.clip(
        base[:, :, None] + rng.normal(0, 25, (h, w, 3)), 0, 255
    ).astype(np.uint8)


def test_webp_batch_engine_matches_serial_mixed_sizes(monkeypatch):
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    # >= _BATCH_MIN_LANES qualifying lanes with DIFFERENT sizes and
    # per-image codes, so epochs shrink the active set mid-run
    sizes = [(24, 31), (17, 23), (40, 12), (24, 31), (9, 57), (33, 33)]
    pays = [
        W.encode_webp_lossless(_photo(h, w, seed=s), subtract_green=(s % 2 == 0))
        for s, (h, w) in enumerate(sizes * 4)
    ]
    serial = [W.decode_webp(p) for p in pays]
    got = W.decode_webp_batch(pays)
    assert len(got) == len(serial)
    for a, b in zip(serial, got):
        assert np.array_equal(a, b)


def test_webp_batch_fallback_shapes_match_serial(monkeypatch):
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    # every non-qualifying encoder shape (LZ77 runs, color cache,
    # palette, predictor, color transform, meta split, alpha channel)
    # mixed with enough qualifying lanes to engage the engine
    img = _photo(20, 22, seed=1)
    few = (img // 64 * 64)
    pays = [
        W.encode_webp_lossless(img, lz_runs=True),
        W.encode_webp_lossless(img, cache_bits=4),
        W.encode_webp_lossless(few, use_palette=True),
        W.encode_webp_lossless(img, predictor_mode=11),
        W.encode_webp_lossless(img, color_cte=(17, -9, 4)),
        W.encode_webp_lossless(img, meta_split=True),
        W.encode_webp_lossless(_rand(8, 9, 4, seed=2)),  # real alpha
        W.encode_webp_lossless(np.full((7, 5, 3), 99, np.uint8)),  # solid
    ] + [W.encode_webp_lossless(_photo(15, 15, seed=s)) for s in range(20)]
    serial = [W.decode_webp(p) for p in pays]
    got = W.decode_webp_batch(pays)
    for a, b in zip(serial, got):
        assert np.array_equal(a, b)


def test_webp_batch_small_batch_uses_scalar_and_matches():
    pays = [W.encode_webp_lossless(_photo(10, 11, seed=s)) for s in range(3)]
    got = W.decode_webp_batch(pays)
    for p, g in zip(pays, got):
        assert np.array_equal(W.decode_webp(p), g)
    assert W.decode_webp_batch([]) == []


def test_webp_batch_error_is_first_serial_error(monkeypatch):
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    good = [W.encode_webp_lossless(_photo(12, 12, seed=s)) for s in range(20)]
    bad_magic = b"nope" + good[0][4:]
    truncated = good[1][:20]
    # serial order: index 3 (bad magic) fails before index 7 (truncated)
    batch = good[:3] + [bad_magic] + good[3:6] + [truncated] + good[6:]
    with pytest.raises(ValueError, match="no RIFF/WEBP magic"):
        W.decode_webp_batch(batch)
    # lossy VP8 at the smallest failing index -> NotImplementedError
    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp_batch(good[:2] + [lossy] + [bad_magic] + good[2:])


def test_webp_batch_corrupt_bitstream_parity(monkeypatch):
    """A payload whose entropy stream is truncated mid-pixels must
    raise the same error batched as serial."""
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    pays = [W.encode_webp_lossless(_photo(16, 16, seed=s)) for s in range(20)]
    whole = W.encode_webp_lossless(_photo(64, 64, seed=99))
    cut = whole[:len(whole) - 40]
    # fix the RIFF/chunk sizes so only the BITSTREAM is short
    body = cut[12:]
    chunk_size = len(body) - 8
    fixed = (
        b"RIFF" + struct.pack("<I", len(body) + 4) + b"WEBP"
        + body[:4] + struct.pack("<I", chunk_size) + body[8:]
    )
    try:
        W.decode_webp(fixed)
        serial_exc = None
    except ValueError as exc:
        serial_exc = str(exc)
    assert serial_exc is not None
    with pytest.raises(ValueError, match="exhausted"):
        W.decode_webp_batch(pays + [fixed])


def test_webp_batch_via_decode_image_batch_order_preserved(monkeypatch):
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    from secure_agent_api_vector_search_spark.operators.multimodal import (
        decode_image_batch, encode_png,
    )

    webps = [W.encode_webp_lossless(_photo(14, 13, seed=s)) for s in range(18)]
    png_img = _rand(6, 7, seed=11)
    payloads = webps[:9] + [encode_png(png_img)] + webps[9:]
    out = decode_image_batch(payloads)
    for i, p in enumerate(webps[:9]):
        assert np.array_equal(out[i], W.decode_webp(p))
    assert np.array_equal(out[9], png_img)
    for i, p in enumerate(webps[9:]):
        assert np.array_equal(out[10 + i], W.decode_webp(p))


def test_webp_animation_frames_route_through_batch_engine(monkeypatch):
    """Each ANMF frame is an independent VP8L stream — a many-frame
    animation is a ready-made lane batch even when the file arrives
    alone. Composited output must equal the serial walk's."""
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:32, 0:32]
    base = (yy // 3 + xx // 3) % 256
    frames = [
        np.clip(base[:, :, None] + rng.normal(0, 25, (32, 32, 3)), 0, 255)
        .astype(np.uint8)
        for _ in range(24)
    ]
    anim = W.encode_webp_animation(frames)
    out = W.decode_webp_frames(anim)
    assert len(out) == 24
    for o, f in zip(out, frames):
        assert np.array_equal(o[:, :, :3] if o.shape[2] == 4 else o, f)


def test_webp_animation_error_order_is_serial(monkeypatch):
    """A corrupt frame mid-animation raises at that frame, not after
    later frames decode (the serial walk's first-error contract)."""
    # force the lane engine on small fixtures (the shipped gate is 48)
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 4)
    frames = [
        np.full((8, 8, 3), 40 * i % 256, np.uint8) for i in range(20)
    ]
    anim = bytearray(W.encode_webp_animation(frames))
    # find the THIRD ANMF chunk and corrupt its VP8L signature byte
    seen = 0
    pos = 12
    while pos + 8 <= len(anim):
        fourcc = bytes(anim[pos:pos + 4])
        size = struct.unpack("<I", bytes(anim[pos + 4:pos + 8]))[0]
        if fourcc == b"ANMF":
            seen += 1
            if seen == 3:
                anim[pos + 8 + 16 + 8] ^= 0xFF  # VP8L payload byte 0
                break
        pos += 8 + size + (size & 1)
    assert seen == 3
    with pytest.raises(ValueError, match="corrupt VP8L"):
        W.decode_webp_frames(bytes(anim))


def test_webp_batch_mutation_parity_with_serial(monkeypatch):
    """Mutation fuzz: for ANY corruption of a payload, the batch engine
    must agree with the serial decoder — same pixels on success, same
    exception TYPE AND MESSAGE on failure (the serial-order error
    contract, checked mechanically rather than on hand-picked cases)."""
    monkeypatch.setattr(W, "_BATCH_MIN_LANES", 2)

    def photo(s):
        yy, xx = np.mgrid[0:24, 0:24]
        base = (yy // 3 + xx // 3) % 256
        return np.clip(
            base[:, :, None]
            + np.random.default_rng(s).normal(0, 25, (24, 24, 3)),
            0, 255,
        ).astype(np.uint8)

    good = [W.encode_webp_lossless(photo(s)) for s in range(4)]
    base_payload = W.encode_webp_lossless(photo(99), subtract_green=True)
    for seed in range(60):
        rng = np.random.default_rng(seed)
        m = bytearray(base_payload)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(m)))
            m[pos] ^= int(rng.integers(1, 256))
        if rng.random() < 0.3:
            m = m[:int(rng.integers(20, len(m)))]
        mutant = bytes(m)
        try:
            s_res, s_exc = W.decode_webp(mutant), None
        except (ValueError, NotImplementedError) as e:
            s_res, s_exc = None, (type(e), str(e))
        try:
            b_out, b_exc = W.decode_webp_batch(good + [mutant]), None
        except (ValueError, NotImplementedError) as e:
            b_out, b_exc = None, (type(e), str(e))
        if s_exc is None:
            assert b_exc is None and np.array_equal(b_out[-1], s_res), seed
        else:
            assert b_exc == s_exc, (seed, s_exc, b_exc)
