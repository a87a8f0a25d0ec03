"""Real decoders in operators/multimodal.py: netpbm image parsing and
PCM WAV decoding round-trip exactly, and the feature stages compute
true values (hand-checked), not digest-derived fakes."""

from __future__ import annotations

import numpy as np
import pytest

from secure_agent_api_vector_search_spark.operators import multimodal as M


def test_netpbm_roundtrip_gray_and_rgb():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, size=(5, 7, 1), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    assert np.array_equal(M.decode_netpbm(M.encode_netpbm(gray)), gray)
    assert np.array_equal(M.decode_netpbm(M.encode_netpbm(rgb)), rgb)


def test_netpbm_header_comments_and_errors():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    payload = b"P5\n# a comment\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(M.decode_netpbm(payload), img)
    with pytest.raises(ValueError):
        M.decode_netpbm(b"JFIF....")


def test_thumbnail_shape_and_determinism():
    img = np.arange(32 * 48 * 3, dtype=np.uint8).reshape(32, 48, 3)
    t = M.thumbnail(img, 8)
    assert t.shape == (8, 8, 3)
    assert np.array_equal(t, M.thumbnail(img, 8))
    # nearest-neighbor picks exact source pixels
    assert t[0, 0, 0] == img[0, 0, 0]


def test_wav_roundtrip_and_values():
    rate = 8000
    samples = (1000 * np.sin(np.arange(4096) / 10.0)).astype(np.int16)[:, None]
    rate2, decoded = M.decode_wav(M.encode_wav(samples, rate))
    assert rate2 == rate and np.array_equal(decoded, samples)


def test_image_features_true_dimensions(spark, docs):
    payloads = M.synthetic_image_payloads(docs.limit(20))
    feats = {r["doc_id"]: r for r in M.image_features(payloads).collect()}
    raw = {r["doc_id"]: bytes(r["payload"]) for r in payloads.collect()}
    assert len(feats) == 20
    for doc_id, payload in raw.items():
        img = M.decode_netpbm(payload)
        f = feats[doc_id]
        assert (f["height"], f["width"], f["n_channels"]) == img.shape
        assert f["mean_luma"] == pytest.approx(float(img.mean()))
        import hashlib

        assert f["thumb_sha256"] == hashlib.sha256(
            M.thumbnail(img, 8).tobytes()
        ).hexdigest()


def test_audio_features_hand_values(spark):
    import pandas as pd

    rate = 8000
    tone = (2000 * np.sin(2 * np.pi * 440 * np.arange(2048) / rate)).astype(
        np.int16
    )
    silence = np.zeros(2048, dtype=np.int16)
    payload = M.encode_wav(np.concatenate([tone, silence])[:, None], rate)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [payload]})
    )
    f = M.audio_features(df, window=1024, activity_rms=100.0).head()
    assert f["sample_rate"] == rate and f["n_samples"] == 4096
    assert f["duration_sec"] == pytest.approx(4096 / rate)
    # exactly the two tone windows clear the activity threshold
    assert f["n_active_windows"] == 2
    expected_rms = float(np.sqrt(np.mean(np.concatenate([tone, silence]).astype(np.float64) ** 2)))
    assert f["rms"] == pytest.approx(expected_rms)


def test_audio_features_corpus(spark, docs):
    payloads = M.synthetic_wav_payloads(docs.limit(20))
    out = M.audio_features(payloads).collect()
    assert len(out) == 20
    assert all(r["rms"] > 0 and r["duration_sec"] > 0 for r in out)


def test_audio_features_vectorized_parity_mixed_batch(spark):
    """The whole-batch reduceat pass must agree with the per-row stdlib
    reference on a deliberately adversarial single batch: stereo, 8-bit,
    a window-exact segment followed by a frames-but-no-window segment
    (the reduceat boundary-leak case), and an empty-data payload."""
    import pandas as pd

    rate, window = 8000, 64
    rng = np.random.default_rng(7)

    def tone16(n, ch):
        return (2000 * rng.standard_normal((n, ch))).astype(np.int16)

    payloads = [
        M.encode_wav(tone16(3 * window, 1), rate),        # aligned, no tail
        M.encode_wav(tone16(window // 2, 1), rate),        # frames, no window
        M.encode_wav(tone16(5 * window + 7, 2), rate),     # stereo with tail
        M.encode_wav(tone16(0, 1), rate),                  # empty data chunk
    ]
    # an 8-bit PCM payload (uint8 samples — different dtype group)
    buf8 = np.asarray(rng.integers(0, 255, size=(2 * window + 3, 1)), dtype=np.uint8)
    import io as _io
    import wave as _wave

    b = _io.BytesIO()
    with _wave.open(b, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(rate)
        f.writeframes(buf8.tobytes())
    payloads.append(b.getvalue())

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(len(payloads))), "payload": payloads})
    ).coalesce(1)  # ONE batch: all segments share the concatenated pass
    got = {r["doc_id"]: r for r in M.audio_features(df, window=window).collect()}

    for i, payload in enumerate(payloads):
        r, x = M.decode_wav(payload)
        mono = x.astype(np.float64).mean(axis=1) if len(x) else np.empty(0)
        n = len(mono)
        rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
        nwin = n // window
        act = 0
        if nwin:
            fr = mono[: nwin * window].reshape(nwin, window)
            act = int((np.sqrt(np.mean(fr**2, axis=1)) >= 100.0).sum())
        g = got[i]
        assert g["sample_rate"] == r and g["n_samples"] == n
        assert g["n_channels"] == x.shape[1]
        assert g["rms"] == pytest.approx(rms, rel=1e-12)
        assert g["n_active_windows"] == act, f"doc {i}"


def test_wav_header_fast_path_rejects_non_pcm():
    """Truncated / non-RIFF payloads return None (slow path decides)."""
    assert M._parse_wav_header(b"nope") is None
    assert M._parse_wav_header(b"RIFF" + b"\x00" * 64) is None


def test_decode_plans_are_single_pass(spark, sf_dir):
    """Executed-plan pin for the two decode queries (the regression
    class behind the r5 image_decode bench scare — which calm-box
    profiling attributed to co-tenant noise: warm 0.8-1.2 s, matching
    SURVEY §6). Wall time is not assertable on a shared box; the plan
    shape is: column-pruned scan -> ONE rebalance exchange -> exactly
    two Python map stages (payload gen + feature extract). Any extra
    exchange (a reintroduced presentation sort re-executes the decode
    in the range-sampling pass = 2x decode) or a third Python stage
    breaks this pin before it costs bench seconds."""
    from secure_agent_api_vector_search_spark import catalog as C
    from secure_agent_api_vector_search_spark.sources.tables import load_documents

    n_docs = load_documents(spark, sf_dir).count()
    for fn in (C.image_decode_features, C.audio_decode_features):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 2, fn.__name__
        assert plan.count("Exchange") == 1, fn.__name__
        assert "rangepartitioning" not in plan.lower(), fn.__name__
        # the scan must prune to the two generator inputs, not read the
        # whole documents schema for a decode over payloads. When the
        # session fixtures have cached documents, Spark substitutes the
        # InMemoryRelation for the parquet scan — pruning then shows as
        # the cache read's output column list instead of ReadSchema.
        assert (
            "ReadSchema: struct<doc_id:bigint,text:string>" in plan
            or "InMemoryTableScan [doc_id" in plan
        ), fn.__name__
        # one feature row per document: the decode runs once per payload
        assert df.count() == n_docs, fn.__name__


def test_video_container_round_trip():
    import numpy as np

    from secure_agent_api_vector_search_spark.operators.multimodal import (
        decode_video,
        encode_video,
    )

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (5, 4, 1), dtype=np.uint8) for _ in range(3)]
    back = decode_video(encode_video(frames))
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert (a == b).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_video(b"nope")
    with _pytest.raises(ValueError):
        encode_video([])


def test_video_features_planted_scene_cut(spark, docs):
    from secure_agent_api_vector_search_spark.operators.multimodal import (
        synthetic_video_payloads,
        video_features,
    )

    sample = docs.limit(12)
    out = video_features(synthetic_video_payloads(sample, n_frames=8)).collect()
    assert len(out) == 12
    for r in out:
        assert r.n_frames == 8
        assert r.n_sampled == 4          # every 2nd frame
        # exactly ONE planted cut (the mid-video inversion); the +-4
        # luminance drift must stay below the threshold
        assert r.n_scene_cuts == 1, (r.doc_id, r.n_scene_cuts)
        assert 0.0 < r.mean_luma < 255.0
        assert len(r.sampled_sha256) == 64
    # determinism: same inputs, same digests
    again = video_features(synthetic_video_payloads(sample, n_frames=8)).collect()
    assert sorted((r.doc_id, r.sampled_sha256) for r in again) == sorted(
        (r.doc_id, r.sampled_sha256) for r in out
    )


def test_video_features_sampling_validation(spark, docs):
    import pytest as _pytest

    from secure_agent_api_vector_search_spark.operators.multimodal import (
        synthetic_video_payloads,
        video_features,
    )

    with _pytest.raises(ValueError):
        video_features(synthetic_video_payloads(docs.limit(1)), sample_every=0)


def test_image_neardup_matches_bruteforce(spark, docs):
    """Operator pairs == brute-force pairs from the same ahash64 on
    the driver (hamming <= 3), over originals + brightness-shifted
    re-encodes; the re-encode pairs must be found even though the
    payload BYTES differ (exact/sha dedup would miss them)."""
    from secure_agent_api_vector_search_spark.operators.multimodal import (
        ahash64,
        decode_netpbm,
        image_neardup_pairs,
        perturbed_image_copies,
        synthetic_image_payloads,
    )

    base = synthetic_image_payloads(docs.limit(15))
    noisy = perturbed_image_copies(base.filter("doc_id < 5"), 700000)
    allp = base.unionByName(noisy)
    rows = allp.collect()
    fps = {r.doc_id: ahash64(decode_netpbm(bytes(r.payload))) for r in rows}
    # payloads genuinely differ byte-wise between original and copy
    pay = {r.doc_id: bytes(r.payload) for r in rows}
    assert all(pay[i] != pay[i + 700000] for i in range(5))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(fps)
    expected = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(fps[a], fps[b]) <= 3
    }
    got = {(r.id_a, r.id_b) for r in image_neardup_pairs(allp).collect()}
    assert got == expected
    # the planted re-encodes are all recovered
    assert {(i, i + 700000) for i in range(5)} <= got


def test_decode_video_rejects_zero_frame_container():
    """encode_video refuses empty clips, so a zero-count RAWV payload
    is corruption: the decoder must fail with the module's ValueError
    contract, not let video_features hit an IndexError mid-task."""
    import pytest as _pytest

    from secure_agent_api_vector_search_spark.operators.multimodal import decode_video

    with _pytest.raises(ValueError, match="frame count"):
        decode_video(b"RAWV0\n")
    with _pytest.raises(ValueError, match="frame count"):
        decode_video(b"RAWV-3\n")


# ---------------------------------------------------------------------------
# PNG: the real compressed-format codec (stdlib zlib + numpy)
# ---------------------------------------------------------------------------


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter an image per the PNG spec (RFC 2083 §6) with a
    CHOSEN filter type per row and wrap it as a valid PNG — an
    independent implementation of the easy (encode) direction, so the
    decoder's filter reversal is tested against the spec rather than
    against this module's own filter-0 encoder."""
    import zlib

    h, w, c = img.shape
    bpp = c
    flat = img.astype(np.int32).reshape(h, w * c)
    raw = bytearray()
    for y, ftype in enumerate(filters):
        cur = flat[y]
        up = flat[y - 1] if y else np.zeros(w * c, dtype=np.int32)
        out = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(up[x])
            cc = int(up[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                out[x] = cur[x]
            elif ftype == 1:
                out[x] = (cur[x] - a) & 0xFF
            elif ftype == 2:
                out[x] = (cur[x] - b) & 0xFF
            elif ftype == 3:
                out[x] = (cur[x] - ((a + b) >> 1)) & 0xFF
            elif ftype == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                out[x] = (cur[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(out.astype(np.uint8).tobytes())
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, color_type, 0, 0, 0]
    )

    def chunk(ctype, data):
        import zlib as z

        return (
            len(data).to_bytes(4, "big") + ctype + data
            + z.crc32(ctype + data).to_bytes(4, "big")
        )

    return (
        M.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        got = M.decode_png(M.encode_png(img))
        assert got.shape == img.shape and (got == img).all()


def test_png_decode_reverses_every_filter_type():
    """Each of the five PNG scanline filters, forward-applied by an
    independent spec implementation, must decode back to the raster."""
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    got = M.decode_png(payload)
    assert (got == img).all()


def test_png_palette_expansion():
    import zlib

    idx = np.arange(12, dtype=np.uint8).reshape(3, 4, 1) % 4
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8
    )
    ihdr = (4).to_bytes(4, "big") + (3).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    raw = b"".join(b"\x00" + row.tobytes() for row in idx.reshape(3, 4))

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    payload = (
        M.PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"PLTE", pal.tobytes())
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    got = M.decode_png(payload)
    assert got.shape == (3, 4, 3)
    assert (got == pal[idx[:, :, 0]]).all()


def test_png_rejects_corruption_and_unsupported():
    img = np.full((4, 4, 1), 9, dtype=np.uint8)
    good = M.encode_png(img)
    bad = bytearray(good)
    bad[-10] ^= 0xFF  # flip a byte inside IEND/IDAT region
    with pytest.raises(ValueError, match="CRC|corrupt"):
        M.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"JFIF not a png")
    # JPEG/GIF/WebP/BMP/ICO/TIFF all have real decoders now — the stub
    # seam starts beyond them (e.g. JPEG 2000)
    with pytest.raises(NotImplementedError, match="magic"):
        M.decode_image(b"\x00\x00\x00\x0cjP  \r\n\x87\n")
    # known magics with garbage after them are CORRUPT input, not seams
    with pytest.raises(ValueError, match="corrupt GIF"):
        M.decode_image(b"GIF89a" + b"\x10\x00\x10\x00\x00\x00\x00" + b"pad")
    with pytest.raises(ValueError, match="corrupt BMP"):
        M.decode_image(b"BM not supported....")


def test_decode_image_sniffs_formats_and_mixed_corpus_dedups(spark):
    """PNG, netpbm, GIF, and lossless-WebP copies of the SAME raster
    must all land at Hamming 0 through the mixed-format scan — the
    format-sniffing dispatch makes the perceptual dedup
    codec-agnostic."""
    from secure_agent_api_vector_search_spark.operators.gif import encode_gif
    from secure_agent_api_vector_search_spark.operators.webp import (
        encode_webp_lossless,
    )

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 16, 1), dtype=np.uint8)
    assert (M.decode_image(M.encode_png(img)) == M.decode_image(
        M.encode_netpbm(img)
    )).all()
    # GIF/WebP expand grayscale to replicated RGB; the perceptual hash
    # is luma-based, so the fingerprint must be identical anyway
    rows = [
        (1, bytearray(M.encode_netpbm(img))),
        (2, bytearray(M.encode_png(img))),
        (3, bytearray(encode_gif(img))),
        (4, bytearray(encode_webp_lossless(img, subtract_green=True))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = M.image_neardup_pairs(df).collect()
    assert sorted((r.id_a, r.id_b, r.hamming) for r in pairs) == [
        (1, 2, 0), (1, 3, 0), (1, 4, 0), (2, 3, 0), (2, 4, 0), (3, 4, 0)
    ]


def test_png_feature_query_matches_direct_raster(spark, docs):
    """The gate entry's chain (fixture -> zlib PNG -> decode_png ->
    features) equals features computed on the directly-built raster."""
    import hashlib as _h

    out = {
        r.doc_id: r
        for r in M.image_features(
            M.synthetic_png_payloads(docs.limit(20))
        ).collect()
    }
    for doc_id, text in docs.limit(20).select("doc_id", "text").collect():
        d = _h.sha256((text or "").encode()).digest()
        h, w = 16 + d[2] % 32, 16 + d[3] % 32
        px = np.frombuffer(
            (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
        ).reshape(h, w, 3)
        r = out[doc_id]
        assert (r.width, r.height, r.n_channels) == (w, h, 3)
        assert r.mean_luma == float(px.mean())


def test_png_feature_plan_is_single_pass(spark, sf_dir):
    """The PNG decode query keeps the same map-only single-pass plan
    shape as the netpbm path: no exchange, exactly one decode stage."""
    from secure_agent_api_vector_search_spark.catalog import image_decode_png

    plan = image_decode_png(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    # one repartition for the narrow-scan rebalance is allowed; beyond
    # that the decode chain must not shuffle
    assert plan.count("Exchange") <= 1
    assert plan.count("MapInPandas") == 2  # payload gen + feature pass


# ---------------------------------------------------------------------------
# JPEG: the baseline lossy codec (pure numpy Huffman + DCT)
# ---------------------------------------------------------------------------


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    err = a.astype(np.float64) - b.astype(np.float64)
    mse = max(float((err**2).mean()), 1e-12)
    return 10.0 * np.log10(255.0**2 / mse)


def test_jpeg_block_flat_roundtrip_is_exact():
    """Flat 8×8 blocks have exactly-zero AC and a DC the default
    quantizer divides — the codec must round-trip them bit-exactly
    (the property the gated query's fixtures rest on)."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(3)
    blocks = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:, :, None]
    got = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert got.shape == img.shape and (got == img).all()


def test_jpeg_lossy_psnr_bounds():
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(4)
    noise = rng.integers(0, 256, size=(24, 40, 1), dtype=np.uint8)
    assert _psnr(J.decode_jpeg(J.encode_jpeg(noise, quality=95)), noise) > 35
    yy, xx = np.mgrid[0:32, 0:48]
    grad = np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=-1
    ).astype(np.uint8)
    got = J.decode_jpeg(J.encode_jpeg(grad, quality=95))
    assert got.shape == grad.shape and _psnr(got, grad) > 40
    # odd (non-block-multiple) dimensions crop back exactly
    odd = rng.integers(0, 256, size=(13, 9, 1), dtype=np.uint8)
    assert J.decode_jpeg(J.encode_jpeg(odd, quality=90)).shape == odd.shape


def test_jpeg_decodes_real_libjpeg_baseline_files():
    """Interop: the decoder must read baseline JPEGs produced by a real
    encoder (Spark's MLlib sample images ship in this container —
    standard tables, 4:2:0 subsampling), and reject progressive ones
    with a descriptive error instead of garbage."""
    import os

    from secure_agent_api_vector_search_spark.operators import jpeg as J

    base = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"
    kitten = f"{base}/kittens/DP802813.jpg"
    if not os.path.exists(kitten):
        pytest.skip("Spark sample images not present")
    img = J.decode_jpeg(open(kitten, "rb").read())
    assert img.shape == (313, 199, 3)
    assert 100 < float(img.mean()) < 250  # bright photo, sane range
    # self-consistency: re-encode our decode and decode again — the
    # two decodes must agree closely (pins dequant/IDCT/upsample sanity
    # without a reference decoder in the container)
    again = J.decode_jpeg(J.encode_jpeg(img, quality=95))
    assert _psnr(again, img) > 35


def test_jpeg_rejects_unsupported_processes():
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    with pytest.raises(ValueError, match="not a JPEG"):
        J.decode_jpeg(b"\x89PNG not jpeg")


def test_decode_image_dispatches_jpeg_and_mixed_dedup(spark):
    """A block-flat raster carried as JPEG, PNG, and netpbm payloads
    must land in ONE Hamming-0 near-dup component through the mixed
    scan — the dedup stage is codec-agnostic across all three real
    decoders (JPEG is lossless on flat blocks, so even the lossy codec
    joins exactly)."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(6)
    blocks = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:, :, None]
    assert (M.decode_image(J.encode_jpeg(img)) == img).all()
    rows = [
        (1, bytearray(M.encode_netpbm(img))),
        (2, bytearray(M.encode_png(img))),
        (3, bytearray(J.encode_jpeg(img, quality=95))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = sorted(
        (r.id_a, r.id_b, r.hamming) for r in M.image_neardup_pairs(df).collect()
    )
    assert pairs == [(1, 2, 0), (1, 3, 0), (2, 3, 0)]


def test_jpeg_progressive_decode_cross_validates_against_baseline():
    """Progressive (SOF2) decode runs a completely different scan
    machinery (DC/AC first + refinement bitplanes); the container ships
    the SAME scene as a progressive grayscale and a baseline color
    JPEG — the progressive decode must reproduce the baseline decode's
    luminance (corr ≈ 0.999 measured), validating the progressive path
    against the baseline one with no image library in the loop."""
    import os

    from secure_agent_api_vector_search_spark.operators import jpeg as J

    base = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel"
    if not os.path.exists(f"{base}/grayscale.jpg"):
        pytest.skip("Spark sample images not present")
    gray = J.decode_jpeg(open(f"{base}/grayscale.jpg", "rb").read())
    rgb = J.decode_jpeg(open(f"{base}/chr30.4.184.jpg", "rb").read())
    assert gray.shape == (215, 300, 1) and rgb.shape == (215, 300, 3)
    g = gray[:, :, 0].astype(float)
    luma = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(float)
    corr = np.corrcoef(g.ravel(), luma.ravel())[0, 1]
    assert corr > 0.99
    assert np.abs(g - luma).mean() < 8.0


def test_jpeg_progressive_white_stripes_decode_bright():
    """The nodejs doc images are white stripes with a small logo —
    progressive decodes must come out predominantly white (a content
    ground truth, not just 'no crash')."""
    import os

    from secure_agent_api_vector_search_spark.operators import jpeg as J

    p = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if not os.path.exists(p):
        pytest.skip("nodejs doc images not present")
    img = J.decode_jpeg(open(p, "rb").read())
    assert img.shape == (312, 493, 3)
    assert float(img.mean()) > 240  # predominantly white
    assert float((img > 250).mean()) > 0.8  # most pixels near-white


def test_jpeg_restart_intervals_roundtrip_and_identity():
    """DRI/RSTn support (T.81 E.2.4): a restart-marker stream must
    decode to EXACTLY the same pixels as the marker-free encoding of
    the same image (identical quantized coefficients, different
    entropy framing) — and flat blocks stay bit-exact through it."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(29, 43, 3), dtype=np.uint8)
    plain = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    for ri in (1, 2, 5, 1000):
        enc = J.encode_jpeg(img, quality=90, restart_interval=ri)
        if ri <= 20:  # enough MCUs for at least one boundary
            assert b"\xff\xdd" in enc and any(
                bytes([0xFF, 0xD0 + n]) in enc for n in range(8)
            )
        assert (J.decode_jpeg(enc) == plain).all()
    blocks = rng.integers(0, 256, size=(3, 5), dtype=np.uint8)
    flat = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:, :, None]
    got = J.decode_jpeg(J.encode_jpeg(flat, quality=95, restart_interval=2))
    assert (got == flat).all()


def test_jpeg_restart_marker_sequence_is_checked():
    """RSTn numbers must cycle 0..7 — a swapped marker is corruption
    (a decoder that ignores the sequence silently mis-frames resync
    after data loss)."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(16, 48, 1), dtype=np.uint8)
    enc = bytearray(J.encode_jpeg(img, quality=90, restart_interval=1))
    i = enc.find(bytes([0xFF, 0xD0]))
    assert i > 0
    enc[i + 1] = 0xD3  # out of sequence
    with pytest.raises(ValueError, match="out of sequence"):
        J.decode_jpeg(bytes(enc))


def test_jpeg_fill_bytes_before_markers_are_legal():
    """0xFF fill bytes may pad in front of any marker (T.81 B.1.1.2);
    the segment walk must skip them instead of misreading a length."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(16, 16, 1), dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=90)
    # insert fill bytes before the DQT marker (0xFFDB) and before EOI
    i = enc.find(b"\xff\xdb")
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert padded.rstrip().endswith(b"\xff\xd9")
    padded = padded[:-2] + b"\xff" + padded[-2:]
    assert (J.decode_jpeg(padded) == J.decode_jpeg(enc)).all()


def test_jpeg_bit_io_is_linear_time():
    """The bit reader/writer must mask their accumulators to the live
    bits — an unmasked int grows with the stream and turns the codec
    quadratic (a multi-MB photo would effectively hang an executor).
    A 256×256 noise image (~70KB entropy) decodes in well under a
    second when linear; the quadratic version took ~9s for 100KB."""
    import time

    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, size=(256, 256, 1), dtype=np.uint8)
    t0 = time.monotonic()
    enc = J.encode_jpeg(img, quality=95)
    dec = J.decode_jpeg(enc)
    elapsed = time.monotonic() - t0
    assert len(enc) > 50_000  # genuinely high-entropy stream
    assert (dec.shape == img.shape) and _psnr(dec, img) > 35
    assert elapsed < 10.0  # linear ≈ 0.3s; quadratic ≫ 40s


def test_png_palette_index_out_of_range_is_descriptive():
    """A palette pixel index past the PLTE entry count is corrupt
    input and must raise the module's descriptive ValueError, not a
    bare numpy IndexError."""
    import zlib

    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)  # needs 4 entries
    ihdr = (
        (2).to_bytes(4, "big") + (2).to_bytes(4, "big")
        + bytes([8, 3, 0, 0, 0])
    )
    plte = bytes([0, 0, 0, 255, 255, 255])  # only 2 entries
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    png = (
        M.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index out of range"):
        M.decode_png(png)
    # and a PLTE whose length is not a multiple of 3 is caught first
    png_bad = (
        M.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte + b"\x07")
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="multiple of 3"):
        M.decode_png(png_bad)


def test_mjpeg_roundtrip_and_sniffing():
    """Motion-JPEG container: block-flat frames round-trip bit-exactly
    (frames are genuine entropy-coded JPEGs with restart markers), the
    frame walk is exact via decoder-reported consumed bytes, and
    decode_video sniffs RAWV vs MJPEG by magic."""
    rng = np.random.default_rng(21)
    blocks = [rng.integers(120, 231, size=(2, 3), dtype=np.uint8) for _ in range(5)]
    frames = [
        np.repeat(np.repeat(b, 8, axis=0), 8, axis=1)[:, :, None] for b in blocks
    ]
    enc = M.encode_video_mjpeg(frames, quality=95, restart_interval=2)
    assert enc[:2] == b"\xff\xd8" and b"\xff\xdd" in enc  # SOI + DRI
    got = M.decode_video(enc)
    assert len(got) == 5 and all((a == b).all() for a, b in zip(got, frames))
    # RAWV payloads still route to the netpbm walk
    raw = M.decode_video(M.encode_video(frames))
    assert all((a == b).all() for a, b in zip(raw, frames))
    # lossy frames: shapes exact, content close
    noisy = [rng.integers(0, 256, (24, 40, 3), dtype=np.uint8) for _ in range(3)]
    dn = M.decode_video(M.encode_video_mjpeg(noisy, quality=95))
    assert [f.shape for f in dn] == [f.shape for f in noisy]
    with pytest.raises(ValueError, match="at least one frame"):
        M.encode_video_mjpeg([])
    with pytest.raises(ValueError, match="not a RAWV or MJPEG"):
        M.decode_video(b"XXXX....")


def test_mjpeg_video_features_planted_scene_cut(spark, docs):
    """The MJPEG fixture plants the same −100 mid-video cut as the RAWV
    fixture: every document must report exactly one scene cut, 8 frames,
    4 sampled, and block-multiple dimensions."""
    few = docs.filter("doc_id < 6")
    out = M.video_features(M.synthetic_mjpeg_payloads(few)).collect()
    assert len(out) == 6
    for r in out:
        assert r.n_frames == 8 and r.n_sampled == 4
        assert r.n_scene_cuts == 1
        assert r.width % 8 == 0 and r.height % 8 == 0
        assert 16 <= r.width <= 32 and 16 <= r.height <= 32


def test_jpeg_dc_predictor_overflow_raises_not_garbage():
    """A corrupt stream whose DHT declares category-15 DC diffs can
    walk the predictor past the packed 22-bit value field; the fast
    decoder must raise, never scatter coefficients to wrong positions
    (code-review r10). Hand-built: 72 blocks of +32767 DC diffs."""
    import struct

    from secure_agent_api_vector_search_spark.operators import jpeg as J

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 64, 72)
              + bytes([1, 1, 0x11, 0]))
    # DC table: symbols {0, 15} at length 2; AC table: {0} (EOB) at len 2
    dht_dc = bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([0, 15])
    dht_ac = bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([0])
    dht = seg(0xC4, dht_dc + dht_ac)
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = J._BitWriter()
    for _ in range(72):  # 9x8 blocks of 64x72 px
        wtr.write(0b01, 2)       # DC sym 15
        wtr.write(0x7FFF, 15)    # diff +32767
        wtr.write(0b00, 2)       # AC EOB
    payload = (b"\xff\xd8" + dqt + sof + dht + sos + wtr.flush()
               + b"\xff\xd9")
    with pytest.raises(ValueError, match="DC predictor out of range"):
        J.decode_jpeg(payload)


def test_jpeg_stray_rst_after_entropy_data_is_skipped():
    """An RSTn between the end of a DRI-free scan's entropy data and
    the next marker is stray, not corruption — the segment walk has
    always skipped it and the fast baseline path must too."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(16, 16, 1), dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=90)
    assert enc.endswith(b"\xff\xd9")
    padded = enc[:-2] + b"\xff\xd0" + enc[-2:]
    assert (J.decode_jpeg(padded) == J.decode_jpeg(enc)).all()


def test_chunked_window_path_decodes_identically(monkeypatch):
    """Forcing the >8MB chunked-window reader onto ordinary fixtures
    must produce BIT-IDENTICAL decodes for both codecs (the huge-
    payload memory path shares the hot loop, so this pins its
    Python-int semantics end-to-end, incl. small chunk refills)."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J
    from secure_agent_api_vector_search_spark.operators import webp as W

    rng = np.random.default_rng(34)
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    jp = J.encode_jpeg(img, quality=88)
    wp = W.encode_webp_lossless(img, subtract_green=True)
    want_j = J.decode_jpeg(jp)
    want_w = W.decode_webp(wp)
    monkeypatch.setattr(J, "_LIST_WINDOWS_MAX", 0)
    monkeypatch.setattr(J._ChunkedWindows, "_CH", 64)  # force refills
    assert (J.decode_jpeg(jp) == want_j).all()
    assert (W.decode_webp(wp) == want_w).all()


def test_jpeg_lane_engine_matches_scalar_decode(monkeypatch):
    """The vectorized multi-lane restart-segment engine must produce
    BIT-IDENTICAL coefficients to the serial LUT walk on the same
    stream (forced both ways via the _LANE_MIN_SEGS gate), for color
    and grayscale and across restart-interval granularities."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(41)
    for shape, ri in (((48, 40, 3), 1), ((48, 40, 3), 5), ((32, 24, 1), 2)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = J.encode_jpeg(img, quality=88, restart_interval=ri)
        monkeypatch.setattr(J, "_LANE_MIN_SEGS", 10**9)
        want = J.decode_jpeg(enc)
        monkeypatch.setattr(J, "_LANE_MIN_SEGS", 1)
        assert (J.decode_jpeg(enc) == want).all()


def test_jpeg_lane_engine_error_messages_match_scalar(monkeypatch):
    """Lane-engine corruption errors must surface the same messages
    the serial path raises (swapped RST order is checked before the
    engine; an out-of-range DC predictor inside a lane is checked by
    the engine itself)."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(24, 24, 1), dtype=np.uint8)
    enc = bytearray(J.encode_jpeg(img, quality=90, restart_interval=1))
    i = enc.find(b"\xff\xd0")
    j = enc.find(b"\xff\xd1")
    enc[i:i + 2], enc[j:j + 2] = b"\xff\xd1", b"\xff\xd0"
    monkeypatch.setattr(J, "_LANE_MIN_SEGS", 1)
    with pytest.raises(ValueError, match="out of sequence"):
        J.decode_jpeg(bytes(enc))


def test_jpeg_stray_rst_after_last_restart_segment(monkeypatch):
    """With DRI SET, a stray RSTn between the last restart segment's
    entropy data and EOI must be skipped like the DRI-free stray
    (ADVICE r10: it used to count as an extra segment and raise the
    restart-segment-count error) — on both decode paths."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, size=(24, 24, 1), dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=90, restart_interval=4)
    want = J.decode_jpeg(enc)
    assert enc.endswith(b"\xff\xd9")
    # 9 blocks at ri=4 -> 3 segments, RST0/RST1 consumed; the stray
    # continues the cycle as a real encoder's flush would (RST2)
    padded = enc[:-2] + b"\xff\xd2" + enc[-2:]
    for gate in (10**9, 1):
        monkeypatch.setattr(J, "_LANE_MIN_SEGS", gate)
        assert (J.decode_jpeg(padded) == want).all()
    # too FEW segments is still corruption
    cut = enc[: enc.find(b"\xff\xd1")] + b"\xff\xd9"
    with pytest.raises(ValueError, match="restart segments|exhausted"):
        J.decode_jpeg(cut)


def test_jpeg_batch_decode_matches_individual():
    """decode_jpeg_batch fuses entropy decode across payloads through
    the lane engine; results must match per-image decode_jpeg exactly,
    with progressive payloads falling back transparently and corrupt
    payloads raising like the serial path."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(44)
    imgs = [rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8)
            for _ in range(5)]
    pls = [J.encode_jpeg(im, quality=85 + i, restart_interval=(i % 3))
           for i, im in enumerate(imgs)]
    # a progressive payload exercises the _NotBatchable fallback
    prog = _progressive_gray_fixture()
    batch = pls + [prog]
    want = [J.decode_jpeg(p) for p in batch]
    got = J.decode_jpeg_batch(batch)
    assert len(got) == len(want)
    for w, g in zip(want, got):
        assert (w == g).all()
    with pytest.raises(ValueError):
        J.decode_jpeg_batch([pls[0], b"\xff\xd8\xff\xd9", pls[1]])


def _progressive_gray_fixture() -> bytes:
    """A real progressive (SOF2) stream when the container ships one,
    else a baseline payload (the batch test then simply exercises an
    all-baseline batch)."""
    import os

    from secure_agent_api_vector_search_spark.operators import jpeg as J

    real = ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
            "multi-channel/grayscale.jpg")
    if os.path.exists(real):
        return open(real, "rb").read()
    rng = np.random.default_rng(45)
    img = rng.integers(0, 256, size=(16, 16, 1), dtype=np.uint8)
    return J.encode_jpeg(img, quality=90)


def test_jpeg_lut_cache_is_bounded_lru():
    """The cross-file DHT-keyed LUT cache must stay bounded under a
    pathological stream of distinct table definitions (VERDICT r10
    item 10), and a HIT must refresh recency (LRU, not FIFO): the hot
    table survives a full cap's worth of strays."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    J._LUT_CACHE.clear()
    hot_bits = [0] * 16
    hot_bits[7] = 4  # 4 symbols at length 8 (legal, all-ones free)
    hot = (hot_bits, [0, 1, 2, 3])
    J._symbol_lut_cached(hot[0], hot[1], is_dc=True)
    hot_key = (tuple(hot[0]), tuple(hot[1]), True)
    for i in range(3 * J._LUT_CACHE_MAX):
        bits = [0] * 16
        bits[7] = 4
        J._symbol_lut_cached(bits, [i & 0xFF, (i + 1) & 0xFF,
                                    (i + 2) & 0xFF, (i + 3) & 0xFF],
                             is_dc=False)
        assert len(J._LUT_CACHE) <= J._LUT_CACHE_MAX
        # touch the hot entry every few strays: LRU keeps it resident
        if i % 8 == 0:
            J._symbol_lut_cached(hot[0], hot[1], is_dc=True)
    assert hot_key in J._LUT_CACHE
    J._LUT_CACHE.clear()


def test_decode_image_batch_preserves_order_across_formats():
    """decode_image_batch groups the JPEG payloads through the lane
    engine and decodes other formats per payload — results must land
    at their original positions regardless of grouping."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(46)
    imgs = [rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
            for _ in range(4)]
    payloads = [
        J.encode_jpeg(imgs[0], quality=92, restart_interval=2),
        M.encode_png(imgs[1]),
        J.encode_jpeg(imgs[2], quality=92),
        M.encode_netpbm(imgs[3]),
    ]
    want = [M.decode_image(p) for p in payloads]
    got = M.decode_image_batch(payloads)
    assert len(got) == 4
    for w, g in zip(want, got):
        assert (w == g).all()


def test_jpeg_batch_snapshot_tables_at_scan_time():
    """A legal DHT between a scan and EOI redefines table id 0. The
    serial path consumed the original tables at SOS time; a deferred
    batch job flushed after EOI must decode with the SAME tables, not
    the later redefinition (ADVICE r11: the job held the shared
    mutable table mapping)."""
    from secure_agent_api_vector_search_spark.operators import jpeg as J

    rng = np.random.default_rng(46)
    img = rng.integers(0, 256, size=(24, 24, 1), dtype=np.uint8)
    enc = J.encode_jpeg(img, quality=90)
    want = J.decode_jpeg(enc)
    # well-formed 1-symbol DC+AC tables for id 0 — valid syntax, wrong
    # codes: decoding with these must NOT happen
    bits = [1] + [0] * 15
    dht = bytes([0x00] + bits) + bytes([0]) + bytes([0x10] + bits) + bytes([0])
    seg = b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
    spliced = enc[:-2] + seg + enc[-2:]
    assert (J.decode_jpeg(spliced) == want).all()
    for gate in (10**9, 1):  # scalar flush AND lane-engine flush
        orig = J._LANE_MIN_SEGS
        try:
            J._LANE_MIN_SEGS = gate
            got = J.decode_jpeg_batch([spliced, enc])
        finally:
            J._LANE_MIN_SEGS = orig
        assert (got[0] == want).all() and (got[1] == want).all()


def test_decode_image_batch_dedups_identical_payloads():
    """Byte-identical payloads decode once and fan out as independent
    copies — mutating one result must not leak into its twins."""
    import numpy as np

    from secure_agent_api_vector_search_spark.operators import multimodal as M
    from secure_agent_api_vector_search_spark.operators.jpeg import encode_jpeg

    rng = np.random.default_rng(7)
    img_a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    pa = encode_jpeg(img_a, quality=90)
    pb = M.encode_png(img_b)
    out = M.decode_image_batch([pa, pb, pa, pa, pb])
    assert np.array_equal(out[0], out[2]) and np.array_equal(out[0], out[3])
    assert np.array_equal(out[1], out[4])
    assert np.array_equal(out[1], img_b)
    out[2][:] = 0  # independent copy: out[0]/out[3] unaffected
    assert not np.array_equal(out[0], out[2])
    assert np.array_equal(out[0], out[3])
