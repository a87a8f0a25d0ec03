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
