"""Multimodal binary-column path: REAL pure-NumPy WAV/BMP codecs
(roundtrip-exact), the Arrow decode/featurize plumbing, and the
distributed synthetic-media surface."""

from __future__ import annotations

import numpy as np
import pytest


def test_wav_roundtrip_exact():
    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(7)
    samples = (rng.integers(-32768, 32767, size=500)).astype(np.int16)
    payload = encode_wav(samples, sample_rate=16000)
    out, rate, ch = decode_wav(payload)
    assert rate == 16000 and ch == 1 and out.shape == (500, 1)
    # float [-1,1] → exact int16 recovery
    assert np.array_equal((out[:, 0] * 32768.0).astype(np.int16), samples)


def test_wav_stereo_and_chunk_walk():
    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    stereo = np.arange(-100, 100, dtype=np.int16)  # interleaved L/R
    payload = encode_wav(stereo, sample_rate=8000, n_channels=2)
    # splice an unknown chunk between fmt and data: parsers must skip it
    hdr, data = payload[:36], payload[36:]
    spliced = hdr + b"LIST\x04\x00\x00\x00junk" + data
    out, rate, ch = decode_wav(spliced)
    assert ch == 2 and out.shape == (100, 2)
    assert np.array_equal((out.ravel() * 32768.0).astype(np.int16), stereo)


def test_bmp_roundtrip_exact_with_padding():
    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(11)
    # width 7 → rows need 4-byte padding (7*3=21 → 24)
    px = rng.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_decode_payload_rejects_compressed():
    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload(b"\xff\xd8\xff\xe0fakejpeg", "image/jpeg")
    with pytest.raises(ValueError):
        decode_payload(b"not a riff", "audio/wav")


def test_synthetic_media_decodes_distributed(spark):
    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import (
        extract_features,
        synthetic_media,
    )

    docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    media = synthetic_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 40
    by_type = {}
    for r in feats:
        by_type.setdefault(r["media_type"], []).append(r)
    assert len(by_type["audio/wav"]) == 20 and len(by_type["image/bmp"]) == 20
    # deterministic: same ids → same content hashes on rerun
    again = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
    for r in feats:
        assert again[r["media_id"]] == r["content_hash"]
    # decoded features are real (non-degenerate entropy from sine/gradient)
    assert all(r["byte_entropy"] > 0.5 for r in feats)


def test_resize_nearest_exact_semantics():
    import numpy as np

    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import resize_nearest

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_nearest(px, 3, 2)
    assert out.shape == (3, 2, 3)
    # nearest-neighbor index map: row i -> i*6//3, col j -> j*4//2
    for i in range(3):
        for j in range(2):
            assert (out[i, j] == px[i * 6 // 3, j * 4 // 2]).all()
    # identity resize is exact
    assert np.array_equal(resize_nearest(px, 6, 4), px)


def test_resize_bmp_thumbnails_distributed(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import (
        encode_bmp,
        resize_bmp_thumbnails,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    imgs = {i: rng.integers(0, 256, (16 + i, 12, 3), dtype=np.uint8) for i in range(3)}
    rows = [(i, "image/bmp", bytearray(encode_bmp(px))) for i, px in imgs.items()]
    rows.append((99, "audio/wav", bytearray(b"RIFFxxxx")))  # skipped, not decoded
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    out = {r["media_id"]: r for r in resize_bmp_thumbnails(media, 4, 4).collect()}
    assert set(out) == {0, 1, 2}
    for i, px in imgs.items():
        expect = resize_nearest(px, 4, 4)
        assert abs(out[i]["mean_r"] - float(expect[:, :, 0].mean())) < 1e-9
        assert out[i]["thumb_h"] == 4 and out[i]["thumb_w"] == 4


def test_ahash_known_bits_and_duplicate_invariance():
    import numpy as np

    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import ahash_bits

    # left half black, right half white, 8x8 → bits = columns 4-7 of each
    # row set (cell > mean); mean is 127.5 so white cells exceed it
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, 4:, :] = 255
    h = ahash_bits(px, grid=8)
    expect = 0
    for r in range(8):
        for c in range(4, 8):
            expect |= 1 << (r * 8 + c)
    assert h == np.int64(np.uint64(expect)).item()
    # identical pixels → identical hash; inverted image → complement bits
    assert ahash_bits(px.copy(), 8) == h


def test_audio_spectral_centroid_tracks_tone(spark):
    import numpy as np

    from cicevse2024_tfm_datapipeline_spark.operators.multimodal import (
        audio_spectral_features,
        encode_wav,
    )

    rate = 8000
    rows = []
    for mid, freq in [(1, 500.0), (2, 1500.0)]:
        t = np.arange(2048, dtype=np.float64)
        wave = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
        rows.append((mid, "audio/wav", bytearray(encode_wav(wave, rate))))
    rows.append((9, "image/bmp", bytearray(b"BMxx")))  # skipped
    media = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    out = {r["media_id"]: r for r in audio_spectral_features(media).collect()}
    assert set(out) == {1, 2}
    # pure tone → centroid and rolloff sit at the tone frequency (±1 bin)
    for mid, freq in [(1, 500.0), (2, 1500.0)]:
        assert abs(out[mid]["spectral_centroid_hz"] - freq) < 10.0
        assert abs(out[mid]["rolloff85_hz"] - freq) < 10.0
        # sin RMS = A/sqrt(2) with A = 12000/32768 ≈ 0.3662 → ≈ 0.2589
        assert 0.255 < out[mid]["rms"] < 0.263
