"""Multimodal plumbing: raw decode, phash recompute over mapInPandas,
resize, PSNR invariant, codec stubs."""

import numpy as np
import pytest

from gaoya_spark.fixtures import average_hash, make_images_df
from gaoya_spark.operators import multimodal as mm


def test_decode_raw_roundtrip():
    rng = np.random.default_rng(0)
    pix = rng.integers(0, 256, size=(8, 6, 3)).astype(np.uint8)
    out = mm.decode_image(mm.encode_raw(pix), "raw", 6, 8)
    assert (out == pix).all()


def test_decode_unknown_codec_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG", "png", 4, 4)


def test_psnr():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    assert mm.psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = 10
    assert 30 < mm.psnr(a, b) < 80


def test_resize_nearest():
    pix = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = mm.resize_nearest(pix, 2, 2)
    assert out.shape == (2, 2, 3)
    assert (out[0, 0] == pix[0, 0]).all()


def test_with_phash_matches_fixture(spark):
    df, _ = make_images_df(spark, 24, seed=9)
    got = mm.with_phash(df).select("image_id", "phash", "phash_computed").collect()
    assert len(got) == 24
    # exemplar rows (j==0) have phash == average_hash(bytes) exactly; edited
    # members had bits flipped, so allow them to differ — but the recompute
    # must be a real hash for every row
    assert all(r["phash_computed"] is not None for r in got)
    exact = sum(1 for r in got if r["phash"] == r["phash_computed"])
    assert exact >= 8  # all exemplars at minimum


def test_resize_images_spark(spark):
    df, _ = make_images_df(spark, 6, seed=3)
    out = mm.resize_images(df, 16, 16).collect()
    assert all(r["w"] == 16 and r["h"] == 16 for r in out)
    assert all(len(r["bytes"]) == 16 * 16 * 3 for r in out)


def test_psnr_check_identity(spark):
    df, _ = make_images_df(spark, 6, seed=4)
    res = mm.psnr_check(df, df).collect()
    # identical images -> PSNR inf -> stored as NULL, all >= 40dB trivially
    assert all(r["psnr_db"] is None for r in res)


def test_frame_sample_rawvideo(spark):
    """Video plumbing is real for fmt='rawvideo': every_n sampling explodes
    to raw image rows that feed the image operators directly."""
    rng = np.random.default_rng(9)
    w, h, n_frames = 16, 16, 7
    frames = rng.integers(0, 256, size=(n_frames, h, w, 3)).astype(np.uint8)
    rows = [("vid0", frames.tobytes(), w, h, "rawvideo")]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, w long, h long, fmt string"
    )
    out = mm.frame_sample(df, every_n=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 3, 6]
    for r in out:
        assert r["fmt"] == "raw" and len(r["bytes"]) == w * h * 3
        np.testing.assert_array_equal(
            np.frombuffer(r["bytes"], dtype=np.uint8).reshape(h, w, 3),
            frames[r["frame_idx"]],
        )
    # sampled frames are first-class image rows: phash computes on them
    imgs = mm.frame_sample(df, every_n=3).withColumnRenamed("video_id", "image_id")
    hashed = mm.with_phash(imgs).collect()
    assert all(r["phash_computed"] is not None for r in hashed)


def test_audio_features_rawpcm(spark):
    """Audio plumbing is real for fmt='rawpcm16': a pure sine's RMS is
    amplitude/sqrt(2) and its zero-crossing rate ~ 2f/sr."""
    sr, f, amp, secs = 8000, 440, 0.5, 1.0
    t = np.arange(int(sr * secs)) / sr
    x = (amp * np.sin(2 * np.pi * f * t) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [("a0", x.tobytes(), "rawpcm16", sr)],
        "audio_id string, bytes binary, fmt string, sample_rate long",
    )
    r = mm.audio_features(df).collect()[0]
    assert r["n_samples"] == sr
    assert abs(r["duration_s"] - 1.0) < 1e-9
    assert abs(r["rms"] - amp / np.sqrt(2)) < 0.01
    assert abs(r["zero_crossing_rate"] - 2 * f / sr) < 0.005
    assert 0.49 < r["peak"] <= 0.51


def test_video_audio_codec_decode_stubbed(spark):
    """Codec formats stay stubbed (no ffmpeg/audio libs in container)."""
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"xx", "h264", 2, 2)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"xx", "mp3")


def test_average_hash_deterministic():
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert average_hash(pix) == average_hash(pix)
    # small perturbation keeps hash close (hamming <= 3 typically)
    noisy = pix.copy()
    noisy[0, 0, 0] ^= 1
    a, b = average_hash(pix), average_hash(noisy)
    assert bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
