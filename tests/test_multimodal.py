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


def test_frame_sample_and_audio_stubs(spark):
    df, _ = make_images_df(spark, 2, seed=5)
    with pytest.raises(NotImplementedError):
        mm.frame_sample(df)
    with pytest.raises(NotImplementedError):
        mm.audio_features(df)


def test_average_hash_deterministic():
    rng = np.random.default_rng(1)
    pix = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    assert average_hash(pix) == average_hash(pix)
    # small perturbation keeps hash close (hamming <= 3 typically)
    noisy = pix.copy()
    noisy[0, 0, 0] ^= 1
    a, b = average_hash(pix), average_hash(noisy)
    assert bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3
