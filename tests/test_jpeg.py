"""Baseline JPEG codec (es_loaders_spark.jpeg) — pure numpy + stdlib.

Round-trip fidelity bounds (JPEG is lossy, so tests assert error
envelopes, exactness only where quantization guarantees it), stream
structure, restart markers, subsampling, and a frozen byte fixture so
decoder behavior can't drift silently.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from es_loaders_spark.jpeg import (
    _DCT,
    _UNZIGZAG,
    _ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float(10 * np.log10(255.0**2 / mse)) if mse else np.inf


def test_zigzag_is_a_permutation_and_inverse():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    assert np.array_equal(_ZIGZAG[_UNZIGZAG], np.arange(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_flat_color_roundtrip_exact():
    # uniform block → all AC coefficients are exactly 0; DC quantization
    # error rounds away at q=90 for this value
    px = np.full((16, 24, 3), 120, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, px)


def test_smooth_gradient_tight_error():
    x = np.linspace(0, 255, 64)
    grad = np.stack([np.tile(x, (48, 1))] * 3, axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(grad, quality=90))
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 2


def test_noise_psnr_bound_q95():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, (40, 56, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=95))
    assert psnr(out, px) > 30.0


def test_grayscale_roundtrip():
    rng = np.random.RandomState(1)
    g = rng.randint(0, 256, (33, 41), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=92))
    assert out.shape == (33, 41, 1)
    assert psnr(out[:, :, 0], g) > 28.0


def test_odd_dimensions_all_paths():
    rng = np.random.RandomState(2)
    for shape in [(7, 9), (8, 8), (17, 31), (1, 1), (9, 24)]:
        px = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(px, quality=90, subsampling=sub))
            assert out.shape == (*shape, 3), (shape, sub)


def test_restart_markers_identical_result():
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (24, 64, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(px, quality=85))
    restarts = decode_jpeg(encode_jpeg(px, quality=85, restart_interval=3))
    assert np.array_equal(plain, restarts)


def test_restart_markers_420_identical_result():
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (40, 48, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(px, quality=85, subsampling="420"))
    restarts = decode_jpeg(
        encode_jpeg(px, quality=85, subsampling="420", restart_interval=2)
    )
    assert np.array_equal(plain, restarts)


def test_420_preserves_luma_structure():
    # chroma subsampling must not disturb a grayscale-content RGB image
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (32, 32), dtype=np.uint8)
    px = np.stack([g, g, g], axis=-1)
    out = decode_jpeg(encode_jpeg(px, quality=95, subsampling="420"))
    assert psnr(out, px) > 28.0


def test_stream_structure():
    payload = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=90)
    assert payload[:2] == b"\xFF\xD8"  # SOI
    assert payload[-2:] == b"\xFF\xD9"  # EOI
    assert b"JFIF\x00" in payload[:32]
    # entropy-coded FF bytes must be stuffed: any FF inside the scan is
    # followed by 00 or a marker class byte
    i = payload.index(b"\xFF\xDA")
    scan = payload[i + 2 :]
    for j, b in enumerate(scan[:-1]):
        if b == 0xFF:
            assert scan[j + 1] == 0x00 or scan[j + 1] >= 0xD0


def test_decoder_rejects_garbage():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xFF\xD8\xFF\xC2\x00\x04\x00\x00")  # progressive SOF2


def test_frozen_fixture_decode_stable():
    """Encoder output and decoder output are both frozen: a checked-in
    hash pins the byte stream and the decoded pixels, so silent codec
    drift (table, zigzag, rounding changes) fails loudly."""
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
    payload = encode_jpeg(px, quality=80, subsampling="420", restart_interval=2)
    assert hashlib.md5(payload).hexdigest() == ENCODED_MD5
    out = decode_jpeg(payload)
    assert hashlib.md5(out.tobytes()).hexdigest() == DECODED_MD5


# frozen by the first verified run (see test_frozen_fixture_decode_stable)
ENCODED_MD5 = "7ae043c56d0b7bffc35c531355408925"
DECODED_MD5 = "afc9136a9e0ecfba200b197298ff227d"


# --- property fuzz (hypothesis) ---------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    sub=st.sampled_from(["444", "420"]),
    quality=st.integers(30, 100),
    gray=st.booleans(),
    restart=st.integers(0, 4),
)
def test_roundtrip_any_shape_never_crashes(h, w, seed, sub, quality, gray, restart):
    """Any size/content/config: encode→decode preserves shape, returns
    uint8 in range, and raises nothing."""
    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality, restart_interval=restart, subsampling=sub))
    assert out.shape == (h, w, 1 if gray else 3)
    assert out.dtype == np.uint8


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_high_quality_psnr_floor(seed):
    """q=97 4:4:4 round-trip of smooth content stays above 30 dB."""
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (4, 4, 3)).astype(np.float64)
    # bilinear-ish upsample → smooth field
    px = np.clip(np.kron(base, np.ones((8, 8, 1))), 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=97))
    assert psnr(out, px) > 30.0


def test_truncated_stream_raises_valueerror():
    """Header truncation anywhere must surface as ValueError (the media
    pipeline's malformed-payload contract), never IndexError."""
    full = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=90)
    for cut in [3, 5, 9, 20, len(full) // 2]:
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut] + b"\xFF")  # ends in a dangling marker byte
    with pytest.raises(ValueError):
        decode_jpeg(b"\xFF\xD8\xFF")
