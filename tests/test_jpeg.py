"""Baseline JPEG codec: round-trips, subsampling, odd sizes, marker guards."""

import numpy as np
import pytest

from clip_as_service_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3 + xx * 2) % 256
    img = np.stack([base, 255 - base, (base * 2) % 256], axis=-1).astype(np.float64)
    img += rng.normal(0, 2, img.shape)  # mild noise, stays compressible
    return np.clip(img, 0, 255).astype(np.uint8)


def test_solid_color_near_exact():
    img = np.full((16, 16, 3), 200, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (16, 16, 3)
    assert np.max(np.abs(out.astype(int) - 200)) <= 2


def test_gradient_round_trip_444():
    img = _gradient(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() < 40


def test_gradient_round_trip_420():
    img = _gradient(48, 48, seed=3)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 8  # chroma smoothing is expected


def test_odd_dimensions_cropped():
    img = _gradient(13, 10, seed=5)
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert out.shape == (13, 10, 3)
    err = np.abs(
        decode_jpeg(encode_jpeg(img, quality=95)).astype(int) - img.astype(int)
    )
    assert err.mean() < 5


def test_grayscale():
    img = (np.mgrid[0:24, 0:24][0] * 10 % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (24, 24, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    err = np.abs(out[..., 0].astype(int) - img.astype(int))
    assert err.mean() < 4


def test_quality_monotonic():
    img = _gradient(32, 32, seed=9)
    hi = decode_jpeg(encode_jpeg(img, quality=95))
    lo = decode_jpeg(encode_jpeg(img, quality=20))
    e_hi = np.abs(hi.astype(int) - img.astype(int)).mean()
    e_lo = np.abs(lo.astype(int) - img.astype(int)).mean()
    assert e_hi < e_lo
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img, quality=95))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"BM\x00\x00")


def test_stuffed_ff_bytes_survive():
    # white image produces large DC values -> exercise 0xFF stuffing paths
    img = np.full((32, 32, 3), 255, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert np.min(out) >= 250


def test_real_jpeg_decode_through_preprocess():
    import pyarrow as pa

    from clip_as_service_ray.stages.multimodal import ImagePreprocess

    imgs = [_gradient(40, 64, seed=1), _gradient(64, 40, seed=2)]
    media = pa.table(
        {
            "id": pa.array(range(len(imgs)), pa.int64()),
            "payload": pa.array(
                [encode_jpeg(i, quality=92, subsample=s)
                 for i, s in zip(imgs, (False, True))],
                pa.binary(),
            ),
            "mime": pa.array(["image/jpeg"] * len(imgs)),
            "width": pa.array([i.shape[1] for i in imgs], pa.int32()),
            "height": pa.array([i.shape[0] for i in imgs], pa.int32()),
        }
    )
    out = ImagePreprocess(size=32, decode="real")(media)
    assert out.column("shape").to_pylist() == [[3, 32, 32]] * len(imgs)


def test_progressive_equals_baseline_pixels():
    """SOF2 decode must reproduce EXACTLY the baseline decode of the same
    image/quality (identical quantized coefficients -> identical pixels):
    validates every progressive scan kind against the independently-tested
    sequential path."""
    from clip_as_service_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, size=(33, 49, 3), dtype=np.uint8),  # noise
        _gradient(40, 56, seed=3),                               # smooth
        np.full((24, 24, 3), 128, np.uint8),                     # constant
        rng.integers(0, 256, size=(17, 31), dtype=np.uint8),     # grayscale
    ]
    for img in cases:
        for q in (25, 90):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(base, prog)


def test_progressive_eob_runs_variant():
    """Cross-block EOBn runs (custom Huffman table with EOBn symbols, runs
    spanning many blocks + buffered refinement correction bits) decode to
    the same pixels."""
    from clip_as_service_ray.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    cases = [
        np.full((64, 48, 3), 200, np.uint8),  # long runs across all blocks
        _gradient(56, 56, seed=4),
        rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8),
    ]
    for img in cases:
        for q in (20, 85):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, eob_runs=True)
            )
            assert np.array_equal(base, prog)


def test_progressive_marker_is_sof2():
    from clip_as_service_ray.functions.jpeg import encode_jpeg_progressive

    payload = encode_jpeg_progressive(_gradient(16, 16, seed=5))
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    # multi-scan: more than one SOS segment
    assert payload.count(b"\xff\xda") >= 6


def test_jpeg_12bit_roundtrip():
    """12-bit JPEG (extended sequential SOF1, 16-bit DQT entries, widened
    flat Huffman tables — T.81 sample precision 12): encoder->decoder is
    near-lossless at quality 100 (max err 1 from float DCT rounding), incl.
    extreme coefficients (DC category 15 / large AC sizes), grayscale, and
    4:2:0 structure; the default uint8 contract scales by 255/4095."""
    import numpy as np

    from clip_as_service_ray.functions.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack(
        [((yy * 60 + xx * 3) % 4096), ((yy + xx) % 2) * 4095,
         (((yy // 8) + (xx // 8)) % 2) * 4095],
        axis=-1,
    ).astype(np.uint16)
    payload = encode_jpeg(img, quality=100, precision=12)
    out = decode_jpeg(payload, keep_precision=True)
    assert out.dtype == np.uint16
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    u8 = decode_jpeg(payload)
    assert u8.dtype == np.uint8 and u8.shape == img.shape
    # grayscale
    g = np.linspace(0, 4095, 32 * 32).reshape(32, 32).astype(np.uint16)
    og = decode_jpeg(encode_jpeg(g, quality=100, precision=12), keep_precision=True)
    assert np.abs(og[..., 0].astype(int) - g.astype(int)).max() <= 1
    # 4:2:0 at 12-bit decodes with the right geometry
    o2 = decode_jpeg(encode_jpeg(img, quality=100, precision=12, subsample=True))
    assert o2.shape == img.shape
