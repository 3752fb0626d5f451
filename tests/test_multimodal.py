"""Multimodal plumbing: schema, shapes, determinism, fan-out — with the
decode stubbed (no codec libs in this environment; see stages/multimodal.py).
"""

import numpy as np
import pyarrow as pa
import pytest

from clip_as_service_ray.stages.multimodal import (
    ImagePreprocess,
    _fake_decode,
    _resize_center_crop,
    preprocess_images,
    sample_frames,
)


def _media_table(n=6):
    rng = np.random.default_rng(11)
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "payload": pa.array([rng.bytes(4096) for _ in range(n)], pa.binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array([64, 128, 256, 64, 640, 31][:n], pa.int32()),
            "height": pa.array([64, 96, 128, 480, 64, 200][:n], pa.int32()),
        }
    )


def test_fake_decode_deterministic():
    a = _fake_decode(b"payload-bytes", 32, 16)
    b = _fake_decode(b"payload-bytes", 32, 16)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 32, 3) and a.dtype == np.uint8


def test_resize_center_crop_shapes():
    for h, w in [(64, 64), (480, 64), (64, 480), (31, 200), (224, 224)]:
        img = np.zeros((h, w, 3), dtype=np.uint8)
        out = _resize_center_crop(img, 224)
        assert out.shape == (224, 224, 3)  # test_server.py:105-115 contract


def test_image_preprocess_batch():
    out = ImagePreprocess(size=224)(_media_table())
    assert out.column_names == ["id", "tensor", "shape"]
    assert out.num_rows == 6
    for t, s in zip(out.column("tensor").to_pylist(), out.column("shape").to_pylist()):
        assert s == [3, 224, 224]
        assert len(t) == 3 * 224 * 224
    # heavy payload dropped (helper.py:44-47 analog)
    assert "payload" not in out.column_names


def test_real_decode_raises_for_compressed_formats():
    # payload is random bytes (not BMP) -> the codec-library branch
    with pytest.raises(NotImplementedError):
        ImagePreprocess(decode="real")(_media_table(1))


def test_bmp_round_trip():
    from clip_as_service_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(16, 16), (7, 13), (1, 1), (33, 62)]:  # odd widths: row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        decode_bmp(b"nonsense-bytes-here" * 10)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(img)[:60])  # truncated pixel data
    bad = bytearray(encode_bmp(img))
    bad[30] = 4  # BI_JPEG embedding: the remaining honest guard
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad))


def test_real_bmp_decode_through_preprocess():
    from clip_as_service_ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for h, w in [(40, 64), (64, 40)]]
    media = pa.table(
        {
            "id": pa.array(range(len(imgs)), pa.int64()),
            "payload": pa.array([encode_bmp(i) for i in imgs], pa.binary()),
            "mime": pa.array(["image/bmp"] * len(imgs)),
            "width": pa.array([i.shape[1] for i in imgs], pa.int32()),
            "height": pa.array([i.shape[0] for i in imgs], pa.int32()),
        }
    )
    out = ImagePreprocess(size=32, decode="real")(media)
    assert out.column("shape").to_pylist() == [[3, 32, 32]] * len(imgs)
    # the tensor must derive from the REAL pixels: recompute expected from
    # the decoded image through the same geometry + normalize kernels
    from clip_as_service_ray.stages.multimodal import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        _resize_center_crop,
    )

    mean = np.asarray(IMAGENET_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGENET_STD, np.float32).reshape(3, 1, 1)
    for row, img in enumerate(imgs):
        chw = (_resize_center_crop(decode_bmp(encode_bmp(img)), 32).astype(np.float32) / 255.0).transpose(2, 0, 1)
        want = ((chw - mean) / std).ravel()
        got = np.asarray(out.column("tensor")[row].as_py(), dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_ray_pipeline_and_frame_fanout(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_media_table())
    out = preprocess_images(ds).to_pandas()
    assert len(out) == 6

    frames_in = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1], pa.int64()),
                "payload": pa.array([b"x" * 10240, b"y" * 2048], pa.binary()),
            }
        )
    )
    frames = sample_frames(frames_in, frame_bytes=1024, every_k=5).to_pandas()
    # id 0: 10 frames -> idx 0,5 ; id 1: 2 frames -> idx 0
    assert sorted(zip(frames.id, frames.frame_idx)) == [(0, 0), (0, 5), (1, 0)]
    assert all(len(p) == 1024 for p in frames.payload)


def test_audio_features_real_dsp(ray_session):
    """AudioFeatures is a fully-real stage (raw PCM needs no codec): a pure
    440 Hz sine must yield a spectral centroid near 440 Hz, ~2x zero
    crossings per period, and louder signal -> higher log-energy."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from clip_as_service_ray.stages.multimodal import extract_audio_features

    sr = 16000
    t = np.arange(sr) / sr  # 1 second
    sine = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    quiet = (0.05 * np.sin(2 * np.pi * 440 * t) * 32767).astype("<i2")
    ds = ray.data.from_arrow(
        pa.table(
            {"id": pa.array([1, 2], pa.int64()),
             "payload": pa.array([sine.tobytes(), quiet.tobytes()], pa.binary())}
        )
    )
    out = extract_audio_features(ds, sample_rate=sr).to_pandas()
    loud = out[out.id == 1]
    soft = out[out.id == 2]
    assert len(loud) == len(soft) > 20  # windows per second
    assert abs(loud.centroid_hz.mean() - 440) < 40
    # zcr of a 440 Hz sine at 16 kHz: 2*440/16000 crossings per sample
    assert abs(loud.zcr.mean() - 2 * 440 / sr) < 0.01
    assert loud.log_energy.mean() > soft.log_energy.mean()
    # determinism: same input -> identical output
    out2 = extract_audio_features(ds, sample_rate=sr).to_pandas()
    assert out.sort_values(["id", "frame_idx"]).reset_index(drop=True).equals(
        out2.sort_values(["id", "frame_idx"]).reset_index(drop=True)
    )
    # sub-window payload -> zero rows, stable schema
    tiny = ray.data.from_arrow(
        pa.table({"id": pa.array([9], pa.int64()),
                  "payload": pa.array([b"\x00\x01"], pa.binary())})
    )
    empty = extract_audio_features(tiny, sample_rate=sr).to_pandas()
    assert len(empty) == 0


def test_png_round_trip_all_filters():
    from clip_as_service_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (9, 13), (24, 24), (17, 3)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for f in range(5):  # None / Sub / Up / Average / Paeth scanlines
            out = decode_png(encode_png(img, filter_type=f))
            np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        decode_png(b"nonsense-bytes" * 8)
    with pytest.raises(ValueError):
        decode_png(encode_png(img)[:40])  # truncated: no IDAT/IEND


def test_png_color_types_and_unsupported():
    import zlib

    from clip_as_service_ray.stages.multimodal import PNG_SIG, decode_png

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + ctype + data + crc.to_bytes(4, "big")

    def manual(w, h, ctype_n, channels, raw_px, extra=b"", depth=8, interlace=0):
        ihdr = (
            w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([depth, ctype_n, 0, 0, interlace])
        )
        body = b"".join(
            b"\x00" + raw_px[y * w * channels : (y + 1) * w * channels].tobytes()
            for y in range(h)
        )
        return (
            PNG_SIG + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(body)) + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(9)
    h, w = 6, 5
    g = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(manual(w, h, 0, 1, g.ravel())), np.repeat(g, 3, axis=2)
    )
    rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(manual(w, h, 6, 4, rgba.ravel())), rgba[..., :3]
    )
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w, 1), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_png(manual(w, h, 3, 1, idx.ravel(), extra=chunk(b"PLTE", pal.tobytes()))),
        pal[idx[..., 0]],
    )
    # 16-bit decodes for real now; an 8-bit-sized body mislabeled depth=16
    # is a hard size-mismatch error, not a silent misread
    with pytest.raises(ValueError):
        decode_png(manual(w, h, 0, 1, g.ravel(), depth=16))
    # Adam7 decodes for real now; a sequential stream mislabeled as
    # interlaced is a hard size-mismatch error, not a silent misread
    with pytest.raises(ValueError):
        decode_png(manual(w, h, 0, 1, g.ravel(), interlace=1))
    # real Adam7 grayscale: pass sub-images in spec order, filter 0
    adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    gh, gw = 11, 9
    gg = rng.integers(0, 256, (gh, gw, 1), dtype=np.uint8)
    parts = []
    for x0, y0, xs, ys in adam7:
        sub = gg[y0::ys, x0::xs]
        if sub.shape[0] and sub.shape[1]:
            parts.append(
                b"".join(b"\x00" + sub[y].tobytes() for y in range(sub.shape[0]))
            )
    ipng = (
        PNG_SIG
        + chunk(b"IHDR", gw.to_bytes(4, "big") + gh.to_bytes(4, "big") + bytes([8, 0, 0, 0, 1]))
        + chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(ipng), np.repeat(gg, 3, axis=2))


def test_real_png_decode_through_preprocess():
    from clip_as_service_ray.stages.multimodal import encode_png

    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for h, w in [(40, 64), (64, 40)]
    ]
    media = pa.table(
        {
            "id": pa.array(range(len(imgs)), pa.int64()),
            "payload": pa.array(
                [encode_png(i, filter_type=4) for i in imgs], pa.binary()
            ),
            "mime": pa.array(["image/png"] * len(imgs)),
            "width": pa.array([i.shape[1] for i in imgs], pa.int32()),
            "height": pa.array([i.shape[0] for i in imgs], pa.int32()),
        }
    )
    out = ImagePreprocess(size=32, decode="real")(media)
    assert out.column("shape").to_pylist() == [[3, 32, 32]] * len(imgs)
    from clip_as_service_ray.stages.multimodal import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        _resize_center_crop,
    )

    mean = np.asarray(IMAGENET_MEAN, dtype=np.float32).reshape(3, 1, 1)
    std = np.asarray(IMAGENET_STD, dtype=np.float32).reshape(3, 1, 1)
    for i, img in enumerate(imgs):
        want = (_resize_center_crop(img, 32).astype(np.float32) / 255.0).transpose(2, 0, 1)
        want = ((want - mean) / std).ravel()
        got = np.asarray(out.column("tensor")[i].as_py(), dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_gif_round_trip_and_preprocess(ray_session):
    """Real GIF decode: LZW (dictionary growth + CLEAR), interlace,
    multi-frame composition; first frame flows through ImagePreprocess."""
    import pyarrow as pa

    from clip_as_service_ray.functions.gif import (
        decode_gif,
        decode_gif_frames,
        encode_gif,
    )
    from clip_as_service_ray.stages.multimodal import ImagePreprocess

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(100, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 100, size=(40, 56))]
    for interlace in (False, True):
        assert np.array_equal(decode_gif(encode_gif(img, interlace=interlace)), img)
    frames = [pal[rng.integers(0, 100, size=(24, 24))] for _ in range(3)]
    got = decode_gif_frames(encode_gif(frames))
    assert len(got) == 3
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)

    media = pa.table(
        {
            "id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_gif(img)], pa.binary()),
            "mime": pa.array(["image/gif"]),
            "width": pa.array([img.shape[1]], pa.int32()),
            "height": pa.array([img.shape[0]], pa.int32()),
        }
    )
    out = ImagePreprocess(size=32, decode="real")(media)
    assert out.column("shape").to_pylist() == [[3, 32, 32]]


def test_gif_frame_sampling_real(ray_session):
    """GifFrameSample: every-k composed frames re-encoded as decodable BMP."""
    import pyarrow as pa

    from clip_as_service_ray.functions.gif import encode_gif
    from clip_as_service_ray.stages.multimodal import GifFrameSample, decode_bmp

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 16, size=(10, 12))] for _ in range(7)]
    batch = pa.table(
        {
            "id": pa.array([42], pa.int64()),
            "payload": pa.array([encode_gif(frames)], pa.binary()),
        }
    )
    out = GifFrameSample(every_k=3)(batch)
    assert out.column("frame_idx").to_pylist() == [0, 3, 6]
    for row, fi in enumerate([0, 3, 6]):
        decoded = decode_bmp(out.column("payload")[row].as_py())
        assert np.array_equal(decoded, frames[fi])


def test_png_adam7_roundtrip():
    """Adam7 interlaced PNG: encoder (per-pass filtering) -> decoder
    (per-pass unfilter + scatter) is pixel-identical to the source across
    sizes that exercise empty passes (dims < 8) and every filter type."""
    from clip_as_service_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(5)
    for (h, w) in [(1, 1), (2, 3), (7, 7), (8, 8), (9, 13), (33, 47), (5, 64)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for ft in range(5):
            out = decode_png(encode_png(img, filter_type=ft, interlace=True))
            np.testing.assert_array_equal(out, img, err_msg=f"{h}x{w} f{ft}")


def test_gif_disposal_modes():
    """GIF89a disposal: 2 restores the frame rect to the background color,
    3 restores the pre-frame canvas; both run when the NEXT frame arrives
    (spec §23). The encoder emits graphic-control extensions + sub-rect
    frames so the composition path is exercised end-to-end."""
    from clip_as_service_ray.functions.gif import decode_gif_frames, encode_gif

    blue = np.full((8, 8, 3), (0, 0, 255), np.uint8)
    red = np.full((2, 2, 3), (255, 0, 0), np.uint8)
    green = np.full((2, 2, 3), (0, 255, 0), np.uint8)
    white = np.full((8, 8, 3), (255, 255, 255), np.uint8)
    frames = decode_gif_frames(
        encode_gif(
            [blue, red, green, white],
            offsets=[(0, 0), (3, 2), (0, 0), (0, 0)],
            disposals=[0, 3, 2, 0],
            bg_color=(17, 34, 51),
        )
    )
    assert len(frames) == 4
    assert (frames[0] == (0, 0, 255)).all()
    # frame 1: red patch at x=3..4, y=2..3 on blue
    assert (frames[1][2:4, 3:5] == (255, 0, 0)).all()
    assert (frames[1][0, 0] == (0, 0, 255)).all()
    # frame 2: red patch restored to PREVIOUS (blue); green drawn at origin
    assert (frames[2][2:4, 3:5] == (0, 0, 255)).all()
    assert (frames[2][0:2, 0:2] == (0, 255, 0)).all()
    # frame 3: fully covered by white regardless of the bg restore
    assert (frames[3] == (255, 255, 255)).all()

    # restore-to-background left visible by a non-covering last frame
    tiny = np.full((1, 1, 3), (255, 0, 0), np.uint8)
    fr = decode_gif_frames(
        encode_gif(
            [blue, green, tiny],
            offsets=[(0, 0), (0, 0), (7, 7)],
            disposals=[0, 2, 0],
            bg_color=(17, 34, 51),
        )
    )
    assert (fr[2][0:2, 0:2] == (17, 34, 51)).all()  # bg-restored rect
    assert (fr[2][7, 7] == (255, 0, 0)).all()
    assert (fr[2][4, 4] == (0, 0, 255)).all()  # untouched canvas stays


def test_png_16bit_all_color_types():
    """16-bit gray/RGB/gray+alpha/RGBA round-trip through every filter type:
    default output keeps the most-significant byte (PIL 'RGB;16B' rawmode
    semantics); keep_precision returns the full uint16 samples."""
    from clip_as_service_ray.stages.multimodal import decode_png, encode_png_ext

    rng = np.random.default_rng(21)
    h, w = 9, 7
    for ctype_n, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        img = rng.integers(0, 1 << 16, (h, w, ch), dtype=np.uint16)
        for ft in range(5):
            payload = encode_png_ext(img, depth=16, ctype_n=ctype_n, filter_type=ft)
            out = decode_png(payload)
            hi = (img >> 8).astype(np.uint8)
            exp = (
                np.repeat(hi[..., :1], 3, axis=2) if ch in (1, 2)
                else hi[..., :3]
            )
            np.testing.assert_array_equal(out, exp, err_msg=f"ct{ctype_n} f{ft}")
            wide = decode_png(payload, keep_precision=True)
            expw = (
                np.repeat(img[..., :1], 3, axis=2) if ch in (1, 2)
                else img[..., :3]
            )
            np.testing.assert_array_equal(wide, expw)


def test_png_16bit_adam7():
    from clip_as_service_ray.stages.multimodal import decode_png, encode_png_ext

    rng = np.random.default_rng(22)
    img = rng.integers(0, 1 << 16, (11, 9, 3), dtype=np.uint16)
    for ft in (0, 4):
        payload = encode_png_ext(img, depth=16, ctype_n=2, filter_type=ft, interlace=True)
        np.testing.assert_array_equal(
            decode_png(payload, keep_precision=True), img
        )


def test_png_sub_byte_depths():
    """1/2/4-bit gray (scaled to full 8-bit range per spec §11.2.2) and
    palette (indices never scaled), sequential and Adam7, odd widths so the
    scanline tail has padding bits."""
    from clip_as_service_ray.stages.multimodal import decode_png, encode_png_ext

    rng = np.random.default_rng(23)
    h, w = 10, 13  # 13 samples/row -> padded final byte at depths 1/2/4
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        g = rng.integers(0, mx + 1, (h, w, 1), dtype=np.uint8)
        scale = 255 // mx
        for ft in (0, 1, 2, 3, 4):
            payload = encode_png_ext(g, depth=depth, ctype_n=0, filter_type=ft)
            np.testing.assert_array_equal(
                decode_png(payload), np.repeat(g * scale, 3, axis=2),
                err_msg=f"gray d{depth} f{ft}",
            )
        pal = rng.integers(0, 256, (mx + 1, 3), dtype=np.uint8)
        idx = rng.integers(0, mx + 1, (h, w, 1), dtype=np.uint8)
        payload = encode_png_ext(idx, depth=depth, ctype_n=3, palette=pal)
        np.testing.assert_array_equal(decode_png(payload), pal[idx[..., 0]])
        # Adam7 at sub-byte depth: per-pass scanline padding
        payload = encode_png_ext(g, depth=depth, ctype_n=0, filter_type=2, interlace=True)
        np.testing.assert_array_equal(
            decode_png(payload), np.repeat(g * scale, 3, axis=2)
        )


def test_png_invalid_depth_combos():
    from clip_as_service_ray.stages.multimodal import decode_png, encode_png_ext

    rng = np.random.default_rng(24)
    img = rng.integers(0, 2, (4, 4, 3), dtype=np.uint16)
    payload = bytearray(encode_png_ext(img, depth=16, ctype_n=2))
    # corrupt IHDR depth to an illegal combo: depth 4 with color type 2
    assert payload[24] == 16 and payload[25] == 2
    payload[24] = 4
    with pytest.raises(ValueError):
        decode_png(bytes(payload))
    payload[24] = 3  # depth 3 is never legal
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def _bmp_header(w, h, bpp, compression, pix_off, img_size, n_colors=0):
    return (
        b"BM"
        + (pix_off + img_size).to_bytes(4, "little")
        + b"\0\0\0\0"
        + pix_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + compression.to_bytes(4, "little")
        + img_size.to_bytes(4, "little")
        + b"\x13\x0b\0\0\x13\x0b\0\0"
        + n_colors.to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )


def test_bmp_8bit_paletted():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    # 3x2 bottom-up paletted image, 4 colors, stride padded 3 -> 4
    palette = bytes([255, 0, 0, 0,  0, 255, 0, 0,  0, 0, 255, 0,  10, 20, 30, 0])
    rows = bytes([0, 1, 2, 0,  3, 3, 0, 0])  # bottom row first
    payload = _bmp_header(3, 2, 8, 0, 54 + 16, len(rows), n_colors=4) + palette + rows
    img = decode_bmp(payload)
    assert img.shape == (2, 3, 3)
    # palette is BGRx -> RGB; top row (stored second) = [3, 3, 0]
    assert img[0].tolist() == [[30, 20, 10], [30, 20, 10], [0, 0, 255]]
    assert img[1].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]


def test_bmp_32bit_bgra():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    # 2x2 bottom-up 32-bit BGRA (alpha dropped), no padding needed
    px = bytes(
        [1, 2, 3, 255,  4, 5, 6, 0,    # bottom row: BGR(A)
         7, 8, 9, 9,    10, 11, 12, 1]  # top row
    )
    payload = _bmp_header(2, 2, 32, 0, 54, len(px)) + px
    img = decode_bmp(payload)
    assert img[0].tolist() == [[9, 8, 7], [12, 11, 10]]
    assert img[1].tolist() == [[3, 2, 1], [6, 5, 4]]


def test_bmp_rle8():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    # 5x2 RLE8: bottom row = run of 3 idx0, run 1 idx1, run 1 idx2, EOL;
    # top row = delta skip 2 (stays idx0) + run 3 idx3, EOB
    palette = bytes([255, 0, 0, 0,  0, 255, 0, 0,  0, 0, 255, 0,  40, 50, 60, 0])
    rle = bytes([3, 0,  1, 1,  1, 2,  0, 0,  0, 2, 2, 0,  3, 3,  0, 1])
    payload = _bmp_header(5, 2, 8, 1, 54 + 16, len(rle), n_colors=4) + palette + rle
    img = decode_bmp(payload)
    # bottom row indices: [0,0,0,1,2]; top row: [0,0,3,3,3]
    assert img[1].tolist() == [
        [0, 0, 255], [0, 0, 255], [0, 0, 255], [0, 255, 0], [255, 0, 0]
    ]
    assert img[0].tolist() == [
        [0, 0, 255], [0, 0, 255], [60, 50, 40], [60, 50, 40], [60, 50, 40]
    ]


def test_bmp_1bit_and_4bit():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    # 1-bit: 10x1, bits MSB-first, 2-color palette, stride 4
    palette = bytes([0, 0, 0, 0,  255, 255, 255, 0])
    rows = bytes([0b10110000, 0b01000000, 0, 0])  # pixels 1011000001
    p = _bmp_header(10, 1, 1, 0, 54 + 8, 4, n_colors=2) + palette + rows
    img = decode_bmp(p)
    assert [px[0] for px in img[0].tolist()] == [
        255, 0, 255, 255, 0, 0, 0, 0, 0, 255
    ]
    # 4-bit: 3x1 nibbles high-first
    palette4 = bytes([255, 0, 0, 0,  0, 255, 0, 0,  0, 0, 255, 0])
    rows4 = bytes([0x01, 0x20, 0, 0])  # indices 0,1,2
    p4 = _bmp_header(3, 1, 4, 0, 54 + 12, 4, n_colors=3) + palette4 + rows4
    assert decode_bmp(p4)[0].tolist() == [[0, 0, 255], [0, 255, 0], [255, 0, 0]]


def test_bmp_rle4():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    palette = bytes([255, 0, 0, 0,  0, 255, 0, 0,  0, 0, 255, 0])
    # 5x1: encoded run of 4 alternating idx 1/2, run 1 idx 0, EOB
    rle = bytes([4, 0x12, 1, 0x00, 0, 1])
    p = _bmp_header(5, 1, 4, 2, 54 + 12, len(rle), n_colors=3) + palette + rle
    assert decode_bmp(p)[0].tolist() == [
        [0, 255, 0], [255, 0, 0], [0, 255, 0], [255, 0, 0], [0, 0, 255]
    ]


def test_bmp_16bit_555_and_bitfields_565():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    # default 5-5-5: red (31<<10), green (31<<5), blue (31)
    px = (31 << 10).to_bytes(2, "little") + (31 << 5).to_bytes(2, "little")
    p = _bmp_header(2, 1, 16, 0, 54, 4) + px
    assert decode_bmp(p)[0].tolist() == [[255, 0, 0], [0, 255, 0]]
    # BI_BITFIELDS 5-6-5
    masks = (0xF800).to_bytes(4, "little") + (0x07E0).to_bytes(4, "little") + (
        0x001F
    ).to_bytes(4, "little")
    px = (0xF800).to_bytes(2, "little") + (0x07E0).to_bytes(2, "little")
    p = _bmp_header(2, 1, 16, 3, 54 + 12, 4) + masks + px
    assert decode_bmp(p)[0].tolist() == [[255, 0, 0], [0, 255, 0]]


def test_bmp_malformed_payload_contract():
    from clip_as_service_ray.stages.multimodal import decode_bmp

    palette = bytes([255, 0, 0, 0])  # ONE color
    # RLE8 with pixel offset past the payload end -> ValueError, not a
    # silent all-zeros image
    p = _bmp_header(4, 1, 8, 1, 9999, 4, n_colors=1) + palette
    with pytest.raises(ValueError):
        decode_bmp(p)
    # palette index out of range (index 5 with 1 color) -> ValueError
    rows = bytes([0, 5, 0, 0])
    p = _bmp_header(4, 1, 8, 0, 54 + 4, 4, n_colors=1) + palette + rows
    with pytest.raises(ValueError):
        decode_bmp(p)
    # OS/2 BITMAPCOREHEADER (size 12) -> NotImplementedError
    core = bytearray(_bmp_header(4, 1, 8, 0, 54, 4, n_colors=1) + palette + rows)
    core[14:18] = (12).to_bytes(4, "little")
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(core))
