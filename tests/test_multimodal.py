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


def test_real_decode_raises():
    with pytest.raises(NotImplementedError):
        ImagePreprocess(decode="real")(_media_table(1))


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
