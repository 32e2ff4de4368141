"""Multimodal plumbing tests: resize and frame-sample actor stages (fake
decode, real schema/explode/batch shape)."""

import numpy as np
import pyarrow as pa
import pytest


def _media_ds(payloads):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(len(payloads))]),
                "html": pa.array(payloads, type=pa.binary()),
            }
        )
    )


def test_resize_media_shape_and_determinism(ray_session):
    from shaclapi_ray.pipelines.multimodal import resize_media

    payloads = [bytes(range(256)) * 10, b"", None, b"xyz"]
    df = resize_media(_media_ds(payloads), width=8, height=4).to_pandas()
    assert list(df.columns) == ["url", "media", "width", "height"]
    assert (df.width == 8).all() and (df.height == 4).all()
    assert all(len(m) == 32 for m in df.media)
    df2 = resize_media(_media_ds(payloads), width=8, height=4).to_pandas()
    assert list(df.media) == list(df2.media)
    # strided resample preserves byte range of the source
    src = np.frombuffer(payloads[0], np.uint8)
    out = np.frombuffer(df.media.iloc[0], np.uint8)
    assert set(out.tolist()) <= set(src.tolist())


def test_sample_frames_explode(ray_session):
    from shaclapi_ray.pipelines.multimodal import sample_frames

    fb = 16
    payloads = [bytes(fb * 10), bytes(fb * 3), b"", bytes(fb - 1)]
    df = (
        sample_frames(
            _media_ds(payloads), every_n=2, max_frames=4, frame_bytes=fb
        )
        .to_pandas()
        .sort_values(["url", "frame_idx"])
    )
    # 10 frames, every 2nd, capped at 4 -> idx 0,2,4,6; 3 frames -> 0,2
    assert df[df.url == "u0"].frame_idx.tolist() == [0, 2, 4, 6]
    assert df[df.url == "u1"].frame_idx.tolist() == [0, 2]
    assert "u2" not in set(df.url) and "u3" not in set(df.url)
    assert all(len(f) == fb for f in df.frame)


def test_stub_error_mode_raises(ray_session):
    from shaclapi_ray.pipelines.multimodal import sample_frames

    with pytest.raises(Exception):  # NotImplementedError surfaces via Ray
        sample_frames(
            _media_ds([bytes(64)]), frame_bytes=16, decode_stub="error"
        ).to_pandas()
