"""Multimodal binary-payload plumbing (SURVEY training-data ops):
schema, deterministic fake decode, resize, frame sampling, and the
actor-pool map_batches wiring."""

import numpy as np
import pyarrow as pa
import pytest

from raycrawl.stages.multimodal import (
    MEDIA_SCHEMA,
    AudioFrameSampleStage,
    ImageDecodeStage,
    ImageResizeStage,
    attach_payload_metadata,
)


def _media_table(n=6) -> pa.Table:
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(["image/jpeg"] * n, pa.string()),
            "payload": pa.array(
                [bytes([i]) * (100 + i) for i in range(n)], pa.binary()
            ),
        }
    )


def test_attach_payload_metadata_matches_schema():
    out = attach_payload_metadata(_media_table())
    assert out.column("n_bytes").to_pylist() == [100 + i for i in range(6)]
    assert set(MEDIA_SCHEMA.names) == set(out.schema.names)
    # digest is content-addressed: identical payload -> identical digest
    t2 = attach_payload_metadata(_media_table())
    assert out.column("digest").to_pylist() == t2.column("digest").to_pylist()


def test_image_decode_requires_codec_unless_fake():
    with pytest.raises(NotImplementedError):
        ImageDecodeStage()
    with pytest.raises(NotImplementedError):
        AudioFrameSampleStage()
    with pytest.raises(NotImplementedError):
        ImageResizeStage()


def test_image_decode_deterministic_features():
    stage = ImageDecodeStage(fake=True, size=(16, 16))
    a = stage(_media_table())
    b = stage(_media_table())
    assert a.column("mean_r").to_pylist() == b.column("mean_r").to_pylist()
    assert a.column("height").to_pylist() == [16] * 6


def test_image_resize_shape_and_determinism():
    stage = ImageResizeStage(fake=True, in_size=(32, 32), out_size=(8, 8))
    out = stage(_media_table())
    pixels = out.column("pixels").to_pylist()
    assert all(len(p) == 8 * 8 * 3 for p in pixels)
    assert out.column("height").to_pylist() == [8] * 6
    # nearest-neighbor of a deterministic decode is deterministic
    assert pixels == stage(_media_table()).column("pixels").to_pylist()


def test_audio_frame_sample_layout():
    stage = AudioFrameSampleStage(fake=True, num_frames=4, frame_bytes=16)
    out = stage(_media_table())
    assert out.num_rows == 6 * 4
    assert out.column("frame").to_pylist()[:4] == [0, 1, 2, 3]
    # frames are slices of the payload
    first = out.filter(
        pa.compute.equal(out.column("media_id"), 0)
    ).column("frame_payload").to_pylist()
    assert all(f == b"\x00" * min(16, len(f)) for f in first)


def test_actor_pool_plumbing(ray_session):
    """The Ray-side wiring: binary payloads flow through an actor-pool
    map_batches with small batches (memory-aware for wide binary)."""
    import ray.data

    ds = ray.data.from_arrow(_media_table(32))
    out = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"fake": True, "size": (8, 8)},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    ).to_pandas()
    assert len(out) == 32
    assert set(out.columns) >= {"media_id", "mean_r", "mean_g", "mean_b"}
