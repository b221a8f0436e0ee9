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
    """Compressed formats still need a codec: without fake=True the
    stage raises at decode time (BMP/PPM/WAV decode for real)."""
    with pytest.raises(NotImplementedError):
        ImageDecodeStage()(_media_table())  # payloads are fake JPEG
    with pytest.raises(NotImplementedError):
        AudioFrameSampleStage()(_media_table())


def test_bmp_roundtrip_decodes_for_real():
    from raycrawl.functions.codecs import decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()
    # odd width exercises the 4-byte row padding
    img2 = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img2)) == img2).all()


def test_ppm_roundtrip_and_comments():
    from raycrawl.functions.codecs import decode_ppm, encode_ppm

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    with_comment = (
        b"P6\n# a comment\n6 4\n255\n" + img.astype(np.uint8).tobytes()
    )
    assert (decode_ppm(with_comment) == img).all()


def test_pgm_roundtrip_and_comments():
    from raycrawl.functions.codecs import decode_pgm, encode_pgm

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert (decode_pgm(encode_pgm(img)) == img).all()
    with_comment = b"P5\n# gray\n6 4\n255\n" + img.tobytes()
    assert (decode_pgm(with_comment) == img).all()


def test_pbm_roundtrip_bit_packing():
    from raycrawl.functions.codecs import decode_pbm, encode_pbm

    rng = np.random.default_rng(10)
    # w=11 exercises the row padding to whole bytes (MSB-first)
    img = rng.choice([0, 255], size=(5, 11)).astype(np.uint8)
    assert (decode_pbm(encode_pbm(img)) == img).all()
    # explicit fixture: one row "10110000 011xxxxx" => pixels 1,3,4,9,10 black
    raw = b"P4\n11 1\n" + bytes([0b10110000, 0b01100000])
    got = decode_pbm(raw)
    want = np.full((1, 11), 255, dtype=np.uint8)
    want[0, [0, 2, 3, 9, 10]] = 0
    assert (got == want).all()


def test_image_decode_stage_gray_formats():
    from raycrawl.functions.codecs import encode_pbm, encode_pgm
    from raycrawl.stages.multimodal import ImageDecodeStage

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    bw = rng.choice([0, 255], size=(4, 5)).astype(np.uint8)
    stage = ImageDecodeStage()
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array(
                [encode_pgm(gray), encode_pbm(bw)], pa.binary()
            ),
        }
    )
    out = stage(t)
    assert out.column("height").to_pylist() == [4, 4]
    assert out.column("width").to_pylist() == [5, 5]
    # grayscale replicates to RGB: channel means equal the gray mean
    assert out.column("mean_r").to_pylist() == pytest.approx(
        [gray.mean(), bw.mean()]
    )
    assert out.column("mean_r").to_pylist() == out.column("mean_g").to_pylist()


def test_wav_roundtrip_stereo():
    from raycrawl.functions.codecs import decode_wav, encode_wav

    rng = np.random.default_rng(9)
    samples = rng.integers(-32768, 32767, size=(100, 2), dtype=np.int16)
    got, rate = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000
    assert (got == samples).all()


def test_image_decode_stage_real_bmp_ppm():
    """The DEFAULT stage path (no fake) decodes real BMP/PPM payloads
    and reports true per-image dimensions + channel means."""
    from raycrawl.functions.codecs import encode_bmp, encode_ppm

    img_a = np.zeros((4, 4, 3), dtype=np.uint8)
    img_a[..., 0] = 200  # pure red-ish
    img_b = np.full((2, 8, 3), 10, dtype=np.uint8)
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "media_type": pa.array(["image/bmp", "image/x-ppm"]),
            "payload": pa.array(
                [encode_bmp(img_a), encode_ppm(img_b)], pa.binary()
            ),
        }
    )
    out = ImageDecodeStage()(t)
    assert out.column("height").to_pylist() == [4, 2]
    assert out.column("width").to_pylist() == [4, 8]
    assert out.column("mean_r").to_pylist() == [200.0, 10.0]
    assert out.column("mean_g").to_pylist() == [0.0, 10.0]


def test_audio_stage_real_wav_frames():
    from raycrawl.functions.codecs import encode_wav

    samples = np.arange(512, dtype=np.int16).reshape(-1, 1)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "media_type": pa.array(["audio/wav"]),
            "payload": pa.array([encode_wav(samples)], pa.binary()),
        }
    )
    out = AudioFrameSampleStage(num_frames=4, frame_bytes=16)(t)
    assert out.num_rows == 4
    first = out.column("frame_payload").to_pylist()[0]
    # frame 0 is the first 16 bytes of the raw PCM stream
    assert np.frombuffer(first, dtype="<i2").tolist() == list(range(8))


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
