"""Multimodal columns: image/audio/video as opaque Arrow binary.

The container has no image/audio codecs, so the decode kernels are
STUBS with the real Ray-side plumbing (schema, batch shape, actor-pool
signature, output layout) implemented and tested:

- payloads travel as ``binary`` columns with typed metadata columns
  (``media_type``, ``n_bytes``, ``digest``)
- decode / resize / frame-sample stages are actor-pool ``map_batches``
  classes whose ``__init__`` would load the codec once per actor
- ``DeterministicFakeDecoder`` stands in for the codec in tests: it
  produces a seeded, shape-correct uint8 tensor from the payload hash,
  so downstream feature stages are exercised end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # image/jpeg, audio/wav, ...
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
        ("digest", pa.string()),
    ]
)


def attach_payload_metadata(batch: pa.Table) -> pa.Table:
    """Stateless map_batches body: add (n_bytes, digest) to payloads."""
    payloads = batch.column("payload").to_pylist()
    return batch.append_column(
        "n_bytes", pa.array([len(b) for b in payloads], pa.int64())
    ).append_column(
        "digest",
        pa.array(
            [hashlib.sha256(b).hexdigest() for b in payloads], pa.string()
        ),
    )


class ImageDecodeStage:
    """Actor-pool stage: decode image payloads → (h, w, c) uint8.

    BMP (24-bit BI_RGB) and PPM (P6) payloads decode for REAL via the
    pure-numpy codecs in functions/codecs.py — no library needed.
    Compressed formats (JPEG/PNG/...) require a codec absent from this
    container: construct with ``fake=True`` (tests) to substitute the
    deterministic stand-in for them, else they raise
    NotImplementedError at decode time. Keep ``batch_size`` small for
    wide binary payloads (see ray_guide: memory-aware batch sizing).
    """

    def __init__(self, *, fake: bool = False, size: tuple[int, int] = (32, 32)):
        self.size = size
        self.fake = fake

    def _decode_one(self, payload: bytes) -> np.ndarray:
        from ..functions.codecs import (
            decode_bmp,
            decode_pbm,
            decode_pgm,
            decode_ppm,
            sniff_format,
        )

        kind = sniff_format(payload)
        if kind == "bmp":
            return decode_bmp(payload)
        if kind == "ppm":
            return decode_ppm(payload)
        if kind in ("pgm", "pbm"):
            gray = decode_pgm(payload) if kind == "pgm" else decode_pbm(payload)
            return np.repeat(gray[:, :, None], 3, axis=2)  # gray -> RGB
        if not self.fake:
            raise NotImplementedError(
                "only BMP/PPM/PGM/PBM decode codec-free; this payload "
                "needs an image library (PIL/cv2) not present in this "
                "environment — pass fake=True for the deterministic "
                "stand-in"
            )
        h, w = self.size
        seed = int.from_bytes(
            hashlib.sha256(payload).digest()[:8], "big"
        ) % (2**32)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors = [
            self._decode_one(b) for b in batch.column("payload").to_pylist()
        ]
        feats = np.stack([t.mean(axis=(0, 1)) for t in tensors])  # per-channel mean
        return pa.table(
            {
                "media_id": batch["media_id"],
                "height": pa.array(
                    [t.shape[0] for t in tensors], pa.int32()
                ),
                "width": pa.array(
                    [t.shape[1] for t in tensors], pa.int32()
                ),
                "mean_r": pa.array(feats[:, 0], pa.float64()),
                "mean_g": pa.array(feats[:, 1], pa.float64()),
                "mean_b": pa.array(feats[:, 2], pa.float64()),
            }
        )


class ImageResizeStage:
    """Actor-pool stage: resize decoded (h, w, 3) uint8 tensors with
    vectorized nearest-neighbor sampling. Operates on the output layout
    of ImageDecodeStage (tensors re-decoded from payload via the same
    deterministic fake when codecs are absent); a real deployment would
    fuse decode+resize in one actor to avoid re-materializing tensors.
    Small ``batch_size`` required for wide binary payloads."""

    def __init__(self, *, fake: bool = False,
                 in_size: tuple[int, int] = (32, 32),
                 out_size: tuple[int, int] = (8, 8)):
        self.in_size = in_size
        self.out_size = out_size
        self._decoder = ImageDecodeStage(fake=fake, size=in_size)

    def _resize_one(self, t: np.ndarray) -> np.ndarray:
        oh, ow = self.out_size
        h, w = t.shape[:2]
        ri = (np.arange(oh) * h) // oh
        ci = (np.arange(ow) * w) // ow
        return t[ri][:, ci]

    def __call__(self, batch: pa.Table) -> pa.Table:
        tensors = [
            self._resize_one(self._decoder._decode_one(b))
            for b in batch.column("payload").to_pylist()
        ]
        flat = np.stack(tensors).reshape(len(tensors), -1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "height": pa.array(
                    [self.out_size[0]] * len(tensors), pa.int32()
                ),
                "width": pa.array(
                    [self.out_size[1]] * len(tensors), pa.int32()
                ),
                "pixels": pa.array(
                    [row.tobytes() for row in flat], pa.binary()
                ),
            }
        )


class AudioFrameSampleStage:
    """Actor-pool stage: sample N fixed-offset frames from audio
    payloads. WAV (PCM16) payloads decode for REAL via the pure-numpy
    codec — frames are raw PCM sample windows; other formats need a
    codec (pass ``fake=True`` to slice raw bytes deterministically
    instead)."""

    def __init__(self, *, fake: bool = False, num_frames: int = 4,
                 frame_bytes: int = 256):
        self.num_frames = num_frames
        self.frame_bytes = frame_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import decode_wav, sniff_format

        ids, frame_idx, frames = [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if sniff_format(payload) == "wav":
                samples, _rate = decode_wav(payload)
                pcm = samples.tobytes()
            elif self.fake:
                pcm = payload
            else:
                raise NotImplementedError(
                    "only WAV/PCM16 decodes codec-free; pass fake=True "
                    "for the deterministic byte-slice stand-in"
                )
            n = max(1, len(pcm))
            for f in range(self.num_frames):
                off = (f * n) // self.num_frames
                frames.append(pcm[off : off + self.frame_bytes])
                ids.append(mid)
                frame_idx.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )
