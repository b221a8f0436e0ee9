"""Pure-numpy codecs for uncompressed media formats.

The container ships no image/audio libraries, but uncompressed formats
need none: BMP (24-bit BI_RGB), the netpbm family (PPM P6 / PGM P5 /
PBM P4) and WAV (PCM16) are plain headers over raw sample arrays. These decoders make the
multimodal stages' default path REAL for those formats — the
deterministic fake remains only for compressed formats (JPEG/MP3/...)
whose codecs are genuinely absent.

All functions are vectorized over the payload body (np.frombuffer —
zero-copy views over the bytes); only header parsing is scalar.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_format(payload: bytes) -> str | None:
    """Magic-byte detection for the supported uncompressed formats."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"P4":
        return "pbm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def _netpbm_header(
    payload: bytes, magic: bytes, n_tokens: int
) -> tuple[list[int], int]:
    """Parse an ASCII netpbm header (``#`` comments allowed): returns
    (tokens, offset of the raster after the single whitespace byte)."""
    if payload[:2] != magic:
        raise ValueError(f"not a {magic.decode()} payload")
    pos, tokens = 2, []
    while len(tokens) < n_tokens:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    return tokens, pos + 1  # skip the single whitespace after the header


# -- BMP (Windows V3, 24-bit uncompressed) ----------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB. Rows are stored
    bottom-up and padded to 4 bytes; pixels are BGR on disk."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", payload, 14)[:3]
    h_raw = struct.unpack_from("<i", payload, 22)[0]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}); "
            "only 24-bit BI_RGB is codec-free"
        )
    top_down = h_raw < 0
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) & ~3
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    img = raw[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR -> RGB, contiguous


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes (test fixture /
    sink path)."""
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    data_size = row_bytes * h
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + data_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


# -- PPM (P6 binary, maxval <= 255) -----------------------------------------


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM → (h, w, 3) uint8 RGB. Header is ASCII tokens (with
    ``#`` comments) followed by a single whitespace byte, then raw
    RGB triplets."""
    (w, h, maxval), pos = _netpbm_header(payload, b"P6", 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


# -- PGM (P5 binary grayscale, maxval <= 255) -------------------------------


def decode_pgm(payload: bytes) -> np.ndarray:
    """P5 PGM → (h, w) uint8 grayscale."""
    (w, h, maxval), pos = _netpbm_header(payload, b"P5", 3)
    if maxval > 255:
        raise ValueError("16-bit PGM not supported")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=pos)
        .reshape(h, w)
        .copy()
    )


def encode_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


# -- PBM (P4 binary bitmap, 1 bit/pixel, MSB first, row-padded) -------------


def decode_pbm(payload: bytes) -> np.ndarray:
    """P4 PBM → (h, w) uint8 in {0, 255}. On disk 1 = black; rows pad
    to whole bytes, MSB-first — one vectorized unpackbits per image."""
    (w, h), pos = _netpbm_header(payload, b"P4", 2)
    row_bytes = (w + 7) // 8
    raw = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=pos
    ).reshape(h, row_bytes)
    bits = np.unpackbits(raw, axis=1)[:, :w]  # MSB-first per byte
    return np.where(bits == 1, 0, 255).astype(np.uint8)  # 1=black


def encode_pbm(img: np.ndarray) -> bytes:
    """(h, w) array (0 = black, nonzero = white, matching decode_pbm's
    output convention) → P4 bytes."""
    h, w = img.shape
    bits = (img == 0).astype(np.uint8)  # black -> 1
    packed = np.packbits(bits, axis=1)  # pads rows to whole bytes
    return f"P4\n{w} {h}\n".encode() + packed.tobytes()


# -- WAV (RIFF, PCM 16-bit) -------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → ((n_samples, channels) int16, sample_rate).
    Walks the chunk list (fmt may not directly precede data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = (pos + 8, size)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only PCM16 is codec-free"
        )
    off, size = data
    samples = np.frombuffer(
        payload, dtype="<i2", count=size // 2, offset=off
    )
    return samples.reshape(-1, channels).copy(), sample_rate


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(body), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(body))
        + body
    )
