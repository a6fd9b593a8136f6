"""Audio/video container codecs — dependency-free, deterministic.

The multimodal columns of a training-data pipeline are opaque ``binary``
payloads with typed metadata; this module supplies REAL (not stubbed)
decoders for two self-describing containers so the Ray-side plumbing can be
exercised end to end with exact round-trip tests:

* WAV / RIFF PCM (the actual public format: 44-byte canonical header,
  16-bit little-endian samples) — ``encode_wav`` / ``decode_wav``.
* A trivial frame-sequence video container (our own format — magic
  ``AKFV``, frame count + dims, then raw BMP frames back to back) —
  ``encode_framevideo`` / ``decode_framevideo`` reusing the from-scratch
  BMP codec in ``sources/images.py``.

Real-world codecs (mp3/h264/…) need libraries absent from this sandbox;
swapping the per-payload decode function is the only change required —
the batch/actor plumbing in ``stages/av_ops.py`` stays identical.
"""

from __future__ import annotations

import struct

import numpy as np

from .images import decode_bmp, encode_bmp

# ---------------------------------------------------------------------------
# WAV (RIFF PCM s16le, mono or interleaved channels)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, channels: int = 1) -> bytes:
    """int16 samples (frames × channels interleaved) → canonical WAV bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                byte_rate, block_align, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 samples [frames, channels], sample_rate, channels).
    Walks RIFF chunks (fmt may be followed by LIST/fact before data)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8: pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding {fmt_code}/{bits}bit")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if samples is None or channels is None:
        raise ValueError("missing fmt/data chunk")
    return samples.reshape(-1, channels), sample_rate, channels


def synth_wav(seed: int, seconds: float = 0.5, sample_rate: int = 16000) -> bytes:
    """Deterministic test tone: sine + seeded noise, amplitude-enveloped."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    freq = 200.0 + (seed % 17) * 60.0
    wave = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.standard_normal(n)
    wave *= np.minimum(1.0, 10.0 * t)  # attack envelope
    return encode_wav((np.clip(wave, -1, 1) * 32767).astype("<i2"), sample_rate)


# ---------------------------------------------------------------------------
# frame-sequence video (AKFV: magic, n_frames, w, h, then BMP frames)
# ---------------------------------------------------------------------------

_V_MAGIC = b"AKFV"


def encode_framevideo(frames: list[np.ndarray]) -> bytes:
    """List of HxWx3 RGB frames → container bytes."""
    assert frames
    h, w, _c = frames[0].shape
    out = [_V_MAGIC + struct.pack("<III", len(frames), w, h)]
    for f in frames:
        assert f.shape == (h, w, 3)
        bmp = encode_bmp(f)
        out.append(struct.pack("<I", len(bmp)) + bmp)
    return b"".join(out)


def decode_framevideo(data: bytes, every_k: int = 1) -> list[np.ndarray]:
    """Container bytes → every k-th frame decoded (frame SAMPLING decodes
    only the selected frames — the whole point of the sampled read)."""
    if data[:4] != _V_MAGIC:
        raise ValueError("not an AKFV stream")
    n_frames, _w, _h = struct.unpack_from("<III", data, 4)
    pos = 16
    out = []
    for idx in range(n_frames):
        size = struct.unpack_from("<I", data, pos)[0]
        if idx % every_k == 0:
            out.append(decode_bmp(data[pos + 4: pos + 4 + size]))
        pos += 4 + size
    return out


def synth_framevideo(seed: int, n_frames: int = 12, w: int = 32, h: int = 24) -> bytes:
    """Deterministic moving-gradient clip (RGB)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
    frames = []
    for k in range(n_frames):
        f = np.roll(base, shift=k, axis=1).astype(np.int32) + 4 * k
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return encode_framevideo(frames)
