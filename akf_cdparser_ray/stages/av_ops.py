"""Audio/video batch stages (the multimodal half of the training-data
pipeline, alongside stages/image_ops.py).

Payloads are opaque ``binary`` columns with typed metadata; each stage is a
callable CLASS for ``map_batches(Cls, concurrency=N, batch_size=B)`` —
setup once per actor, vectorized work per batch. Large payloads ⇒ keep
``batch_size`` small and never let the binary columns enter a shuffle:
these stages reduce payloads to small feature rows in place.

The decoders are real (sources/av.py: RIFF/WAV PCM, AKFV frame sequence);
swapping in mp3/h264 decoders changes only the per-payload function.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.av import decode_framevideo, decode_wav
from ..sources.images import phash64


class AudioFeatures:
    """(audio_id, bytes) batch → per-clip features: duration, RMS energy,
    zero-crossing rate, peak amplitude, dominant-band index (argmax of an
    8-band folded spectrum via rFFT). Window size is actor state."""

    def __init__(self, n_bands: int = 8):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, durs, rmss, zcrs, peaks, bands = [], [], [], [], [], []
        for aid, blob in zip(
            batch.column("audio_id").to_pylist(), batch.column("bytes").to_pylist()
        ):
            samples, rate, _ch = decode_wav(blob)
            x = samples[:, 0].astype(np.float64) / 32768.0
            ids.append(aid)
            durs.append(len(x) / rate)
            rmss.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcrs.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                        if len(x) > 1 else 0.0)
            peaks.append(float(np.max(np.abs(x))) if len(x) else 0.0)
            spec = np.abs(np.fft.rfft(x))
            if len(spec) >= self.n_bands:
                folded = spec[: len(spec) // self.n_bands * self.n_bands].reshape(
                    self.n_bands, -1
                ).sum(axis=1)
                bands.append(int(np.argmax(folded)))
            else:
                bands.append(0)
        return pa.table({
            "audio_id": pa.array(ids, pa.string()),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rmss, pa.float64()),
            "zcr": pa.array(zcrs, pa.float64()),
            "peak": pa.array(peaks, pa.float64()),
            "dominant_band": pa.array(bands, pa.int32()),
        })


class FrameSample:
    """(video_id, bytes) batch → one row per SAMPLED frame (every k-th):
    (video_id, frame_idx, w, h, mean_luma, frame_phash). Only the sampled
    frames are decoded — the container index is walked, not transcoded."""

    def __init__(self, every_k: int = 4):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, ws, hs, lumas, phs = [], [], [], [], [], []
        for vid, blob in zip(
            batch.column("video_id").to_pylist(), batch.column("bytes").to_pylist()
        ):
            frames = decode_framevideo(blob, every_k=self.every_k)
            for n, frame in enumerate(frames):
                vids.append(vid)
                idxs.append(n * self.every_k)
                hs.append(frame.shape[0])
                ws.append(frame.shape[1])
                lumas.append(float(frame.mean()))
                phs.append(phash64(frame))
        return pa.table({
            "video_id": pa.array(vids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "mean_luma": pa.array(lumas, pa.float64()),
            "frame_phash": pa.array(phs, pa.int64()),
        })
