"""Multimodal image operators over the pairs table.

Decode / resize / feature-extract as batch stages on the opaque ``binary``
column. Decode, block-mean resize, and color-histogram features are REAL
(backed by the minimal codecs in ``sources/images.py``); the model-embedding
step is a clearly marked STUB (no ML libs in this sandbox) whose Ray-side
plumbing — schema, batch shape, actor signature — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import images as im


def resize_block_mean(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic block-mean resize (no PIL needed)."""
    h, w, _ = pixels.shape
    ys = np.linspace(0, h, out_h + 1).astype(int)
    xs = np.linspace(0, w, out_w + 1).astype(int)
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    for i in range(out_h):
        for j in range(out_w):
            block = pixels[ys[i]: max(ys[i] + 1, ys[i + 1]), xs[j]: max(xs[j] + 1, xs[j + 1])]
            out[i, j] = block.reshape(-1, 3).mean(axis=0)
    return out


class DecodeResize:
    """pairs batch → decoded + resized thumbnails (actor-pool stage).

    Output: image_id, thumb (binary PNG, out_w×out_h), ok flag.
    """

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, thumbs, oks = [], [], []
        for image_id, data, fmt in zip(
            batch.column("image_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
        ):
            ids.append(image_id)
            try:
                pixels = im.decode_image(data, fmt)
                thumb = resize_block_mean(pixels, self.out_w, self.out_h)
                thumbs.append(im.encode_png(thumb))
                oks.append(True)
            except Exception:
                thumbs.append(b"")
                oks.append(False)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "thumb": pa.array(thumbs, pa.binary()),
                "ok": pa.array(oks, pa.bool_()),
            }
        )


class ColorHistogram:
    """pairs batch → 48-dim color histogram features (16 bins × RGB)."""

    def __init__(self, bins: int = 16):
        self.bins = bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats = [], []
        edges = np.linspace(0, 256, self.bins + 1)
        for image_id, data, fmt in zip(
            batch.column("image_id").to_pylist(),
            batch.column("bytes").to_pylist(),
            batch.column("fmt").to_pylist(),
        ):
            try:
                pixels = im.decode_image(data, fmt).reshape(-1, 3)
            except Exception:
                continue
            hist = np.concatenate(
                [np.histogram(pixels[:, c], bins=edges)[0] for c in range(3)]
            ).astype(np.float32)
            hist /= max(1.0, hist.sum())
            ids.append(image_id)
            feats.append(hist.tolist())
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class ModelEmbed:
    """STUB: batched model inference over decoded images.

    The image-embedding model is unavailable in this sandbox; calling this
    stage raises unless ``fake=True``, which produces a deterministic
    pseudo-embedding (phash bits) so downstream plumbing (ANN, near-dup)
    can be exercised end-to-end.
    """

    def __init__(self, model_path: str | None = None, fake: bool = False, dim: int = 64):
        self.fake = fake
        self.dim = dim
        if not fake:
            raise NotImplementedError(
                "image embedding models are not available in this environment; "
                "construct with fake=True for deterministic plumbing tests"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, embs = [], []
        for image_id, ph in zip(
            batch.column("image_id").to_pylist(), batch.column("phash").to_pylist()
        ):
            bits = np.unpackbits(
                np.frombuffer(np.uint64(np.int64(ph)).tobytes(), dtype=np.uint8)
            ).astype(np.float32)
            emb = np.tile(bits * 2 - 1, self.dim // 64 or 1)[: self.dim]
            ids.append(image_id)
            embs.append(emb.tolist())
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "embedding": pa.array(embs, pa.list_(pa.float32())),
            }
        )
