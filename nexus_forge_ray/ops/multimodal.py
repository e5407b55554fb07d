"""Multimodal column operators — binary payloads with typed metadata.

Images/audio/video are opaque `binary` columns plus metadata. The decode /
resize / feature-extract / frame-sample kernels are STUBBED (no image/audio
libraries in this environment): with `fake=True` (default for tests/bench)
each stage produces a deterministic hash-derived result so the Ray-side
plumbing — schema, actor-pool signature, batch sizing, output layout — is
real and testable; with `fake=False` they raise NotImplementedError at the
exact point a real codec (Pillow/ffmpeg/torchvision) would be called.

Scale notes: binary payloads make rows wide — these stages are actor pools
with SMALL batch sizes (batch_size=32 default) so batch × concurrency stays
within worker heaps; blocks of binaries should be bounded via
DataContext.target_max_block_size at read time.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


def _hash_bytes(b: bytes) -> np.ndarray:
    return np.frombuffer(hashlib.sha256(b).digest(), dtype=np.uint8)


class ImageDecoder:
    """binary -> (width, height, mode) metadata + decoded flag."""

    def __init__(self, image_col: str = "image", fake: bool = True):
        self.image_col = image_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires Pillow; run with fake=True")
        h = np.stack([_hash_bytes(b) for b in batch[self.image_col]])
        batch = batch.copy()
        batch["width"] = (16 + h[:, 0].astype(np.int64) % 2032)
        batch["height"] = (16 + h[:, 1].astype(np.int64) % 2032)
        batch["mode"] = np.where(h[:, 2] % 2 == 0, "RGB", "L")
        return batch


class ImageResizer:
    """Resize stub: records target dims; payload untouched (deterministic)."""

    def __init__(self, width: int, height: int, image_col: str = "image",
                 fake: bool = True):
        self.w, self.h = width, height
        self.image_col = image_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError("real resize requires Pillow")
        batch = batch.copy()
        batch["width"] = self.w
        batch["height"] = self.h
        return batch


class FeatureExtractor:
    """binary -> dense feature vector (fake: hash-derived, unit-normalized).

    The real version would hold a vision/audio model loaded ONCE per actor in
    __init__ — this class is the actor-pool harness for it.
    """

    def __init__(self, dim: int = 16, payload_col: str = "image",
                 fake: bool = True):
        self.dim = dim
        self.payload_col = payload_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError("real features require a model runtime")
        feats = []
        for b in batch[self.payload_col]:
            h = _hash_bytes(b)[: self.dim].astype(np.float32)
            n = np.linalg.norm(h)
            feats.append((h / n if n else h).tolist())
        batch = batch.copy()
        batch["embedding"] = feats
        return batch


class FrameSampler:
    """video binary -> one row per sampled frame offset (flat_map shape)."""

    def __init__(self, every_n_bytes: int = 1 << 16, max_frames: int = 8,
                 video_col: str = "video", fake: bool = True):
        self.step = every_n_bytes
        self.max_frames = max_frames
        self.video_col = video_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.fake:
            raise NotImplementedError("real frame sampling requires ffmpeg")
        rows = []
        for _, rec in batch.iterrows():
            payload = rec[self.video_col]
            n = min(self.max_frames, max(1, len(payload) // self.step))
            for i in range(n):
                chunk = payload[i * self.step:(i + 1) * self.step]
                rows.append({**{k: rec[k] for k in batch.columns
                                if k != self.video_col},
                             "frame_index": i,
                             "frame": hashlib.sha256(chunk).digest()})
        return pd.DataFrame(rows) if rows else pd.DataFrame(
            {c: [] for c in list(batch.columns.drop(self.video_col))
             + ["frame_index", "frame"]})


def _mm_stage(ds, cls, kwargs, concurrency, batch_size):
    """Task mode by default (fake kernels are stateless); pass concurrency for
    an actor pool when a real model/codec must load once per worker."""
    if concurrency is None:
        return ds.map_batches(cls(**kwargs), batch_format="pandas",
                              batch_size=batch_size)
    return ds.map_batches(cls, fn_constructor_kwargs=kwargs,
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def decode_images(ds: ray.data.Dataset, *, image_col: str = "image",
                  concurrency: int | None = None, batch_size: int = 32,
                  fake: bool = True) -> ray.data.Dataset:
    return _mm_stage(ds, ImageDecoder, dict(image_col=image_col, fake=fake),
                     concurrency, batch_size)


def extract_features(ds: ray.data.Dataset, *, dim: int = 16,
                     payload_col: str = "image",
                     concurrency: int | None = None,
                     batch_size: int = 32, fake: bool = True) -> ray.data.Dataset:
    return _mm_stage(ds, FeatureExtractor,
                     dict(dim=dim, fake=fake, payload_col=payload_col),
                     concurrency, batch_size)


def sample_frames(ds: ray.data.Dataset, *, video_col: str = "video",
                  concurrency: int | None = None, batch_size: int = 8,
                  fake: bool = True) -> ray.data.Dataset:
    return _mm_stage(ds, FrameSampler, dict(video_col=video_col, fake=fake),
                     concurrency, batch_size)
