"""Multimodal column operators — binary payloads with typed metadata.

Images/audio/video are opaque `binary` columns plus metadata, processed by
actor-pool-shaped `map_batches` stages. Two kernel modes:

- ``fake=False`` (REAL, default where the payload is one of the formats the
  in-repo codecs cover): PNG decode/resize/features via the pure
  numpy+zlib codec in `ops.imagecodec` (8-bit grey/RGB/RGBA), WAV PCM
  decode via stdlib `wave`, and frame sampling over the length-prefixed
  `ANIM` PNG container. These are real computations with checksum-oracle
  tests (tests/test_multimodal.py) — not hash stubs.
- ``fake=True``: deterministic hash-derived results for arbitrary bytes —
  kept for plumbing/bench tests with non-decodable payloads, and as the
  honest stand-in for formats a production deployment would hand to
  Pillow/ffmpeg (JPEG, H.264, ... — no codecs for those in this sandbox).

Scale notes: binary payloads make rows wide — these stages run with SMALL
batch sizes (batch_size=32 default) so batch × concurrency stays within
worker heaps; blocks of binaries should be bounded via
DataContext.target_max_block_size at read time. Real codecs/models load
state once per actor when `concurrency` pins an actor pool.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

from nexus_forge_ray.ops import imagecodec as ic


def _hash_bytes(b: bytes) -> np.ndarray:
    return np.frombuffer(hashlib.sha256(b).digest(), dtype=np.uint8)


class ImageDecoder:
    """binary -> (width, height, mode) metadata (real PNG/BMP parse,
    container sniffed by magic bytes; fake=True only for unknown formats)."""

    def __init__(self, image_col: str = "image", fake: bool = False):
        self.image_col = image_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        if self.fake:
            h = np.stack([_hash_bytes(b) for b in batch[self.image_col]])
            batch["width"] = (16 + h[:, 0].astype(np.int64) % 2032)
            batch["height"] = (16 + h[:, 1].astype(np.int64) % 2032)
            batch["mode"] = np.where(h[:, 2] % 2 == 0, "RGB", "L")
            return batch
        dims = [ic.image_decode(b).shape for b in batch[self.image_col]]
        batch["width"] = np.array([d[1] for d in dims], dtype=np.int64)
        batch["height"] = np.array([d[0] for d in dims], dtype=np.int64)
        batch["mode"] = ["L" if len(d) == 2 else
                         {2: "LA", 3: "RGB", 4: "RGBA"}[d[2]] for d in dims]
        return batch


class ImageResizer:
    """Real resize: decode (PNG/BMP sniffed) -> nearest-neighbor ->
    re-encode PNG (the container normalizes on the way through)."""

    def __init__(self, width: int, height: int, image_col: str = "image",
                 fake: bool = False):
        self.w, self.h = width, height
        self.image_col = image_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        if not self.fake:
            batch[self.image_col] = [
                ic.png_encode(ic.resize_nearest(ic.image_decode(b),
                                                self.w, self.h))
                for b in batch[self.image_col]]
        batch["width"] = self.w
        batch["height"] = self.h
        return batch


class FeatureExtractor:
    """binary -> dense feature vector.

    Real path: PNG decode + mean-luminance grid descriptor (unit-norm).
    A heavier model would load once per actor in __init__ — this class is
    the actor-pool harness for it either way.
    """

    def __init__(self, dim: int = 16, payload_col: str = "image",
                 fake: bool = False):
        self.dim = dim
        self.payload_col = payload_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for b in batch[self.payload_col]:
            if self.fake:
                h = _hash_bytes(b)[: self.dim].astype(np.float32)
                n = np.linalg.norm(h)
                feats.append((h / n if n else h).tolist())
            else:
                feats.append(
                    ic.image_features(ic.image_decode(b), self.dim).tolist())
        batch = batch.copy()
        batch["embedding"] = feats
        return batch


class FrameSampler:
    """video binary -> one row per sampled frame (flat_map shape).

    Real path: parse the ANIM container, keep every `stride`-th frame up to
    `max_frames`, emit the frame's PNG bytes plus its decoded dimensions —
    sampling skips non-kept frames WITHOUT decoding them (the point of a
    length-prefixed container)."""

    def __init__(self, stride: int = 2, max_frames: int = 8,
                 video_col: str = "video", fake: bool = False,
                 every_n_bytes: int = 1 << 16):
        self.stride = max(1, stride)
        self.step = every_n_bytes          # fake-mode chunking only
        self.max_frames = max_frames
        self.video_col = video_col
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        keep = [k for k in batch.columns if k != self.video_col]
        for _, rec in batch.iterrows():
            payload = rec[self.video_col]
            base = {k: rec[k] for k in keep}
            if self.fake:
                n = min(self.max_frames, max(1, len(payload) // self.step))
                for i in range(n):
                    chunk = payload[i * self.step:(i + 1) * self.step]
                    rows.append({**base, "frame_index": i,
                                 "frame": hashlib.sha256(chunk).digest()})
                continue
            taken = 0
            for i, png in ic.anim_iter_frames(payload):
                if i % self.stride or taken >= self.max_frames:
                    continue
                img = ic.png_decode(png)
                rows.append({**base, "frame_index": i, "frame": png,
                             "frame_h": img.shape[0], "frame_w": img.shape[1]})
                taken += 1
        if rows:
            return pd.DataFrame(rows)
        cols = keep + ["frame_index", "frame"] \
            + ([] if self.fake else ["frame_h", "frame_w"])
        return pd.DataFrame({c: [] for c in cols})


class AudioDecoder:
    """WAV binary -> real per-clip features (rate, duration, rms, zcr, peak)
    via stdlib `wave` — PCM 8/16-bit mono/stereo."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = {"sample_rate": [], "duration_s": [], "rms": [], "zcr": [],
               "peak": []}
        for b in batch[self.audio_col]:
            x, rate = ic.wav_decode(b)
            f = ic.audio_features(x, rate)
            out["sample_rate"].append(rate)
            for k in ("duration_s", "rms", "zcr", "peak"):
                out[k].append(f[k])
        batch = batch.copy()
        for k, v in out.items():
            batch[k] = v
        return batch


class AudioSpectral:
    """WAV binary -> frequency-domain features (dominant_hz, centroid_hz,
    8 band-energy fractions) — one rfft per clip via
    `imagecodec.spectral_features`; real computation, gated by
    analytic-signal tests (a pure sine's dominant bin is its frequency)."""

    def __init__(self, audio_col: str = "audio", n_bands: int = 8):
        self.audio_col = audio_col
        self.n_bands = n_bands

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        dom, cen, bands = [], [], []
        for b in batch[self.audio_col]:
            x, rate = ic.wav_decode(b)
            f = ic.spectral_features(x, rate, n_bands=self.n_bands)
            dom.append(f["dominant_hz"])
            cen.append(f["centroid_hz"])
            bands.append(np.asarray(f["band_energy"], dtype=np.float32))
        batch = batch.copy()
        batch["dominant_hz"] = dom
        batch["centroid_hz"] = cen
        batch["band_energy"] = bands
        return batch


def _mm_stage(ds, cls, kwargs, concurrency, batch_size):
    """Task mode by default; pass concurrency for an actor pool when a real
    model/codec must load once per worker."""
    if concurrency is None:
        return ds.map_batches(cls(**kwargs), batch_format="pandas",
                              batch_size=batch_size)
    return ds.map_batches(cls, fn_constructor_kwargs=kwargs,
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


def decode_images(ds: ray.data.Dataset, *, image_col: str = "image",
                  concurrency: int | None = None, batch_size: int = 32,
                  fake: bool = False) -> ray.data.Dataset:
    return _mm_stage(ds, ImageDecoder, dict(image_col=image_col, fake=fake),
                     concurrency, batch_size)


def resize_images(ds: ray.data.Dataset, width: int, height: int, *,
                  image_col: str = "image", concurrency: int | None = None,
                  batch_size: int = 32, fake: bool = False) -> ray.data.Dataset:
    return _mm_stage(ds, ImageResizer,
                     dict(width=width, height=height, image_col=image_col,
                          fake=fake), concurrency, batch_size)


def extract_features(ds: ray.data.Dataset, *, dim: int = 16,
                     payload_col: str = "image",
                     concurrency: int | None = None,
                     batch_size: int = 32, fake: bool = False) -> ray.data.Dataset:
    return _mm_stage(ds, FeatureExtractor,
                     dict(dim=dim, fake=fake, payload_col=payload_col),
                     concurrency, batch_size)


def sample_frames(ds: ray.data.Dataset, *, video_col: str = "video",
                  concurrency: int | None = None, batch_size: int = 8,
                  fake: bool = False, stride: int = 2,
                  max_frames: int = 8) -> ray.data.Dataset:
    return _mm_stage(ds, FrameSampler,
                     dict(video_col=video_col, fake=fake, stride=stride,
                          max_frames=max_frames), concurrency, batch_size)


def decode_audio(ds: ray.data.Dataset, *, audio_col: str = "audio",
                 concurrency: int | None = None,
                 batch_size: int = 32) -> ray.data.Dataset:
    return _mm_stage(ds, AudioDecoder, dict(audio_col=audio_col),
                     concurrency, batch_size)


def audio_spectral(ds: ray.data.Dataset, *, audio_col: str = "audio",
                   n_bands: int = 8, concurrency: int | None = None,
                   batch_size: int = 32) -> ray.data.Dataset:
    return _mm_stage(ds, AudioSpectral,
                     dict(audio_col=audio_col, n_bands=n_bands),
                     concurrency, batch_size)
