"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is REAL in this sandbox for PNG images and RIFF/WAVE PCM16
audio via the stdlib-only codecs in :mod:`codecs` (RFC 2083 chunk
walk + zlib inflate + scanline unfiltering; wave + numpy PCM) — pass
``codecs.png_image_features`` / ``codecs.wav_audio_features`` /
``codecs.png_resize`` as the stage kernels. Only formats whose
codecs genuinely require external libraries (JPEG, MP3, H.264
containers) keep the declared ``NotImplementedError`` boundary; the
deterministic fakes below remain for plumbing-only tests. The
Ray-side shape is unchanged either way: schema conventions,
actor-pool stages, bounded batch sizes for large payloads.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

# convention: a multimodal column pair is (<name>: binary,
# <name>_meta: struct<mime: string, width/height or sample_rate ...>)
IMAGE_META_TYPE = pa.struct([
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])

AUDIO_META_TYPE = pa.struct([
    ("mime", pa.string()),
    ("sample_rate", pa.int32()),
    ("n_samples", pa.int64()),
])


def _missing_decoder(*_args, **_kwargs):
    raise NotImplementedError(
        "image/audio decode libraries are not available in this "
        "environment; pass a real decode_fn (e.g. PIL.Image.open) or "
        "use deterministic_fake_image_features for testing")


def deterministic_fake_image_features(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor: features
    derived from a hash of the payload bytes. Stable across runs."""
    import hashlib

    h = hashlib.blake2b(payload, digest_size=dim * 8 // 2).digest()
    raw = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
    return (raw % 1000) / 1000.0


class FeatureExtractor:
    """Actor-pool stage: model/codec loaded once per actor in
    ``__init__`` (the expensive part), batches decoded in ``__call__``.
    Use a small ``batch_size`` — payload bytes dominate memory."""

    def __init__(self, payload_column: str = "payload",
                 out_column: str = "features",
                 decode_fn: Optional[Callable] = None, dim: int = 16):
        self.payload_column = payload_column
        self.out_column = out_column
        # "model load" happens here, once per actor
        self.decode_fn = decode_fn or _missing_decoder
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch[self.payload_column].to_pylist():
            if payload is None:
                feats.append(None)
            else:
                feats.append(self.decode_fn(payload, self.dim).tolist())
        return batch.append_column(
            self.out_column, pa.array(feats, pa.list_(pa.float64())))


def deterministic_fake_resize(payload: bytes, width: int,
                              height: int) -> bytes:
    """Deterministic stand-in for a real image resize (PIL
    ``Image.resize``): output bytes derived from the payload hash,
    sized proportionally to the target raster. Stable across runs."""
    import hashlib

    n = max(1, (width * height) // 64)
    h = hashlib.blake2b(payload + f"{width}x{height}".encode(),
                        digest_size=32).digest()
    return (h * (n // 32 + 1))[:n]


class ImageResizer:
    """Actor-pool resize stage: decoder/codec state built once per
    actor; emits the resized payload plus refreshed metadata."""

    def __init__(self, width: int, height: int,
                 payload_column: str = "payload",
                 meta_column: str = "payload_meta",
                 resize_fn: Optional[Callable] = None):
        self.width = width
        self.height = height
        self.payload_column = payload_column
        self.meta_column = meta_column
        self.resize_fn = resize_fn or _missing_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.payload_column].to_pylist():
            out.append(None if payload is None
                       else self.resize_fn(payload, self.width,
                                           self.height))
        meta = pa.array(
            [None if p is None else
             {"mime": "image/raw", "width": self.width,
              "height": self.height}
             for p in out], IMAGE_META_TYPE)
        names = set(batch.column_names)
        for c in (self.payload_column, self.meta_column):
            if c in names:
                batch = batch.drop_columns([c])
        return batch.append_column(self.payload_column,
                                   pa.array(out, pa.binary())) \
                    .append_column(self.meta_column, meta)


def resize_images(ds, width: int, height: int,
                  payload_column: str = "payload",
                  resize_fn: Optional[Callable] = None,
                  batch_size: int = 64, concurrency: int = 4):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(width=width, height=height,
                                   payload_column=payload_column,
                                   resize_fn=resize_fn),
        batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True, concurrency=concurrency)


def deterministic_fake_frames(payload: bytes, every_n: int) -> list:
    """Deterministic stand-in for a real frame decoder (e.g.
    PyAV/ffmpeg keyframe sampling): the payload is treated as a
    sequence of fixed-size 'frames' and every n-th is kept."""
    frame_size = 16
    frames = [payload[i:i + frame_size]
              for i in range(0, len(payload), frame_size)]
    return frames[::every_n] if frames else []


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: one input
    row fans out to one row per sampled frame (frame_idx + bytes) —
    the flat_map shape a downstream per-frame model stage consumes."""

    def __init__(self, every_n: int = 10,
                 id_column: str = "doc_id",
                 payload_column: str = "payload",
                 sample_fn: Optional[Callable] = None):
        self.every_n = every_n
        self.id_column = id_column
        self.payload_column = payload_column
        self.sample_fn = sample_fn or _missing_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for vid, payload in zip(batch[self.id_column].to_pylist(),
                                batch[self.payload_column].to_pylist()):
            if payload is None:
                continue
            for fi, frame in enumerate(self.sample_fn(payload,
                                                      self.every_n)):
                ids.append(vid)
                idxs.append(fi)
                frames.append(frame)
        return pa.table({
            self.id_column: pa.array(ids),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def sample_frames(ds, every_n: int = 10, id_column: str = "doc_id",
                  payload_column: str = "payload",
                  sample_fn: Optional[Callable] = None,
                  batch_size: int = 16, concurrency: int = 4):
    """Small batches: video payloads dominate worker memory."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(every_n=every_n, id_column=id_column,
                                   payload_column=payload_column,
                                   sample_fn=sample_fn),
        batch_size=batch_size, batch_format="pyarrow",
        zero_copy_batch=True, concurrency=concurrency)


def extract_features(ds, payload_column: str = "payload",
                     out_column: str = "features",
                     decode_fn: Optional[Callable] = None,
                     dim: int = 16,
                     batch_size: int = 64,
                     concurrency: int = 4):
    """The canonical multimodal stage shape: actor pool + small
    batches + zero-copy binary payloads."""
    return ds.map_batches(
        FeatureExtractor,
        fn_constructor_kwargs=dict(payload_column=payload_column,
                                   out_column=out_column,
                                   decode_fn=decode_fn, dim=dim),
        batch_size=batch_size,
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
