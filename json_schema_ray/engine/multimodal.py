"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBS — the image/audio libraries
are not available in this environment — but the Ray-side plumbing is
real and tested: schema conventions, actor-pool stage shape, bounded
batch sizes for large payloads, and deterministic fake decoders used
by the tests. Swap ``decode_fn`` for a real PIL/torchaudio call in a
full environment.
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
