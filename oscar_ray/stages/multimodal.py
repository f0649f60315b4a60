"""Multimodal (image/audio/video) column stages — Ray plumbing real, codecs stubbed.

Media rides as opaque ``binary`` columns with typed metadata, exactly how
``html: binary`` rides in the pages schema. Decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages: heavy codec
state loads once per actor, batches stay small because payload rows are
large (set ``batch_size`` accordingly and keep ``batch_format="pyarrow"``
— binary columns do not survive pandas round-trips cleanly).

The image/audio libraries are not in this container, so the codec calls
are STUBBED: ``decoder="fake"`` produces deterministic pseudo-features
from the payload bytes (so schemas/plumbing are testable end-to-end);
``decoder="real"`` raises NotImplementedError where Pillow/ffmpeg would
be invoked.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class ImageFeatureStage:
    """Actor-pool stage: binary image -> fixed-dim feature vector.

    Output schema: (id, feature: list<float32>[dim], width, height).
    ``decoder="fake"``: deterministic features = normalized bytes of
    blake2b(payload) expanded to ``dim``; width/height parsed as fake
    constants. ``decoder="real"``: NotImplementedError (no Pillow here).
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        media_col: str = "media",
        dim: int = 64,
        decoder: str = "fake",
    ):
        self.id_col, self.media_col, self.dim = id_col, media_col, dim
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        # real path would load the model/codec ONCE here (per actor):
        # self.model = load_feature_extractor(...)

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "real":
            raise NotImplementedError(
                "real image decode requires Pillow/libjpeg (not in this container)"
            )
        # deterministic fake: stretch a 32-byte digest to dim floats in [0,1)
        dig = hashlib.blake2b(payload or b"", digest_size=32).digest()
        reps = (self.dim * 4 + len(dig) - 1) // len(dig)
        raw = (dig * reps)[: self.dim * 4]
        return (
            np.frombuffer(raw, dtype=np.uint32).astype(np.float32) / np.float32(2**32)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch[self.media_col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
                "width": pa.array([0] * len(batch), type=pa.int32()),
                "height": pa.array([0] * len(batch), type=pa.int32()),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: binary video -> N sampled frame payloads (flat rows).

    Output: (id, frame_index, frame: binary). Fake decoder slices the
    payload deterministically; real decoder would shell to ffmpeg once
    per actor-held handle.
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        media_col: str = "media",
        n_frames: int = 4,
        decoder: str = "fake",
    ):
        self.id_col, self.media_col, self.n_frames = id_col, media_col, n_frames
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError("real video decode requires ffmpeg")
        ids, fidx, frames = [], [], []
        for i, payload in enumerate(batch[self.media_col].to_pylist()):
            payload = payload or b""
            step = max(1, len(payload) // self.n_frames)
            for f in range(self.n_frames):
                ids.append(batch[self.id_col][i].as_py())
                fidx.append(f)
                frames.append(payload[f * step : (f + 1) * step])
        return pa.table(
            {
                self.id_col: pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(fidx, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )
