"""Multimodal column plumbing — opaque ``binary`` payload columns with typed
metadata, decoded / feature-extracted by actor-pool stages.

The image/audio codecs are NOT in this environment, so the decode kernel is a
clearly-marked stub: ``DecodeStub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature vector
(md5-derived) — the Ray-side plumbing (schema, small batches for fat rows,
actor signature, output layout) is real and tested.

Scale notes: binary payloads make rows fat — callers should use small
``batch_size`` (64-512) and let ``target_max_block_size`` keep blocks sane;
the payload column is dropped immediately after feature extraction so it
never rides through a shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)

FEATURE_DIM = 4


def docs_to_media(batch: pa.Table) -> pa.Table:
    """Synthesize a binary media table from documents (utf-8 payload stand-in):
    deterministic, lets the decode plumbing be exercised without codecs."""
    texts = batch.column("text").to_pylist()
    payloads = [(t or "").encode("utf-8") for t in texts]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array(["image"] * len(texts), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array([len(p) for p in payloads], pa.int64()),
        ],
        names=list(MEDIA_SCHEMA.names),
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    Real deployments replace ``_decode`` with a codec call (PIL/librosa/
    ffmpeg); here ``fake=True`` produces a deterministic md5-derived feature
    vector so downstream layout and tests are real.
    """

    def __init__(self, fake: bool = True) -> None:
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct DecodeStub(fake=True) for the deterministic stub"
            )
        h = hashlib.md5(payload).digest()
        return np.frombuffer(h[: FEATURE_DIM * 4], dtype="<u4").astype(np.float64) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._decode(p or b"") for p in payloads])
        return pa.Table.from_arrays(
            [
                batch.column("media_id"),
                batch.column("media_type"),
                batch.column("n_bytes"),
                pa.array(list(feats), pa.list_(pa.float64())),
            ],
            names=["media_id", "media_type", "n_bytes", "features"],
        )


def extract_media_features(
    media: "ray.data.Dataset", *, batch_size: int = 256, fake: bool = True
) -> "ray.data.Dataset":
    """Binary-payload feature extraction: actor pool, small batches (fat rows),
    payload column dropped at the stage boundary."""
    return media.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
    )
