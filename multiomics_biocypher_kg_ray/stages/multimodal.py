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
        # stub state rebuilds in ms; max_restarts=0 avoids Ray's
        # constructor-args-in-object-store restart warning (core_worker.cc)
        max_restarts=0,
    )


EMBED_DIM = 8


class MediaEmbedder:
    """Batched 'model inference' actor: payload → fixed-dim embedding.

    The kernel is a deterministic md5-derived stand-in (dims = ascii codes of
    the digest's first hex chars) chosen to be EXACTLY reproducible in the
    DuckDB oracle — the Ray side (actor pool, small batches for fat rows,
    payload dropped at the boundary, embedding rendered hash-stable) is the
    production shape for a real encoder."""

    def __init__(self, dim: int = EMBED_DIM) -> None:
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        embs = [
            "|".join(
                str(ord(c)) for c in hashlib.md5(p or b"").hexdigest()[: self.dim]
            )
            for p in payloads
        ]
        return pa.Table.from_arrays(
            [batch.column("media_id"), pa.array(embs, pa.string())],
            names=["media_id", "emb"],
        )


def media_embed(
    media: "ray.data.Dataset", *, batch_size: int = 256, dim: int = EMBED_DIM
) -> "ray.data.Dataset":
    """Actor-pool batched embedding over binary payloads (ST5 model-scorer
    shape): (media_id, emb) with emb rendered as a '|'-joined dim string."""
    return media.map_batches(
        MediaEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
        # stub state rebuilds in ms; max_restarts=0 avoids Ray's
        # constructor-args-in-object-store restart warning (core_worker.cc)
        max_restarts=0,
    )


def frame_sample(
    media: "ray.data.Dataset", k: int = 4
) -> "ray.data.Dataset":
    """Deterministic frame sampling for 'video'-shaped payloads: k evenly
    spaced byte offsets per payload (off_i = i·L // k), emitting
    (media_id, frame_idx, byte_offset, byte_val) — the 1→k flat-map shape a
    real frame sampler has, with the payload never riding past the stage."""

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        o_id, o_fi, o_off, o_val = [], [], [], []
        for mid, p in zip(ids, payloads):
            p = p or b""
            n = len(p)
            if n == 0:
                continue
            for i in range(k):
                off = i * n // k
                o_id.append(mid)
                o_fi.append(i)
                o_off.append(off)
                o_val.append(p[off])
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame_idx": pa.array(o_fi, pa.int64()),
                "byte_offset": pa.array(o_off, pa.int64()),
                "byte_val": pa.array(o_val, pa.int64()),
            }
        )

    return media.map_batches(sample, batch_format="pyarrow", batch_size=256)
