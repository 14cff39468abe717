"""Multimodal column plumbing — opaque ``binary`` payload columns with typed
metadata, decoded / feature-extracted by actor-pool stages.

Two decode tiers:

- ``MediaDecoder`` — HONEST decode for the codecs expressible with the
  stdlib: PNG (signature + IHDR chunk parse, CRC-verified) and WAV (RIFF
  container via ``wave``), extracting true width/height/bit-depth and
  channels/sample-rate/frame-count/duration from real bytes. The matching
  encoders (``png_bytes`` / ``wav_bytes``) are also real, so tests and the
  DuckDB oracle exercise a genuine encode → decode round trip.
- ``DecodeStub`` — the remaining codecs (JPEG/MP3/video) are NOT in this
  environment; the stub raises ``NotImplementedError`` unless ``fake=True``
  (deterministic md5-derived feature vector), with the Ray-side plumbing
  (schema, small batches for fat rows, actor signature, output layout)
  real and tested.

Scale notes: binary payloads make rows fat — callers should use small
``batch_size`` (64-512) and let ``target_max_block_size`` keep blocks sane;
the payload column is dropped immediately after feature extraction so it
never rides through a shuffle.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


# ---------------------------------------------------- honest PNG/WAV codecs

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_bytes(width: int, height: int, fill: int = 0) -> bytes:
    """A real, minimal 8-bit grayscale PNG: IHDR + one zlib IDAT of
    filter-0 scanlines + IEND, with correct chunk CRCs."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([fill & 0xFF]) * width) * height
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 1))
        + chunk(b"IEND", b"")
    )


def parse_png_header(payload: bytes) -> dict:
    """Signature + IHDR parse with CRC verification — true width/height/
    bit-depth/color-type from real bytes (no image library needed for the
    metadata a pipeline partitions and filters on)."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    (length,) = struct.unpack(">I", payload[8:12])
    tag = payload[12:16]
    if tag != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not IHDR")
    data = payload[16:29]
    (crc,) = struct.unpack(">I", payload[29:33])
    if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    w, h, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
    return {"width": w, "height": h, "bit_depth": bit_depth, "color_type": color_type}


def wav_bytes(n_frames: int, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """A real PCM WAV (RIFF/WAVE container via the stdlib encoder)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(b"\x00\x00" * (n_frames * n_channels))
    return buf.getvalue()


def parse_wav_header(payload: bytes) -> dict:
    """RIFF/WAVE parse via the stdlib reader — true channels/sample-rate/
    frame-count, plus integer-exact duration_ms."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n_channels = f.getnchannels()
        rate = f.getframerate()
        n_frames = f.getnframes()
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate,
    }


class MediaDecoder:
    """Actor-pool honest-decode stage: sniffs each payload's magic bytes and
    parses real PNG / WAV metadata. Unknown codecs raise (strict, default)
    or emit a ``kind='unknown'`` all-null row (``strict=False``) — never a
    silently fabricated value. Per-row parse is inherent to binary codecs;
    the stage runs as an actor pool over small batches, and the payload
    column is dropped at the stage boundary."""

    OUT_SCHEMA = pa.schema(
        [
            ("media_id", pa.int64()),
            ("kind", pa.string()),
            ("width", pa.int64()),
            ("height", pa.int64()),
            ("n_channels", pa.int64()),
            ("sample_rate", pa.int64()),
            ("n_frames", pa.int64()),
            ("duration_ms", pa.int64()),
        ]
    )

    def __init__(self, strict: bool = True) -> None:
        self.strict = strict

    def _decode(self, payload: bytes) -> dict:
        if payload[:8] == _PNG_SIG:
            h = parse_png_header(payload)
            return {"kind": "png", "width": h["width"], "height": h["height"]}
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            h = parse_wav_header(payload)
            return {"kind": "wav", **h}
        if self.strict:
            raise NotImplementedError(
                "unknown media codec (only PNG and WAV decode in this "
                "environment); construct MediaDecoder(strict=False) to route "
                "unknown payloads to kind='unknown' rows"
            )
        return {"kind": "unknown"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self._decode(p or b"") for p in batch.column("payload").to_pylist()]
        cols: dict = {"media_id": pc.cast(batch.column("media_id"), pa.int64())}
        cols["kind"] = pa.array([m["kind"] for m in metas], pa.string())
        for f in ("width", "height", "n_channels", "sample_rate", "n_frames", "duration_ms"):
            cols[f] = pa.array([m.get(f) for m in metas], pa.int64())
        return pa.table(cols).cast(self.OUT_SCHEMA)


def decode_media(
    media: "ray.data.Dataset", *, batch_size: int = 256, strict: bool = True
) -> "ray.data.Dataset":
    """Honest PNG/WAV metadata decode over binary payloads (S6/ST5 made
    real): actor pool, small batches for fat rows, payload dropped at the
    stage boundary."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
        num_cpus=1,
        max_restarts=0,
    )


def synth_real_media(batch: pa.Table) -> pa.Table:
    """Deterministic REAL payloads from documents: even doc_id → a genuine
    PNG whose dimensions derive from the id, odd doc_id → a genuine WAV
    whose frame count derives from the id. The arithmetic is mirrored in the
    DuckDB oracle, so the engine must round-trip real bytes (encode, then
    header-parse back) to match."""
    ids = batch.column("doc_id").to_pylist()
    payloads = []
    for i in ids:
        if i % 2 == 0:
            payloads.append(png_bytes((i % 64) + 1, ((i * 7) % 64) + 1, fill=i % 251))
        else:
            payloads.append(wav_bytes((i % 997) + 1, sample_rate=8000))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(
                ["image" if i % 2 == 0 else "audio" for i in ids], pa.string()
            ),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
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
