"""Multimodal column handling: image / audio / video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED — this container ships no image/
audio libraries — but the Ray-side plumbing is real and tested: schema
(binary payload + struct metadata), actor-pool stage shape, small
batch sizes for wide binary rows, deterministic fake feature extraction so
pipelines and tests can run end-to-end. Swap ``_decode_*`` for PIL/ffmpeg
in a real deployment; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),          # image | audio | video
        pa.field("payload", pa.binary()),        # opaque encoded bytes
        pa.field("mime", pa.string()),
        pa.field("n_bytes", pa.int64()),
    ]
)


def synthesize_media(n: int, *, kind: str = "image", seed: int = 5,
                     payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (payloads are seeded noise bytes) —
    stands in for read_binary_files(...) output at test scale."""
    ids = np.arange(n, dtype=np.int64)
    h = stable_hash64(pa.array(ids + seed * 1_000_003))
    payloads = [
        (np.frombuffer(np.uint64(x).tobytes(), np.uint8)
         .repeat(payload_bytes // 8).tobytes())
        for x in h
    ]
    mime = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mime] * n, pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class MediaFeatureStage:
    """Actor-pool stage: decode + feature-extract media payloads.

    Real deployments load the decoder model ONCE here in ``__init__`` (the
    actor-pool pattern); ``__call__`` decodes per batch. In this sandbox the
    decode is a deterministic fake (STUB): features are derived from a
    stable hash of the payload, shaped like a real embedding, so downstream
    stages (ANN, dedup) are exercised for real.

    Recommended wiring for wide binary rows::

        ds.map_batches(MediaFeatureStage, concurrency=8, batch_size=32,
                       num_cpus=1, batch_format="pyarrow")
    """

    def __init__(self, *, feature_dim: int = 16, real_decoder: bool = False):
        self.dim = feature_dim
        if real_decoder:
            raise NotImplementedError(
                "no image/audio codecs in this container; plug PIL/ffmpeg here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        base = stable_hash64(payload)
        # deterministic fake "embedding": dim per-row hashes mapped to [-1, 1]
        steps = (np.arange(self.dim, dtype=np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))
        grid = (base[:, None] + steps[None, :]) & np.uint64(0xFFFFFFFFFFFFFFFF)
        feats = (grid.astype(np.float64) / 2.0**64) * 2.0 - 1.0
        width = (base % np.uint64(1920)).astype(np.int64) + 64
        height = (base % np.uint64(1080)).astype(np.int64) + 64
        out = batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64()))
        )
        out = out.append_column("decoded_width", pa.array(width))
        out = out.append_column("decoded_height", pa.array(height))
        return out


class FrameSampleStage:
    """Video frame sampling plumbing (STUB decode): explodes each video row
    into ``frames_per_video`` frame rows (media_id, frame_idx, frame_payload)
    — the flat-map shape a real ffmpeg-based sampler would produce."""

    def __init__(self, frames_per_video: int = 4):
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.asarray(batch["media_id"])
        payloads = batch["payload"].to_pylist()
        out_ids = np.repeat(ids, self.k)
        out_idx = np.tile(np.arange(self.k, dtype=np.int64), n)
        # fake frame = a deterministic slice of the payload
        frames = [
            p[(i * 16) % max(1, len(p) - 16) : (i * 16) % max(1, len(p) - 16) + 16]
            for p in payloads
            for i in range(self.k)
        ]
        return pa.table(
            {
                "media_id": pa.array(out_ids),
                "frame_idx": pa.array(out_idx),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )
