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
        k = self.k
        ids = np.asarray(batch["media_id"])
        pay = batch["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        # fake frame = a deterministic 16-byte slice of the payload —
        # computed with ONE numpy gather over the flat value buffer (no
        # Python loop over rows/payload bytes)
        off = np.frombuffer(pay.buffers()[1], dtype=np.int32)[
            pay.offset : pay.offset + n + 1].astype(np.int64)
        data = np.frombuffer(pay.buffers()[2], dtype=np.uint8)
        lens = off[1:] - off[:-1]
        row = np.repeat(np.arange(n, dtype=np.int64), k)
        i_idx = np.tile(np.arange(k, dtype=np.int64), n)
        base = np.maximum(1, lens - 16)
        s = (i_idx * 16) % base[row]
        frame_len = np.minimum(16, lens[row] - s)
        abs_start = off[:-1][row] + s
        total = int(frame_len.sum())
        out_off = np.zeros(n * k + 1, dtype=np.int32)
        np.cumsum(frame_len, out=out_off[1:])
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(out_off[:-1].astype(np.int64), frame_len)
               + np.repeat(abs_start, frame_len))
        frames = pa.Array.from_buffers(
            pa.binary(), n * k,
            [None, pa.py_buffer(out_off.tobytes()),
             pa.py_buffer(data[pos].tobytes())],
        )
        return pa.table(
            {
                "media_id": pa.array(np.repeat(ids, k)),
                "frame_idx": pa.array(i_idx),
                "frame_payload": frames,
            }
        )
