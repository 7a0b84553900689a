from .cdc import ingest_stream, replay_verify, snapshot_hashes

__all__ = ["ingest_stream", "replay_verify", "snapshot_hashes"]
