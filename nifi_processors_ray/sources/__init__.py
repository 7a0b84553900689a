from .changestream import change_stream, change_stream_batch, expected_snapshot

__all__ = ["change_stream", "change_stream_batch", "expected_snapshot"]
