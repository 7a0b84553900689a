from .changestream import change_stream, change_stream_batch, expected_snapshot
from .text import read_delimited_text

__all__ = ["change_stream", "change_stream_batch", "expected_snapshot",
           "read_delimited_text"]
