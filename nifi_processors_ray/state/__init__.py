from .lake import LakeTable, latest_by_key
from .matview import IncrementalAggView

__all__ = ["LakeTable", "latest_by_key", "IncrementalAggView"]
