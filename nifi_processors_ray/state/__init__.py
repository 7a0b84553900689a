from .lake import LakeTable, latest_by_key

__all__ = ["LakeTable", "latest_by_key"]
