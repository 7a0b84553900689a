from .split_fields import split_fields, SplitFieldsStage

__all__ = ["split_fields", "SplitFieldsStage"]
