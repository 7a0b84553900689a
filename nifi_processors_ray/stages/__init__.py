from .split_fields import SplitFieldsStage, split_fields
from .provenance import Provenance
from .quantiles import grouped_quantiles, grouped_quantiles_sketch
from .windows import asof_join, session_stats, sessionize, topk_per_group

__all__ = [
    "split_fields",
    "SplitFieldsStage",
    "Provenance",
    "grouped_quantiles",
    "grouped_quantiles_sketch",
    "sessionize",
    "session_stats",
    "asof_join",
    "topk_per_group",
]
