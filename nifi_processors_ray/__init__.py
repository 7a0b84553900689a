"""nifi_processors_ray — a Ray-Data-native data-processing / CDC-ingest engine.

A from-scratch re-expression of the capabilities of the reference NiFi
processor set (GilbertoBotaro/nifi_processors: SplitToAttribute,
MergeTemplate, ExecuteRuleEngine, GenerateData) as idiomatic Ray Data
pipelines: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages, and an LSM-style exactly-once
Parquet lake sink for the CDC/incremental-ingest north star.

Layout:
  stages/     per-batch transforms (split, render, rules, text stats, dedup, ANN)
  sources/    deterministic generators + readers
  functions/  vectorized helpers (hashing, text kernels)
  pipelines/  end-to-end compositions (CDC apply, relational pipelines)
  state/      the lake table: delta files, epoch manifests, compaction, resume
"""

__version__ = "0.1.0"
