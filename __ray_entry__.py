"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the library ever calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents framed as the
    input_hint repo-change table, applied exactly-once into the CDC lake,
    final state returned with per-row content sha256 (north-rule check)."""
    from nifi_processors_ray.pipelines.registry import q_cdc_documents_snapshot

    return q_cdc_documents_snapshot("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data operator suite (dedup / text stats / ANN / CDC)."""
    from nifi_processors_ray.pipelines.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names as the Ray results). Non-SQL-expressible ops (generators, LSH
    near-dup, heuristics, media stubs) are intentionally absent -> the
    driver records the weaker rows-only check for those."""
    from nifi_processors_ray.pipelines.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
